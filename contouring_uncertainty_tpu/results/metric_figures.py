"""Per-view clinical metric dashboards — the TMI paper's qualitative
deliverable: for EVERY view, one composite figure combining the ED/ES images
(contour samples, per-point confidence ellipses, entropy-map inset) with the
Monte-Carlo distribution of each clinical metric (Area at ED/ES, FAC, GLS)
against its ground-truth and predicted markers.

Capability parity with the reference's `metric_plot`
(contour_uncertainty/results/clinical/clinical_metrics.py:269-508, invoked
per view at :140-143 into `metric_figures/` with spline contours and
`metric_figures2/` with mask-derived contours). The figure composition is our
own; the content contract matches: MC histogram per metric, blue
aleatoric+epistemic and red aleatoric error bars around the MC mean, black
GT marker, reject flag in the filename (`{id}_reject.png`).

Structure: `prepare_view_payload` (parent process: one batched jax spline
eval per view, everything reduced to small numpy arrays) feeds
`render_view_payload` (pure numpy + matplotlib, picklable input), so
`render_dashboards` can fan the rendering out over a FORK process pool —
figure rendering dominates the evaluation epilogue (~1.6 s/figure serial;
the reference parallelized its clinical epilogue with an mp.Pool(8) too,
reference patient.py:33-46). Fork, not spawn, deliberately: spawn
re-executes the parent's __main__ module in every worker, which re-runs any
unguarded user script (measured round 4: a guard-less benchmark script
recursively re-ran its whole pipeline per worker); fork re-imports nothing,
and the workers are jax-free by construction (pure numpy + matplotlib on
pre-extracted payloads), so no XLA/PJRT thread state is ever exercised in
the children. A bounded `get(timeout=...)` + pool terminate + serial
re-render guards the residual fork-a-threaded-process risk.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

# Samples drawn on the image panels (reference metric_plot loops
# range(min(2, Te)) x range(min(5, Ta))).
_MAX_TE, _MAX_TA = 2, 5

_DENSE_JIT = None  # lazy module-level jit: one trace per (S, K) shape, not per view


def _dense_splines(flat: np.ndarray) -> np.ndarray:
    """(S, K, 2) landmark samples -> (S, 256, 2) dense spline polylines."""
    global _DENSE_JIT
    if _DENSE_JIT is None:
        import jax

        from contouring_uncertainty_tpu.ops.spline import contour_spline

        _DENSE_JIT = jax.jit(jax.vmap(lambda p: contour_spline(p, n=256)))
    return np.asarray(_DENSE_JIT(flat))


def _bbox(map2d: np.ndarray, pad: int = 20):
    """Square crop window around the nonzero support of a 2-D map."""
    nz = map2d > 0
    if not nz.any():
        return 0, map2d.shape[0], 0, map2d.shape[1]
    rows = np.flatnonzero(nz.any(axis=1))
    cols = np.flatnonzero(nz.any(axis=0))
    cy = (rows[0] + rows[-1]) // 2
    cx = (cols[0] + cols[-1]) // 2
    s = max(rows[-1] - rows[0], cols[-1] - cols[0]) // 2 + pad
    h, w = map2d.shape
    return (max(cy - s, 0), min(cy + s + 1, h),
            max(cx - s, 0), min(cx + s + 1, w))


def _metric_axis(ax, info: Optional[Dict], label: str) -> bool:
    """One metric row: MC histogram + mean with aleatoric(+epistemic) error
    bars + GT marker (reference plot_metric_axis, clinical_metrics.py:289-325).
    Returns the reject flag so the caller can tag the filename."""
    ax.set_ylabel(label, fontsize=12)
    ax.set_yticks([])
    if info is None:
        ax.set_axis_off()
        return False
    mc = np.asarray(info.get("mc", ()), float).ravel()
    mc = mc[np.isfinite(mc)]
    if mc.size:
        ax.hist(mc, bins=20, alpha=0.5, color="tab:gray")
    reject = bool(info.get("reject", False))
    mean, gt = info.get("mean"), info.get("gt")
    al = info.get("aleatoric_std", 0.0) or 0.0
    ep = info.get("epistemic_std", 0.0) or 0.0
    lo, hi = ax.get_ylim()
    y = lo + 0.75 * (hi - lo)
    fmt = "x" if reject else "o"
    if mean is not None and np.isfinite(mean):
        ax.errorbar([mean], [y], xerr=[al + ep], fmt=fmt, capsize=3, c="b",
                    elinewidth=2)
        ax.errorbar([mean], [y], xerr=[al], fmt=fmt, capsize=3, c="r",
                    elinewidth=2, markersize=9)
    if gt is not None and np.isfinite(gt):
        ax.scatter([gt], [y], c="k", s=80, zorder=3)
    return reject


def prepare_view_payload(res, instant_rows: Dict[str, Dict],
                         view_rows: Dict[str, Dict],
                         mc: Dict[str, np.ndarray]) -> Dict:
    """Reduce one view to a small, jax-free, picklable payload.

    The dense sample splines (one BATCHED jax call per instant instead of
    Te x Ta host dispatches) and the small mask subsets for the
    mask-contour variant are extracted here so rendering never touches jax
    or the full (N, Te, Ta, H, W) population.
    """
    inst = res.instants or {"ED": 0, "ES": min(1, res.img.shape[0] - 1)}
    instants = {"ED": inst.get("ED", 0),
                "ES": inst.get("ES", min(1, res.img.shape[0] - 1))}

    panels = {}
    for name, i in instants.items():
        panel = {
            "img": np.asarray(res.img[i]).squeeze(),
            "entropy": (np.asarray(res.entropy_map[i])
                        if res.entropy_map is not None else None),
            "mu": np.asarray(res.mu[i]) if res.mu is not None else None,
            "cov": np.asarray(res.cov[i]) if res.cov is not None else None,
            "gt_contour": (np.asarray(res.contour[i])
                           if res.contour is not None else None),
            "dense_samples": None,
            "sample_masks": None,
        }
        if res.contour_samples is not None:
            cs = np.asarray(res.contour_samples[i])
            flat = cs[:_MAX_TE, :_MAX_TA].reshape(-1, *cs.shape[-2:])
            panel["dense_samples"] = _dense_splines(flat)
        if res.pred_samples is not None:
            ps = np.asarray(res.pred_samples[i])
            panel["sample_masks"] = (
                ps[:_MAX_TE, :_MAX_TA].reshape(-1, *ps.shape[-2:]) > 0.5
            ).astype(np.uint8)
        panels[name] = panel

    def row_info(rows, key, metric):
        row = rows.get(key)
        if row is None:
            return None
        info = {k[len(metric) + 1:]: v for k, v in row.items()
                if k.startswith(f"{metric}_")}
        return info or None

    metric_infos = {}
    for name in ("ED", "ES"):
        info = row_info(instant_rows, f"{res.id}/{name}", "Area")
        if info is not None:
            info["mc"] = np.asarray(mc.get(f"Area_{name}", ()), float)
        metric_infos[f"Area_{name}"] = info
    for metric in ("FAC", "GLS"):
        info = row_info(view_rows, res.id, metric)
        if info is not None:
            info["mc"] = np.asarray(mc.get(metric, ()), float)
        metric_infos[metric] = info

    return {"id": res.id, "panels": panels, "metric_infos": metric_infos}


def render_view_payload(payload: Dict, out_dir: Path, use_contour: bool = True,
                        dpi: int = 100) -> Path:
    """Render one prepared payload; returns the written path. numpy +
    matplotlib only — safe inside spawn pool workers."""
    import matplotlib

    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    from contouring_uncertainty_tpu.utils.plotting import confidence_ellipse

    fig = plt.figure(figsize=(14, 9))
    spec = fig.add_gridspec(ncols=2, nrows=4, height_ratios=[1, 0.12, 0.12, 0.12])
    ax_img = {"ED": fig.add_subplot(spec[0, 0]),
              "ES": fig.add_subplot(spec[0, 1])}
    ax_area = {"ED": fig.add_subplot(spec[1, 0]),
               "ES": fig.add_subplot(spec[1, 1])}
    ax_fac = fig.add_subplot(spec[2, :])
    ax_gls = fig.add_subplot(spec[3, :])
    # Manual spacing instead of constrained_layout: same framing at ~75% of
    # the layout-solver render cost (measured round 4).
    fig.subplots_adjust(left=0.05, right=0.99, top=0.96, bottom=0.04,
                        hspace=0.3, wspace=0.08)

    for name, panel in payload["panels"].items():
        ax = ax_img[name]
        ax.set_axis_off()
        ax.set_title(name)
        ax.imshow(panel["img"], cmap="gray")
        if panel["entropy"] is not None:
            ins = ax.inset_axes([0.7, 0.7, 0.3, 0.3])
            ins.set_axis_off()
            ent = panel["entropy"]
            r0, r1, c0, c1 = _bbox(ent)
            ins.imshow(ent[r0:r1, c0:c1])
        if use_contour and panel["mu"] is not None:
            mu = panel["mu"]
            ax.scatter(mu[:, 0], mu[:, 1], c="r", s=6)
            if panel["gt_contour"] is not None:
                gt_c = panel["gt_contour"]
                ax.scatter(gt_c[:, 0], gt_c[:, 1], c="b", s=6)
            if panel["cov"] is not None:
                for k in range(mu.shape[0]):
                    confidence_ellipse(mu[k, 0], mu[k, 1], panel["cov"][k],
                                       ax, n_std=2)
        if use_contour and panel["dense_samples"] is not None:
            for dense in panel["dense_samples"]:
                ax.plot(dense[:, 0], dense[:, 1], linewidth=1.2, alpha=0.85)
        elif not use_contour and panel["sample_masks"] is not None:
            # Mask-contour variant (the reference's metric_figures2 walks
            # the sampled masks' boundaries instead of splining landmarks).
            for m in panel["sample_masks"]:
                ax.contour(m, levels=[0.5], linewidths=1.2)

    infos = payload["metric_infos"]
    reject = False
    for name in ("ED", "ES"):
        reject |= _metric_axis(ax_area[name], infos.get(f"Area_{name}"), "Area")
    reject |= _metric_axis(ax_fac, infos.get("FAC"), "FAC")
    reject |= _metric_axis(ax_gls, infos.get("GLS"), "GLS")

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    stem = payload["id"].replace("/", "-")
    path = out_dir / (f"{stem}_reject.png" if reject else f"{stem}.png")
    fig.savefig(path, dpi=dpi)
    plt.close(fig)
    return path


def metric_plot(res, instant_rows: Dict[str, Dict], view_rows: Dict[str, Dict],
                mc: Dict[str, np.ndarray], out_dir: Path,
                use_contour: bool = True, dpi: int = 100) -> Path:
    """Serial prepare+render for one view (kept as the simple entry point;
    `instant_rows`/`view_rows` are the clinical processor's row dicts —
    results/clinical.py _metric_row; `mc` maps 'Area_ED'/'Area_ES'/'FAC'/
    'GLS' to their raw MC populations)."""
    payload = prepare_view_payload(res, instant_rows, view_rows, mc)
    return render_view_payload(payload, out_dir, use_contour, dpi)


def _render_both(args) -> List[str]:
    """Pool task: render a payload's spline- and mask-contour dashboards."""
    payload, out_root = args
    out_root = Path(out_root)
    return [
        str(render_view_payload(payload, out_root / "metric_figures",
                                use_contour=True)),
        str(render_view_payload(payload, out_root / "metric_figures2",
                                use_contour=False)),
    ]


def _pool_init():
    # Defensive: keep workers from booting a TPU backend if a transitive
    # import pulls in jax. NOTE (ADVICE r4): under fork the parent's already
    # -initialized jax state is inherited, so this env var only protects
    # fresh imports — the per-result timeout in render_dashboards is the
    # real defense against a wedged child.
    import os

    os.environ["JAX_PLATFORMS"] = "cpu"


def render_dashboards(payloads: List[Dict], out_root: Path,
                      parallel_threshold: int = 16,
                      max_workers: int = 8) -> None:
    """Render every view's two dashboards, fanning out over a fork process
    pool for large folds (rendering is ~1.6 s/figure serial and dominates
    the evaluation epilogue past ~15 views; see the module docstring for
    why fork over spawn). Small runs render serially: pool startup would
    dominate. Any pool failure — including the bounded timeout against a
    wedged forked child — falls back to serial re-rendering (same
    filenames, idempotent)."""
    import os

    tasks = [(p, str(out_root)) for p in payloads]
    if len(payloads) >= parallel_threshold:
        import multiprocessing as mp

        try:
            ctx = mp.get_context("fork")  # raises on non-POSIX -> serial
            with ctx.Pool(min(max_workers, os.cpu_count() or 1),
                          initializer=_pool_init) as pool:
                # Per-result timeout (ADVICE r4): a wedged forked child must
                # surface within ~2 min, not after a fold-sized 60+30*n cap
                # (~50 min at 100 views). imap_unordered yields as results
                # land; next() raising TimeoutError means no result arrived
                # for 120 s — every healthy figure renders in ~2 s.
                it = pool.imap_unordered(_render_both, tasks, chunksize=2)
                for _ in range(len(tasks)):
                    it.next(timeout=120)
            return
        except Exception:
            pass  # fall through to serial rendering
    for task in tasks:
        _render_both(task)
