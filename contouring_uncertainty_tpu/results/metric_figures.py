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
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional

import numpy as np


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


def _draw_sample_contours(ax, res, inst: int, use_contour: bool,
                          max_te: int = 2, max_ta: int = 5):
    """A few MC contour samples on the image panel: splined landmark samples
    (use_contour=True) or iso-contours of the sampled masks (the reference's
    metric_figures2 variant draws mask-walked boundaries)."""
    if use_contour and res.contour_samples is not None:
        import jax.numpy as jnp

        from contouring_uncertainty_tpu.ops.spline import contour_spline

        cs = np.asarray(res.contour_samples)
        for j in range(min(max_te, cs.shape[1])):
            for k in range(min(max_ta, cs.shape[2])):
                dense = np.asarray(contour_spline(jnp.asarray(cs[inst, j, k]),
                                                  n=256))
                ax.plot(dense[:, 0], dense[:, 1], linewidth=1.2, alpha=0.85)
    elif res.pred_samples is not None:
        ps = np.asarray(res.pred_samples)
        for j in range(min(max_te, ps.shape[1])):
            for k in range(min(max_ta, ps.shape[2])):
                ax.contour(ps[inst, j, k] > 0.5, levels=[0.5], linewidths=1.2)


def metric_plot(res, instant_rows: Dict[str, Dict], view_rows: Dict[str, Dict],
                mc: Dict[str, np.ndarray], out_dir: Path,
                use_contour: bool = True, dpi: int = 100) -> Path:
    """Render one view's dashboard; returns the written path.

    `instant_rows`/`view_rows` are the clinical processor's row dicts (keys
    'Area_mean', 'FAC_reject', ... — results/clinical.py _metric_row);
    `mc` maps 'Area_ED'/'Area_ES'/'FAC'/'GLS' to their raw MC populations.
    """
    import matplotlib

    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    from contouring_uncertainty_tpu.utils.plotting import confidence_ellipse

    inst = res.instants or {"ED": 0, "ES": min(1, res.img.shape[0] - 1)}
    ed, es = inst.get("ED", 0), inst.get("ES", min(1, res.img.shape[0] - 1))

    fig = plt.figure(constrained_layout=True, figsize=(14, 9))
    spec = fig.add_gridspec(ncols=2, nrows=4, height_ratios=[1, 0.12, 0.12, 0.12])
    ax_img = {"ED": fig.add_subplot(spec[0, 0]),
              "ES": fig.add_subplot(spec[0, 1])}
    ax_area = {"ED": fig.add_subplot(spec[1, 0]),
               "ES": fig.add_subplot(spec[1, 1])}
    ax_fac = fig.add_subplot(spec[2, :])
    ax_gls = fig.add_subplot(spec[3, :])

    for name, i in (("ED", ed), ("ES", es)):
        ax = ax_img[name]
        ax.set_axis_off()
        ax.set_title(name)
        ax.imshow(np.asarray(res.img[i]).squeeze(), cmap="gray")
        if res.entropy_map is not None:
            ins = ax.inset_axes([0.7, 0.7, 0.3, 0.3])
            ins.set_axis_off()
            ent = np.asarray(res.entropy_map[i])
            r0, r1, c0, c1 = _bbox(ent)
            ins.imshow(ent[r0:r1, c0:c1])
        if use_contour and res.mu is not None:
            mu = np.asarray(res.mu[i])
            ax.scatter(mu[:, 0], mu[:, 1], c="r", s=6)
            if res.contour is not None:
                gt_c = np.asarray(res.contour[i])
                ax.scatter(gt_c[:, 0], gt_c[:, 1], c="b", s=6)
            if res.cov is not None:
                cov = np.asarray(res.cov[i])
                for k in range(mu.shape[0]):
                    confidence_ellipse(mu[k, 0], mu[k, 1], cov[k], ax, n_std=2)
        _draw_sample_contours(ax, res, i, use_contour)

    def row_info(rows, key, metric):
        row = rows.get(key)
        if row is None:
            return None
        info = {k[len(metric) + 1:]: v for k, v in row.items()
                if k.startswith(f"{metric}_")}
        return info or None

    reject = False
    for name in ("ED", "ES"):
        info = row_info(instant_rows, f"{res.id}/{name}", "Area")
        if info is not None:
            info["mc"] = mc.get(f"Area_{name}")
        reject |= _metric_axis(ax_area[name], info, "Area")
    for metric, ax in (("FAC", ax_fac), ("GLS", ax_gls)):
        info = row_info(view_rows, res.id, metric)
        if info is not None:
            info["mc"] = mc.get(metric)
        reject |= _metric_axis(ax, info, metric)

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    stem = res.id.replace("/", "-")
    path = out_dir / (f"{stem}_reject.png" if reject else f"{stem}.png")
    fig.savefig(path, dpi=dpi)
    plt.close(fig)
    return path
