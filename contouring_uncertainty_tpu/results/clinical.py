"""Clinical metric propagation: LV area, FAC, GLS, Simpson EDV/ESV/EF over the
Monte-Carlo sample population, with the aleatoric/epistemic split and
physiological rejection.

Capability parity with contour_uncertainty/results/clinical/
(clinical_metrics.py:30-531, instant.py AreaError, view.py FAC/GLS,
patient.py Volume, utils.py aleatoric_epistemic_uncertainty). The reference
ran Te x Ta Python loops per metric in an 8-process pool; here each view's
whole sample population is reduced on device in one call (areas, perimeters,
disk volumes are batched jitted functions) and only the pandas assembly stays
on host.
"""

from __future__ import annotations

from collections import defaultdict
from functools import partial
from pathlib import Path
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from contouring_uncertainty_tpu.data.config import Label
from contouring_uncertainty_tpu.results import register
from contouring_uncertainty_tpu.results.utils import (
    _pearson,
    compute_adaptive_calibration,
    compute_calibration,
)
from contouring_uncertainty_tpu.utils import clinical as C


def aleatoric_epistemic_uncertainty(metric_mc: np.ndarray):
    """(Te, Ta) MC metric values -> (mean, aleatoric std, epistemic std, total)
    (reference clinical/utils.py:3-18)."""
    means = np.nanmean(metric_mc, axis=-1)
    stds = np.nanstd(metric_mc, axis=-1)
    mean = float(np.nanmean(means))
    epistemic = float(np.nanstd(means))
    aleatoric = float(np.nanmean(stds))
    return mean, aleatoric, epistemic, epistemic + aleatoric


def _metric_row(pred, gt, mc, min_value, max_value):
    mc = np.asarray(mc, float)
    sample_reject = (mc < min_value) | (mc > max_value)
    mc = np.where(sample_reject, np.nan, mc)
    mean, al, ep, tot = aleatoric_epistemic_uncertainty(mc)
    reject = not (min_value < pred <= max_value)
    if sample_reject.mean() > 0.5:
        reject = True
    return {
        "pred": float(pred),
        "gt": float(gt) if gt is not None else np.nan,
        "error": float(abs(mean - gt)) if gt is not None else np.nan,
        "std": tot,
        "mean": mean,
        "aleatoric_std": al,
        "epistemic_std": ep,
        "reject": bool(reject),
        "sample_reject_frac": float(sample_reject.mean()),
    }


def merge_volume_df(patient_df: pd.DataFrame) -> pd.DataFrame:
    """Fold the patient EDV/ESV columns into per-instant 'Volume' rows
    ('{patient}/ED' and '{patient}/ES') — the reference's fourth clinical
    dataframe (clinical_metrics.py:146-155 merge_volume_df)."""
    esv = patient_df.filter(regex="^ESV_").copy()
    esv.index = [f"{p}/ES" for p in esv.index]
    esv.columns = [c.replace("ESV_", "Volume_") for c in esv.columns]
    edv = patient_df.filter(regex="^EDV_").copy()
    edv.index = [f"{p}/ED" for p in edv.index]
    edv.columns = [c.replace("EDV_", "Volume_") for c in edv.columns]
    return pd.concat([esv, edv])


def plot_metric_calibration(df: pd.DataFrame, metric: str, out_dir: Path,
                            summary: Dict) -> None:
    """MC-distribution calibration of one clinical metric: uniform + adaptive
    UCE curves with bin-occupancy bars, '{metric}_calibration.png', and
    '{metric}_uce'/'{metric}_a-uce' summary keys (reference
    clinical_metrics.py:209-257 plot_calibration). Rejected rows are filtered
    out of the curves like the reference (:222-225)."""
    std_col, err_col = f"{metric}_std", f"{metric}_error"
    if std_col not in df.columns or err_col not in df.columns:
        return
    std = df[std_col].astype(float).to_numpy()
    err = df[err_col].astype(float).to_numpy()
    ok = np.isfinite(std) & np.isfinite(err)
    std, err = std[ok], err[ok]
    if len(std) < 2:
        return
    filters = None
    if f"{metric}_reject" in df.columns:
        filters = ~df[f"{metric}_reject"].astype(bool).to_numpy()[ok]
        if filters.sum() < 2:
            filters = None
    uce, conf, acc, sizes = compute_calibration(err, std, filters=filters)
    a_uce, a_conf, a_acc, _ = compute_adaptive_calibration(err, std, filters=filters)
    summary[f"{metric}_uce"] = uce
    summary[f"{metric}_a-uce"] = a_uce

    import matplotlib

    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    f, (ax1, ax2) = plt.subplots(1, 2, figsize=(10, 5))
    ax1.plot(conf, acc, marker="o")
    ax2.plot(a_conf, a_acc, marker="o")
    ax12 = ax1.twinx()
    width = np.min(np.diff(conf)) / 2 if len(conf) > 1 else None
    ax12.bar(conf, sizes, alpha=0.7, **({"width": width} if width else {}))
    for ax, u, title in ((ax1, uce, "UCE"), (ax2, a_uce, "A-UCE")):
        ax.plot(ax.get_xlim(), ax.get_xlim(), "--", c="k")
        ax.set_title(f"{title}={u:.3f}")
        ax.set_ylabel(f"{metric} error")
        ax.set_xlabel(f"$\\sigma_{{{metric}}}$")
    plt.tight_layout()
    plt.savefig(out_dir / f"{metric}_calibration.png", dpi=80)
    plt.close(f)


def plot_metric_correlation(df: pd.DataFrame, metric: str, out_dir: Path,
                            x: str = "gt", y: str = "pred",
                            color: Optional[str] = "std") -> None:
    """Scatter dashboard of one clinical metric (reference
    clinical_metrics.py:157-198 plot_correlation): y-vs-x with the identity
    line and Pearson r, optionally colored by the MC std."""
    x_col, y_col = f"{metric}_{x}", f"{metric}_{y}"
    if x_col not in df.columns or y_col not in df.columns:
        return
    xs = df[x_col].astype(float).to_numpy()
    ys = df[y_col].astype(float).to_numpy()
    ok = np.isfinite(xs) & np.isfinite(ys)
    if ok.sum() < 2:
        return
    xs, ys = xs[ok], ys[ok]
    cs = None
    if color is not None and f"{metric}_{color}" in df.columns:
        cs = df[f"{metric}_{color}"].astype(float).to_numpy()[ok]

    import matplotlib

    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    f, ax = plt.subplots(figsize=(5, 5))
    sc = ax.scatter(xs, ys, c=cs, cmap="viridis" if cs is not None else None)
    lo, hi = min(xs.min(), ys.min()), max(xs.max(), ys.max())
    ax.plot([lo, hi], [lo, hi], "--", c="k")
    ax.set_xlabel(f"{metric} {x}")
    ax.set_ylabel(f"{metric} {y}")
    ax.set_title(f"r={_pearson(xs, ys):.3f}")
    if cs is not None:
        f.colorbar(sc, label=f"{metric} std")
    plt.tight_layout()
    plt.savefig(out_dir / f"{metric}_correlation_{y}_{x}.png", dpi=80)
    plt.close(f)


_area_batch = jax.jit(lambda masks: C.lv_area(masks))
_perimeter_batch = jax.jit(
    lambda contours: jax.vmap(C.contour_perimeter)(contours.reshape(-1, *contours.shape[-2:]))
)


@partial(jax.jit, static_argnames=("use_myo",))
def _gls_len_batch(segs, use_myo: bool):
    """(..., H, W) label maps -> longitudinal endocardial lengths (...)."""
    flat = segs.reshape(-1, *segs.shape[-2:])
    lens = jax.vmap(
        lambda s: C.mask_longitudinal_length(s, use_myo=use_myo)
    )(flat)
    return lens.reshape(segs.shape[:-2])


def _ed_es(res):
    inst = res.instants or {"ED": 0, "ES": min(1, res.img.shape[0] - 1)}
    return inst["ED"], inst["ES"]


@register("clinical_metrics")
def clinical_metrics(results: List, out_dir: Path) -> dict:
    out_dir = Path(out_dir) / "clinical"
    out_dir.mkdir(parents=True, exist_ok=True)

    instant_rows: Dict[str, Dict] = {}
    view_rows: Dict[str, Dict] = {}
    patients: Dict[str, Dict[str, object]] = defaultdict(dict)
    fig_payload: Dict[str, tuple] = {}  # view id -> (res, raw MC populations)

    for res in results:
        if res.pred_samples is None:
            continue
        voxelarea = float(np.prod(res.voxelspacing[-2:])) if res.voxelspacing is not None else 1.0
        samples = jnp.asarray(res.pred_samples > 0.5, jnp.float32)  # (N, Te, Ta, H, W)
        areas_mc = np.asarray(_area_batch(samples)) * voxelarea  # (N, Te, Ta)

        # ---- per-instant area ----
        for inst_key, inst in (res.instants or {}).items():
            pred_area = float((res.pred[inst] != 0).sum()) * voxelarea
            gt_area = float((res.gt[inst] != 0).sum()) * voxelarea if res.gt is not None else None
            row = _metric_row(pred_area, gt_area, areas_mc[inst], 0.0, np.inf)
            instant_rows[f"{res.id}/{inst_key}"] = {f"Area_{k}": v for k, v in row.items()}

        # ---- per-view FAC / GLS ----
        ed, es = _ed_es(res)
        fac_mc = (areas_mc[ed] - areas_mc[es]) / areas_mc[ed]
        mc_pops = {"Area_ED": areas_mc[ed], "Area_ES": areas_mc[es],
                   "FAC": fac_mc}
        fig_payload[res.id] = (res, mc_pops)
        pred_fac = float(
            ((res.pred[ed] != 0).sum() - (res.pred[es] != 0).sum()) / max((res.pred[ed] != 0).sum(), 1)
        )
        gt_fac = None
        if res.gt is not None:
            gt_fac = float(
                ((res.gt[ed] != 0).sum() - (res.gt[es] != 0).sum()) / max((res.gt[ed] != 0).sum(), 1)
            )
        row = {f"FAC_{k}": v for k, v in _metric_row(pred_fac, gt_fac, fac_mc, 0.0, 1.0).items()}

        if res.contour_samples is not None and res.mu is not None:
            te, ta = res.contour_samples.shape[1:3]
            per = np.asarray(
                _perimeter_batch(jnp.asarray(res.contour_samples))
            ).reshape(res.contour_samples.shape[:3])
            gls_mc = (per[ed] - per[es]) / per[ed]
            mc_pops["GLS"] = gls_mc
            pred_gls = float(np.asarray(C.gls(jnp.asarray(res.mu[ed]), jnp.asarray(res.mu[es]))))
            gt_gls = None
            if res.contour is not None:
                gt_gls = float(np.asarray(
                    C.gls(jnp.asarray(res.contour[ed]), jnp.asarray(res.contour[es]))
                ))
            row.update({f"GLS_{k}": v for k, v in _metric_row(pred_gls, gt_gls, gls_mc, 0.0, 1.0).items()})
        else:
            # Mask-space GLS for the segmentation baselines (reference
            # clinical/view.py:88-124 GLS.gls -> EchoMeasure.gls on the
            # pred_samples label maps; the repo's contour tasks use the
            # contour branch above). Lengths for the ED/ES frames of every
            # MC sample in one batched device reduction.
            use_myo = Label.MYO in tuple(res.labels)
            seg_mc = jnp.round(jnp.asarray(
                res.pred_samples[[ed, es]], jnp.float32))  # (2, Te, Ta, H, W)
            lens = np.asarray(_gls_len_batch(seg_mc, use_myo))
            gls_mc = (lens[0] - lens[1]) / lens[0]  # (Te, Ta), ED-relative
            mc_pops["GLS"] = gls_mc
            pred_lens = np.asarray(_gls_len_batch(
                jnp.asarray(res.pred[[ed, es]], jnp.float32), use_myo))
            pred_gls = float((pred_lens[0] - pred_lens[1]) / pred_lens[0])
            gt_gls = None
            if res.gt is not None:
                gt_lens = np.asarray(_gls_len_batch(
                    jnp.asarray(res.gt[[ed, es]], jnp.float32), use_myo))
                gt_gls = float((gt_lens[0] - gt_lens[1]) / gt_lens[0])
            row.update({f"GLS_{k}": v for k, v in _metric_row(pred_gls, gt_gls, gls_mc, 0.0, 1.0).items()})
        view_rows[res.id] = row

        pid, _, view = res.id.rpartition("/")
        patients[pid][view] = res

    # ---- per-patient Simpson volumes / EF ----
    patient_rows: Dict[str, Dict] = {}
    vol_jit = jax.jit(jax.vmap(C.compute_left_ventricle_volumes, in_axes=(0, 0, None, 0, 0, None)))
    for pid, views in patients.items():
        a2c = views.get("2CH") or views.get("2C")
        a4c = views.get("4CH") or views.get("4C")
        if a2c is None or a4c is None:
            continue
        ed2, es2 = _ed_es(a2c)
        ed4, es4 = _ed_es(a4c)
        vs2 = jnp.asarray(a2c.voxelspacing[-2:] if a2c.voxelspacing is not None else (1.0, 1.0))
        vs4 = jnp.asarray(a4c.voxelspacing[-2:] if a4c.voxelspacing is not None else (1.0, 1.0))

        def masks(res, inst):
            s = res.pred_samples[inst] > 0.5
            return jnp.asarray(s.reshape(-1, *s.shape[-2:]), jnp.float32)

        edv_mc, esv_mc = vol_jit(masks(a2c, ed2), masks(a2c, es2), vs2,
                                 masks(a4c, ed4), masks(a4c, es4), vs4)
        te, ta = a2c.pred_samples.shape[1:3]
        edv_mc = np.asarray(edv_mc).reshape(te, ta)
        esv_mc = np.asarray(esv_mc).reshape(te, ta)
        ef_mc = (edv_mc - esv_mc) / edv_mc

        def one_vol(inst_pair):
            return C.compute_left_ventricle_volumes(
                jnp.asarray(a2c.pred[inst_pair[0]] != 0, jnp.float32),
                jnp.asarray(a2c.pred[inst_pair[1]] != 0, jnp.float32), vs2,
                jnp.asarray(a4c.pred[inst_pair[2]] != 0, jnp.float32),
                jnp.asarray(a4c.pred[inst_pair[3]] != 0, jnp.float32), vs4,
            )

        pred_edv, pred_esv = map(float, one_vol((ed2, es2, ed4, es4)))
        pred_ef = (pred_edv - pred_esv) / pred_edv if pred_edv else np.nan
        if a2c.gt is not None and a4c.gt is not None:
            gt_edv, gt_esv = map(float, np.asarray(C.compute_left_ventricle_volumes(
                jnp.asarray(a2c.gt[ed2] != 0, jnp.float32),
                jnp.asarray(a2c.gt[es2] != 0, jnp.float32), vs2,
                jnp.asarray(a4c.gt[ed4] != 0, jnp.float32),
                jnp.asarray(a4c.gt[es4] != 0, jnp.float32), vs4,
            )))
            gt_ef = (gt_edv - gt_esv) / gt_edv if gt_edv else np.nan
        else:
            gt_edv = gt_esv = gt_ef = None

        row = {}
        row.update({f"EDV_{k}": v for k, v in _metric_row(pred_edv, gt_edv, edv_mc, 0.0, np.inf).items()})
        row.update({f"ESV_{k}": v for k, v in _metric_row(pred_esv, gt_esv, esv_mc, 0.0, np.inf).items()})
        row.update({f"EF_{k}": v for k, v in _metric_row(pred_ef, gt_ef, ef_mc, 0.0, 1.0).items()})
        patient_rows[pid] = row

    summary = {}
    dfs = {}
    for name, rows in (("instant", instant_rows), ("view", view_rows), ("patient", patient_rows)):
        if not rows:
            continue
        df = pd.DataFrame(rows).T
        dfs[name] = df
        df.to_csv(out_dir / f"{name}_df.csv")
        for col in df.columns:
            if col.endswith("_error"):
                summary[f"{name}/{col}"] = float(np.nanmean(df[col].astype(float)))
            # Correlation of uncertainty (std) with error per metric family.
        for metric in {c.split("_")[0] for c in df.columns}:
            err_col, std_col = f"{metric}_error", f"{metric}_std"
            if err_col in df.columns and std_col in df.columns:
                e = df[err_col].astype(float).to_numpy()
                s = df[std_col].astype(float).to_numpy()
                ok = np.isfinite(e) & np.isfinite(s)
                if ok.sum() > 2:
                    summary[f"{name}/corr-{metric}_std-error"] = _pearson(s[ok], e[ok])
    # Rejection rates.
    for name, rows in (("view", view_rows), ("patient", patient_rows)):
        if rows:
            df = pd.DataFrame(rows).T
            for col in [c for c in df.columns if c.endswith("_reject")]:
                summary[f"{name}/{col}_rate"] = float(df[col].astype(bool).mean())

    # Fourth dataframe: per-instant Volume view of the patient EDV/ESV rows
    # (reference clinical_metrics.py:119-125).
    if "patient" in dfs:
        volume_df = merge_volume_df(dfs["patient"])
        volume_df.to_csv(out_dir / "volume_df.csv")
        dfs["volume"] = volume_df

    # Metric-level calibration + correlation dashboards over the MC
    # distributions — the TMI paper's core deliverable (reference
    # clinical_metrics.py:73-125 calls plot_calibration/plot_correlation per
    # clinical metric family).
    families = {
        "instant": ("Area",),
        "view": ("FAC", "GLS"),
        "patient": ("EF", "ESV", "EDV"),
        "volume": ("Volume",),
    }
    for name, metrics in families.items():
        df = dfs.get(name)
        if df is None:
            continue
        for metric in metrics:
            plot_metric_calibration(df, metric, out_dir, summary)
            plot_metric_correlation(df, metric, out_dir)  # gt vs pred, std-colored
            plot_metric_correlation(df, metric, out_dir, x="pred", y="mean",
                                    color=None)

    # Per-view dashboards — one composite figure per view in metric_figures/
    # (spline contours) and metric_figures2/ (mask-derived contours), the
    # reference's metric_plot deliverable (clinical_metrics.py:140-143).
    # Payloads are prepared here (parent: batched spline eval, small numpy
    # slices) and rendered through a process pool on large folds — rendering
    # dominates the evaluation epilogue (docs/PERF_NOTES.md round 4).
    try:
        from contouring_uncertainty_tpu.results.metric_figures import (
            prepare_view_payload,
            render_dashboards,
        )

        payloads = [
            prepare_view_payload(res, instant_rows, view_rows, mc_pops)
            for res, mc_pops in fig_payload.values()
        ]
        render_dashboards(payloads, out_dir)
    except Exception as exc:  # figures must not void the metric summary
        summary["metric_figures_error"] = f"{type(exc).__name__}: {exc}"
    return summary
