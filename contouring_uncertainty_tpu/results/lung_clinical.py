"""Lung (JSRT) clinical metrics over the MC population: per-structure areas
and the cardiothoracic ratio.

The reference ships the multi-structure machinery (per-structure umaps and
mask rasterization, contour_uncertainty/data/lung/utils.py:25-120) but no
lung-specific clinical processor; this provides the clinical row the other
datasets get (results/clinical/ pattern) using standard chest-film
measurements: lung/heart areas and CTR = cardiac width / thoracic width.
Mask metrics come from one batched device reduction over the whole
(Te, Ta) sample population (utils/clinical.py lung_mask_metrics); contour
tasks additionally get per-structure landmark areas (rlung/llung/heart
shoelace over contour_samples, utils/clinical.py contour_area).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from contouring_uncertainty_tpu.data.config import LungLabel
from contouring_uncertainty_tpu.data.lung import STRUCTURES
from contouring_uncertainty_tpu.results import register
from contouring_uncertainty_tpu.results.utils import _pearson
from contouring_uncertainty_tpu.utils import clinical as C

_mask_metrics_batch = jax.jit(
    lambda segs: jax.vmap(C.lung_mask_metrics)(
        segs.reshape(-1, *segs.shape[-2:])
    ).reshape(*segs.shape[:-2], 3)
)

_area_batch = jax.jit(
    lambda pts: jax.vmap(C.contour_area)(pts.reshape(-1, *pts.shape[-2:])
                                         ).reshape(pts.shape[:-2])
)

_MASK_METRICS = ("LungArea", "HeartArea", "CTR")


@register("lung_clinical")
def lung_clinical(results: List, out_dir: Path) -> Dict:
    from contouring_uncertainty_tpu.results.clinical import _metric_row

    out = Path(out_dir) / "lung_clinical"
    out.mkdir(parents=True, exist_ok=True)
    rows: Dict[str, Dict] = {}
    for res in results:
        if res.pred is None or res.pred_samples is None:
            continue
        row: Dict = {}
        # One PA film per case: frame 0 (data/lung.py predict_views).
        pred_m = np.asarray(_mask_metrics_batch(
            jnp.asarray(res.pred[:1], jnp.int32)))[0]
        gt_m = (np.asarray(_mask_metrics_batch(
            jnp.asarray(res.gt[:1], jnp.int32)))[0]
            if res.gt is not None else [None] * 3)
        mc_m = np.asarray(_mask_metrics_batch(
            jnp.round(jnp.asarray(res.pred_samples[0], jnp.float32)
                      ).astype(jnp.int32)))  # (Te, Ta, 3)
        bounds = {"LungArea": (0.0, np.inf), "HeartArea": (0.0, np.inf),
                  "CTR": (0.0, 1.0)}
        for j, name in enumerate(_MASK_METRICS):
            lo, hi = bounds[name]
            row.update({f"{name}_{k}": v for k, v in _metric_row(
                float(pred_m[j]),
                float(gt_m[j]) if gt_m[j] is not None else None,
                mc_m[..., j], lo, hi).items()})

        # Per-structure landmark areas (contour tasks only; the label map
        # cannot split right/left lung — they share LungLabel.LUNG).
        if (res.contour_samples is not None and res.mu is not None
                and res.mu.shape[-2] == STRUCTURES[-1][2]):
            samples = jnp.asarray(res.contour_samples[0], jnp.float32)
            mu = jnp.asarray(res.mu[:1], jnp.float32)
            gt_c = (jnp.asarray(res.contour[:1], jnp.float32)
                    if res.contour is not None else None)
            for sname, a, b, _ in STRUCTURES:
                mc_a = np.asarray(_area_batch(samples[..., a:b, :]))
                pred_a = float(np.asarray(_area_batch(mu[..., a:b, :]))[0])
                gt_a = (float(np.asarray(_area_batch(gt_c[..., a:b, :]))[0])
                        if gt_c is not None else None)
                row.update({f"Area_{sname}_{k}": v for k, v in _metric_row(
                    pred_a, gt_a, mc_a, 0.0, np.inf).items()})
        rows[res.id] = row

    if not rows:
        return {}
    df = pd.DataFrame.from_dict(rows, orient="index")
    df.to_csv(out / "view_df.csv")

    summary: Dict[str, float] = {}
    metric_names = sorted({c.rsplit("_", 1)[0] for c in df.columns
                           if c.endswith("_error")})
    for m in metric_names:
        err = df[f"{m}_error"].to_numpy(float)
        std = df[f"{m}_std"].to_numpy(float)
        ok = np.isfinite(err)
        if ok.any():
            summary[f"{m}_error"] = float(np.nanmean(err[ok]))
            summary[f"{m}_corr"] = _pearson(std[ok], err[ok])
        summary[f"{m}_reject_rate"] = float(df[f"{m}_reject"].mean())
    return summary
