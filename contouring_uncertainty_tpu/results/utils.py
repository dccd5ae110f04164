"""Shared evaluation helpers: calibration curves, threshold sweeps,
correlations, multi-class dice.

Capability parity with contour_uncertainty/results/utils/{calibration.py:6-66,
thresholds.py, correlation.py:14-110, segmentation.py}. Mann-Kendall trend
tests are omitted (pymannkendall is not available here); Cook's-distance
outlier filtering is reimplemented directly (statsmodels unavailable).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Sequence

import numpy as np


def dice(pred: np.ndarray, gt: np.ndarray, labels, all_classes: bool = False) -> Dict[str, float]:
    """Per-class + mean Dice of int label maps (reference results/utils/segmentation.py)."""
    out = {}
    scores = []
    for lab in labels:
        if int(lab) == 0:
            continue
        p = pred == int(lab)
        g = gt == int(lab)
        denom = p.sum() + g.sum()
        score = 2.0 * (p & g).sum() / denom if denom > 0 else 1.0
        scores.append(score)
        if all_classes:
            out[f"Dice_{getattr(lab, 'name', lab)}"] = score
    out["Dice"] = float(np.mean(scores)) if scores else np.nan
    return out


def compute_calibration(error: np.ndarray, uncertainty: np.ndarray, nb_bins: int = 10,
                        filters: Optional[np.ndarray] = None):
    """Uniform-bin UCE (reference results/utils/calibration.py:6-33);
    `filters` keeps only the marked samples (reference :7-10)."""
    if filters is not None:
        keep = np.asarray(filters, bool)
        error, uncertainty = error[keep], uncertainty[keep]
    bounds = np.linspace(uncertainty.min(), uncertainty.max(), nb_bins + 1)
    ece = 0.0
    conf, acc, sizes = [], [], []
    for lo, hi in zip(bounds[:-1], bounds[1:]):
        in_bin = (uncertainty > lo) & (uncertainty < hi)
        prop = in_bin.mean()
        if prop > 0:
            a = error[in_bin].mean()
            c = uncertainty[in_bin].mean()
            ece += abs(c - a) * prop
            conf.append(c)
            acc.append(a)
            sizes.append(int(in_bin.sum()))
    return float(ece), conf, acc, sizes


def compute_adaptive_calibration(error: np.ndarray, uncertainty: np.ndarray, nb_bins: int = 10,
                                 filters: Optional[np.ndarray] = None):
    """Equal-mass-bin UCE (reference :36-66)."""
    if filters is not None:
        keep = np.asarray(filters, bool)
        error, uncertainty = error[keep], uncertainty[keep]
    idx = np.argsort(uncertainty)
    u_bins = np.array_split(uncertainty[idx], nb_bins)
    e_bins = np.array_split(error[idx], nb_bins)
    ece = 0.0
    conf, acc, sizes = [], [], []
    for u, e in zip(u_bins, e_bins):
        if len(u) == 0:
            continue
        prop = len(u) / nb_bins
        ece += abs(u.mean() - e.mean()) * prop
        conf.append(u.mean())
        acc.append(e.mean())
        sizes.append(len(u))
    return float(ece), conf, acc, sizes


def calibration(uncertainties: Dict, metrics: Dict, u_keys: Sequence[str],
                m_keys: Sequence[str], filename=None, adaptive: bool = False) -> Dict[str, float]:
    results = {}
    curves = []
    for u_key, m_key in zip(u_keys, m_keys):
        if u_key not in uncertainties or m_key not in metrics:
            continue
        u = np.asarray(uncertainties[u_key], float)
        e = np.asarray(metrics[m_key], float)
        ok = np.isfinite(u) & np.isfinite(e)
        if ok.sum() < 2:
            continue
        fn = compute_adaptive_calibration if adaptive else compute_calibration
        ece, conf, acc, sizes = fn(e[ok], u[ok])
        results[f"calibration-{m_key}-{u_key}"] = ece
        curves.append((u_key, m_key, conf, acc, ece))
    if filename and curves:
        _plot_calibration(curves, filename)
    return results


def _plot_calibration(curves, filename):
    import matplotlib

    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    f, axes = plt.subplots(1, len(curves), squeeze=False, figsize=(4 * len(curves), 4))
    for ax, (u_key, m_key, conf, acc, ece) in zip(axes.ravel(), curves):
        ax.plot(conf, acc, marker="o")
        rng = [min(conf), max(conf)]
        ax.plot(rng, rng, "--", c="k")
        ax.set_title(f"ECE={ece:.3f}")
        ax.set_xlabel(u_key)
        ax.set_ylabel(m_key)
    plt.tight_layout()
    plt.savefig(filename, dpi=80)
    plt.close()


def thresholded_metrics(uncertainties: Dict, metrics: Dict, u_keys, m_keys,
                        filename=None, nb_bins: int = 10) -> Dict[str, float]:
    """Mean error among samples below each uncertainty percentile threshold
    (reference results/utils/thresholds.py:16-96): per-threshold mean errors,
    a spearman `monoticity_*` scalar per pair, and (when `filename` is
    given) the reference's thresholds figure — error vs % of remaining
    samples, x-axis inverted, one panel per pair."""
    results = {}
    curves = []
    for u_key, m_key in zip(u_keys, m_keys):
        if u_key not in uncertainties or m_key not in metrics:
            continue
        u = np.asarray(uncertainties[u_key], float)
        e = np.asarray(metrics[m_key], float)
        ok = np.isfinite(u) & np.isfinite(e)
        u, e = u[ok], e[ok]
        if len(u) < nb_bins:
            continue
        u_sorted = np.sort(u)
        cut_idx = np.linspace(1, len(u_sorted) - 1, nb_bins).astype(int)
        pcts = cut_idx / len(u_sorted) * 100
        errs = []
        for pct, t in zip(pcts, u_sorted[cut_idx]):
            kept = e[u < t]
            errs.append(float(kept.mean()) if len(kept) else np.nan)
            if len(kept):
                results[f"threshold-{m_key}-{u_key}-{pct:.0f}"] = errs[-1]
        from scipy import stats as _st

        mono = _st.spearmanr(pcts, errs, nan_policy="omit")[0]
        results[f"monoticity_{m_key}-{u_key}"] = float(mono)
        curves.append((u_key, m_key, pcts, np.asarray(errs), float(mono)))
    if filename is not None and curves:
        import matplotlib

        matplotlib.use("Agg")
        from matplotlib import pyplot as plt

        f, axes = plt.subplots(1, len(curves), squeeze=False,
                               figsize=(4 * len(curves), 4))
        for ax, (u_key, m_key, pcts, errs, mono) in zip(axes.ravel(), curves):
            ax.plot(pcts, errs, marker="o")
            ax.set_title(f"{m_key}-{u_key} {mono:.2f}")
            ax.set_ylabel(m_key)
            ax.set_xlabel("Percentage of remaining samples")
            ax.invert_xaxis()
        plt.tight_layout()
        plt.savefig(filename, dpi=80)
        plt.close()
    return results


def thresholded_correlation(uncertainties: Dict, metrics: Dict, u_key: str,
                            m_key: str, out_dir=None, n: int = 20) -> Dict[str, float]:
    """Uncertainty-error correlation among samples ABOVE a sweep of
    uncertainty / error thresholds (reference results/metrics.py:22-66
    `Metrics.thresholded_correlation`), saving
    `corr_thresholds-{metric}-{uncertainty}.png` when `out_dir` is given.
    Returns the tail correlations at the median thresholds as scalars."""
    if u_key not in uncertainties or m_key not in metrics:
        return {}
    u = np.asarray(uncertainties[u_key], float)
    e = np.asarray(metrics[m_key], float)
    ok = np.isfinite(u) & np.isfinite(e)
    u, e = u[ok], e[ok]
    if len(u) < 3 or u.min() == u.max():
        return {}
    thr_u = np.linspace(u.min(), u.max(), n)
    thr_e = np.linspace(e.min(), e.max(), n)
    corr_u, corr_e = [], []
    for i in range(n):
        idx = u > thr_u[i]
        corr_u.append(_pearson(u[idx], e[idx]) if idx.sum() > 1 else np.nan)
        idx = e > thr_e[i]
        corr_e.append(_pearson(u[idx], e[idx]) if idx.sum() > 1 else np.nan)
    if out_dir is not None:
        import matplotlib

        matplotlib.use("Agg")
        from matplotlib import pyplot as plt

        fig = plt.figure()
        plt.suptitle(f"{m_key}-{u_key}")
        ax1 = fig.add_subplot(1, 1, 1)
        l1 = ax1.plot(thr_u, corr_u, marker="o", label="Uncertainty threshold")
        ax1.set_ylabel("Correlation")
        ax1.set_xlabel("Uncertainty thresholds")
        ax2 = ax1.twiny()
        ax2.yaxis.tick_right()
        l2 = ax2.plot(thr_e, corr_e, marker="o", color="r", label="Metric threshold")
        ax2.set_xlabel("Metric thresholds")
        leg = l1 + l2
        ax1.legend(leg, [l.get_label() for l in leg])
        plt.savefig(Path(out_dir) / f"corr_thresholds-{m_key}-{u_key}.png", dpi=80)
        plt.close()
    mid = n // 2
    return {
        f"tail_corr_u-{m_key}-{u_key}": float(corr_u[mid]),
        f"tail_corr_e-{m_key}-{u_key}": float(corr_e[mid]),
    }


def _pearson(x: np.ndarray, y: np.ndarray) -> float:
    if x.size == 0 or y.size == 0:
        return np.nan
    x = x - x.mean()
    y = y - y.mean()
    denom = np.sqrt((x * x).sum() * (y * y).sum())
    return float((x * y).sum() / denom) if denom > 0 else np.nan


def _cooks_distance_filter(x: np.ndarray, y: np.ndarray, factor: float = 4.0):
    """Drop points with Cook's distance > factor/n under simple linear fit
    (the reference used statsmodels OLSInfluence, correlation.py:14-110)."""
    n = len(x)
    if n < 4:
        return np.ones(n, bool)
    design = np.stack([np.ones(n), x], 1)
    hat_core = np.linalg.pinv(design.T @ design)
    beta = hat_core @ design.T @ y
    resid = y - design @ beta
    mse = (resid ** 2).sum() / max(n - 2, 1)
    leverage = np.einsum("ni,ij,nj->n", design, hat_core, design)
    denom = 2 * mse * (1 - leverage) ** 2
    # np.where would evaluate the division on denom == 0 rows and warn;
    # divide with an explicit where + inf fill keeps those rows excluded
    # silently (a zero-denominator point is an exact-leverage outlier).
    cooks = np.divide(resid ** 2 * leverage, denom,
                      out=np.full(n, np.inf), where=denom > 0)
    return cooks < factor / n


def compute_correlations(uncertainties: Dict, metrics: Dict, title: str = "",
                         ids=None, filename=None, filters=None):
    """Pearson-correlation grid between every (uncertainty, metric) pair, with
    and without Cook's-distance outlier removal. Returns a DataFrame."""
    import pandas as pd

    rows = {}
    for u_key, u_vals in uncertainties.items():
        row = {}
        for m_key, m_vals in metrics.items():
            u = np.asarray(u_vals, float)
            e = np.asarray(m_vals, float)
            ok = np.isfinite(u) & np.isfinite(e)
            if filters is not None:
                ok &= np.asarray(filters, bool)
            u, e = u[ok], e[ok]
            if len(u) < 3:
                row[m_key] = np.nan
                continue
            keep = _cooks_distance_filter(u, e)
            row[m_key] = _pearson(u[keep], e[keep])
        rows[u_key] = row
    df = pd.DataFrame(rows).T
    if filename is not None:
        _plot_corr(df, title, filename)
    return df


def _plot_corr(df, title, filename):
    import matplotlib

    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    f, ax = plt.subplots(figsize=(2 + df.shape[1], 2 + 0.5 * df.shape[0]))
    im = ax.imshow(df.values, vmin=-1, vmax=1, cmap="coolwarm")
    ax.set_xticks(range(df.shape[1]), df.columns, rotation=45, ha="right")
    ax.set_yticks(range(df.shape[0]), df.index)
    for i in range(df.shape[0]):
        for j in range(df.shape[1]):
            v = df.values[i, j]
            if np.isfinite(v):
                ax.text(j, i, f"{v:.2f}", ha="center", va="center", fontsize=8)
    ax.set_title(title)
    f.colorbar(im)
    plt.tight_layout()
    plt.savefig(filename, dpi=80)
    plt.close()


def dataframe_to_dict(df, prefix: str = "") -> Dict[str, float]:
    out = {}
    for u_key in df.index:
        for m_key in df.columns:
            out[f"{prefix}{u_key}-{m_key}".replace(" ", "_")] = df.loc[u_key, m_key]
    return out
