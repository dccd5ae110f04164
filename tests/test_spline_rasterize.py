"""Spline vs scipy splprep oracle; rasterizer vs matplotlib polygon-fill oracle
(stand-ins for the reference's scipy/skimage host pipeline,
utils/contour.py:9-53)."""

import numpy as np
import jax
import jax.numpy as jnp
from matplotlib.path import Path
from scipy import interpolate

from contouring_uncertainty_tpu.ops.spline import contour_spline, contour_tangents
from contouring_uncertainty_tpu.ops.rasterize import (
    rasterize_linear,
    rasterize_spline,
    rasterize_batch,
)


def _lv_like_contour(k=21, jitter=0.0, seed=0):
    t = np.linspace(0, np.pi, k)
    pts = np.stack(
        [128 + 60 * np.cos(t) + 5 * np.sin(3 * t), 200 - 140 * np.sin(t * 0.5)], -1
    )
    if jitter:
        pts += np.random.default_rng(seed).normal(scale=jitter, size=pts.shape)
    return pts.astype(np.float32)


def _oracle_fill(dense, h, w):
    """Even-odd polygon fill at pixel centers via matplotlib."""
    yy, xx = np.mgrid[0:h, 0:w]
    inside = Path(dense).contains_points(np.stack([xx.ravel(), yy.ravel()], -1))
    return inside.reshape(h, w).astype(np.float32)


def test_contour_spline_matches_scipy_splprep():
    pts = _lv_like_contour()
    tck, u = interpolate.splprep([pts[:, 0], pts[:, 1]], k=3, s=0)
    ref = np.array(interpolate.splev(np.linspace(0, 1, 1000), tck)).T
    got = np.asarray(contour_spline(jnp.asarray(pts), n=1000))
    np.testing.assert_allclose(got, ref, atol=1e-3)


def test_contour_spline_close_appends_first_point():
    pts = _lv_like_contour()
    got = np.asarray(contour_spline(jnp.asarray(pts), n=100, close=True))
    assert got.shape == (101, 2)
    np.testing.assert_allclose(got[-1], got[0], atol=1e-5)


def test_contour_tangents_match_scipy_derivative():
    pts = _lv_like_contour(jitter=1.0)
    tck, u = interpolate.splprep([pts[:, 0], pts[:, 1]], k=3, s=0)
    der = np.array(interpolate.splev(u, tck, der=1)).T
    der /= np.linalg.norm(der, axis=1, keepdims=True)
    got = np.asarray(contour_tangents(jnp.asarray(pts)))
    np.testing.assert_allclose(got, der, atol=1e-3)


def test_rasterize_spline_matches_polygon_oracle():
    pts = _lv_like_contour()
    got = np.asarray(rasterize_spline(jnp.asarray(pts), 256, 256, include_boundary=False))
    dense = np.asarray(contour_spline(jnp.asarray(pts), n=1024))
    ref = _oracle_fill(dense, 256, 256)
    disagree = np.abs(got - ref).sum()
    assert ref.sum() > 2000  # sanity: non-trivial area
    assert disagree / ref.sum() < 0.01, f"{disagree} pixels disagree of {ref.sum()}"


def test_rasterize_linear_matches_polygon_oracle():
    pts = _lv_like_contour()
    got = np.asarray(rasterize_linear(jnp.asarray(pts), 256, 256, include_boundary=False))
    ref = _oracle_fill(pts, 256, 256)
    disagree = np.abs(got - ref).sum()
    assert disagree / ref.sum() < 0.01


def test_rasterize_circle_area():
    # A densely-sampled circle of radius r has area ~ pi r^2.
    t = np.linspace(0, 2 * np.pi, 21, endpoint=False)
    r = 50.0
    pts = np.stack([128 + r * np.cos(t), 128 + r * np.sin(t)], -1).astype(np.float32)
    interior = np.asarray(rasterize_spline(jnp.asarray(pts), 256, 256, include_boundary=False))
    np.testing.assert_allclose(interior.sum(), np.pi * r * r, rtol=0.01)
    # With boundary pixels included the area grows by at most ~perimeter.
    full = np.asarray(rasterize_spline(jnp.asarray(pts), 256, 256))
    assert 0 <= full.sum() - interior.sum() < 2.5 * np.pi * r


def test_rasterize_batch_vmaps():
    pts = np.stack([_lv_like_contour(jitter=2.0, seed=s) for s in range(6)]).reshape(2, 3, 21, 2)
    masks = np.asarray(rasterize_batch(jnp.asarray(pts), 256, 256))
    assert masks.shape == (2, 3, 256, 256)
    assert (masks.sum(axis=(-1, -2)) > 2000).all()


def test_rasterize_is_jit_compatible_under_vmap_grad_free():
    # The fill is not differentiated; just ensure jit+vmap compile and run.
    pts = jnp.asarray(np.stack([_lv_like_contour(jitter=1.0, seed=s) for s in range(4)]))
    f = jax.jit(jax.vmap(lambda p: rasterize_spline(p, 128, 128)))
    out = f(pts / 2.0)
    assert out.shape == (4, 128, 128)


def test_approx_selection_matches_exact_fill():
    """The Pallas min-k crossing selection (ops/rasterize.py polygon_fill,
    exact_topk=False, E=1024 -> ops/pallas_select.py) must be pixel-exact vs
    the XLA top_k path on degenerate zigzag contours. On CPU the kernel runs
    in interpret mode, so this pins the selection algorithm; the
    Mosaic-compiled TPU kernel is additionally checked on-chip by bench.py's
    approx_parity_check."""
    from contouring_uncertainty_tpu.ops.rasterize import approx_parity_check

    assert approx_parity_check(n_contours=16) == 0


def test_boundary_onehot_matmul_matches_scatter_reference():
    """Boundary pixels are marked via onehot(y)^T @ onehot(x) >= 1 instead of
    a scatter (the scatter was the fattest non-conv op of the predict view
    step, docs/PERF_NOTES.md round-3 continuation). The matmul must be
    BIT-exact vs the reference semantics: parity fill + max-scatter of the
    rounded dense polygon vertices (utils/contour.py:28-40's implicit
    boundary from drawing the spline onto the grid)."""
    from contouring_uncertainty_tpu.ops.rasterize import polygon_fill
    from contouring_uncertainty_tpu.ops.spline import contour_spline

    for seed in range(6):
        pts = _lv_like_contour(jitter=3.0, seed=seed)
        dense = np.asarray(contour_spline(jnp.asarray(pts), n=1024, close=False))
        got = np.asarray(polygon_fill(jnp.asarray(dense), 256, 256))
        ref = np.array(
            polygon_fill(jnp.asarray(dense), 256, 256, include_boundary=False))
        xi = np.clip(np.round(dense[:, 0]).astype(int), 0, 255)
        yi = np.clip(np.round(dense[:, 1]).astype(int), 0, 255)
        ref[yi, xi] = 1.0
        np.testing.assert_array_equal(got, ref)
