"""Projected uncertainty + uncertainty maps vs reference-math oracles
(utils/uncertainty_projection.py:17-125, utils/umap.py, utils/skew_umap.py)."""

import numpy as np
import jax
import jax.numpy as jnp
from scipy import interpolate

from contouring_uncertainty_tpu.utils.projection import (
    projected_uncertainty,
    projected_uncertainty_value,
    projection_vectors,
)
from contouring_uncertainty_tpu.utils.umap import skew_umap, uncertainty_map


def _contour(k=21):
    t = np.linspace(0, np.pi, k)
    return np.stack([128 + 60 * np.cos(t) + 4 * np.sin(2 * t),
                     200 - 130 * np.sin(t * 0.55)], -1).astype(np.float32)


def test_projection_vectors_match_scipy_tangents():
    mu = _contour()
    tck, u = interpolate.splprep([mu[:, 0], mu[:, 1]], k=3, s=0)
    der = np.array(interpolate.splev(u, tck, der=1)).T
    der /= np.linalg.norm(der, axis=1, keepdims=True)
    # Reference convention: v = flip(tangent) with y negated -> (t_y, -t_x).
    ref = np.stack([der[:, 1], -der[:, 0]], -1)
    got = np.asarray(projection_vectors(jnp.asarray(mu)))
    np.testing.assert_allclose(got, ref, atol=5e-3)


def test_projected_uncertainty_isotropic_cov():
    # Isotropic covariance: the projected sigma equals sqrt(var) everywhere.
    mu = _contour()
    cov = jnp.tile(jnp.eye(2) * 9.0, (21, 1, 1))
    u, v = projected_uncertainty(jnp.asarray(mu), cov)
    np.testing.assert_allclose(np.asarray(u), 3.0, atol=1e-3)
    # Projection directions are unit vectors.
    np.testing.assert_allclose(np.linalg.norm(np.asarray(v), axis=1), 1.0, atol=1e-4)


def test_projected_uncertainty_matches_marginal_formula():
    mu = _contour()
    rng = np.random.default_rng(0)
    a = rng.normal(size=(21, 2, 2))
    cov = a @ a.transpose(0, 2, 1) + 2 * np.eye(2)
    u, v = projected_uncertainty(jnp.asarray(mu), jnp.asarray(cov.astype(np.float32)))
    u = np.asarray(u)
    v = np.asarray(v)
    # Oracle: rotate cov by -angle(v) and take sqrt of the xx entry
    # (reference bivariatenormal.py marginal + uncertainty_projection.py).
    for k in range(21):
        ang = np.arctan2(v[k, 1], v[k, 0])
        rot = np.array([[np.cos(-ang), -np.sin(-ang)], [np.sin(-ang), np.cos(-ang)]])
        ref = np.sqrt((rot @ cov[k] @ rot.T)[0, 0])
        np.testing.assert_allclose(u[k], ref, rtol=1e-3)


def test_projected_uncertainty_value_endpoint_eigensum():
    mu = _contour()
    cov = jnp.tile(jnp.eye(2) * 4.0, (21, 1, 1))
    total = float(projected_uncertainty_value(jnp.asarray(mu), cov))
    # Endpoints/apex use sum of sqrt-eigenvalues (2+2=4), others sqrt(var)=2.
    expected = 3 * 4.0 + 18 * 2.0
    np.testing.assert_allclose(total, expected, rtol=1e-3)


def test_uncertainty_map_properties():
    mu = _contour()
    cov = jnp.tile(jnp.eye(2) * 16.0, (21, 1, 1))
    umap = np.asarray(uncertainty_map(jnp.asarray(mu), cov, (256, 256)))
    assert umap.shape == (256, 256)
    assert umap.max() > 0
    # Peak weight is the standard normal pdf at 0.
    np.testing.assert_allclose(umap.max(), 1 / np.sqrt(2 * np.pi), atol=1e-3)
    # Mass concentrates near the closed contour (incl. the straight closing
    # line across the base): far image corners stay zero.
    assert umap[:30, :30].max() == 0.0
    assert umap[:60, -30:].max() == 0.0


def test_skew_umap_mode_shifts_with_alpha():
    mu = _contour()
    cov = jnp.tile(jnp.eye(2) * 16.0, (21, 1, 1))
    alpha_zero = jnp.zeros((21, 2))
    mode0, umap0 = skew_umap(jnp.asarray(mu), cov, alpha_zero, (256, 256))
    # Zero skew: the projected mode stays at mu (within grid resolution).
    np.testing.assert_allclose(np.asarray(mode0), mu, atol=0.5)
    assert np.isfinite(np.asarray(umap0)).all()

    alpha = jnp.ones((21, 2)) * jnp.asarray([4.0, 0.0])
    mode1, umap1 = skew_umap(jnp.asarray(mu), cov, alpha, (256, 256))
    # Nonzero skew shifts modes.
    assert float(jnp.abs(mode1 - jnp.asarray(mu)).max()) > 0.5
    assert float(umap1.max()) > 0


def test_plotting_helpers_run():
    import matplotlib

    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    from contouring_uncertainty_tpu.utils.plotting import (
        confidence_ellipse,
        plot_skewed_normals,
    )

    f, ax = plt.subplots()
    confidence_ellipse(100, 100, np.array([[25.0, 5.0], [5.0, 16.0]]), ax)
    plot_skewed_normals(ax, _contour()[:3], np.tile(np.eye(2) * 9, (3, 1, 1)),
                        np.ones((3, 2)))
    plt.close(f)


def test_paint_points_matches_scatter_max_reference():
    """_paint_points marks pixels via one-hot matmuls + per-contour max
    (docs/PERF_NOTES.md round-3 second continuation); on identical f32 point
    inputs it must be bit-exact vs the scatter-max reference semantics
    (.at[yi, xi].max(w) of the rounded points, reference utils/umap.py:10-33
    draw loop). Tested on the painting stage directly so spline/linspace
    1-ulp jit-vs-eager drift cannot make the bitwise assert flaky."""
    from contouring_uncertainty_tpu.utils.umap import _paint_points

    rng = np.random.default_rng(0)
    pts = rng.uniform(-5.0, 260.0, size=(32, 1256, 2)).astype(np.float32)
    # include exact .5 ties and out-of-range points
    pts[:, :50] = np.round(pts[:, :50]) + 0.5
    weights = rng.uniform(0.1, 1.0, size=32).astype(np.float32)

    got = np.asarray(jax.jit(
        lambda p, w: _paint_points(p, w, (256, 256))
    )(jnp.asarray(pts), jnp.asarray(weights)))

    ref = np.zeros((256, 256), np.float32)
    for c, w in zip(pts, weights):
        xi = np.clip(np.round(c[:, 0]).astype(int), 0, 255)
        yi = np.clip(np.round(c[:, 1]).astype(int), 0, 255)
        np.maximum.at(ref, (yi, xi), w)
    np.testing.assert_array_equal(got, ref)


def test_draw_contours_close_to_scatter_reference():
    """End-to-end _draw_contours vs an eager scatter-max rebuild: allclose
    (NOT bitwise — eager vs jit spline evaluation may differ by 1 ulp and a
    point sitting exactly on a .5 boundary could flip a pixel)."""
    from contouring_uncertainty_tpu.ops.spline import contour_spline
    from contouring_uncertainty_tpu.utils.umap import _draw_contours

    rng = np.random.default_rng(0)
    theta = np.linspace(0, np.pi, 21)
    base = np.stack([128 + 60 * np.cos(theta), 60 + 140 * np.sin(theta)], -1)
    contours = (base[None] + rng.normal(scale=4.0, size=(8, 21, 2))
                ).astype(np.float32)
    weights = rng.uniform(0.1, 1.0, size=8).astype(np.float32)

    got = np.asarray(jax.jit(
        lambda c, w: _draw_contours(c, w, (256, 256))
    )(jnp.asarray(contours), jnp.asarray(weights)))

    ref = np.zeros((256, 256), np.float32)
    for c, w in zip(contours, weights):
        cj = jnp.asarray(c)
        seg_w = jnp.linspace(0.0, 1.0, 256)[:, None]
        seg = cj[-1][None] * (1 - seg_w) + cj[0][None] * seg_w
        pts = np.asarray(
            jnp.concatenate([contour_spline(cj, n=1000), seg], axis=0))
        xi = np.clip(np.round(pts[:, 0]).astype(int), 0, 255)
        yi = np.clip(np.round(pts[:, 1]).astype(int), 0, 255)
        np.maximum.at(ref, (yi, xi), w)
    # identical up to boundary-pixel rounding of 1-ulp-different points
    assert (got != ref).mean() < 1e-3
