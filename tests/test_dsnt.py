"""DSNT fused-moment op vs an explicit numpy oracle.

The oracle reimplements the reference math (task/regression/dsnt/utils.py:7-47)
directly: materialized coordinate grids + explicit weighted central moments.
Our op computes the same quantities from raw moments via one matmul.
"""

import numpy as np
import jax
import jax.numpy as jnp

from contouring_uncertainty_tpu.ops import coords as C
from contouring_uncertainty_tpu.ops import dsnt as D


def _oracle_linspace(length):
    first = -(length - 1.0) / length
    return np.arange(length) * (2.0 / length) + first


def _oracle_moments(probs):
    """probs: (N, K, H, W) -> mean, var, cov via explicit grids."""
    n, k, h, w = probs.shape
    xs = _oracle_linspace(w)
    ys = _oracle_linspace(h)
    X, Y = np.meshgrid(xs, ys)
    p = probs.reshape(n, k, -1)
    x = p @ X.reshape(-1)
    y = p @ Y.reshape(-1)
    var_x = np.einsum("nkp,nkp->nk", p, (X.reshape(-1)[None, None] - x[..., None]) ** 2)
    var_y = np.einsum("nkp,nkp->nk", p, (Y.reshape(-1)[None, None] - y[..., None]) ** 2)
    cov = np.einsum(
        "nkp,nkp->nk",
        p,
        (X.reshape(-1)[None, None] - x[..., None])
        * (Y.reshape(-1)[None, None] - y[..., None]),
    )
    mean = np.stack([x, y], -1)
    var = np.stack([var_x, var_y], -1)
    return mean, var, cov


def test_normalized_linspace_matches_reference_convention():
    for length in (4, 16, 256):
        np.testing.assert_allclose(
            np.asarray(C.normalized_linspace(length)), _oracle_linspace(length), rtol=1e-6
        )


def test_pixel_coord_roundtrip():
    rng = np.random.default_rng(0)
    pts = rng.uniform(-1, 1, size=(5, 21, 2)).astype(np.float32)
    pix = C.normalized_to_pixel(jnp.asarray(pts), (256, 256))
    back = C.pixel_to_normalized(pix, (256, 256))
    np.testing.assert_allclose(np.asarray(back), pts, atol=1e-5)
    # Known anchor: normalized -1..1 cell centers -> pixel centers 0..L-1.
    u = C.normalized_linspace(256)
    px = C.normalized_to_pixel(jnp.stack([u, u], -1), (256, 256))
    np.testing.assert_allclose(np.asarray(px[:, 0]), np.arange(256), atol=1e-4)


def test_dsnt_moments_match_oracle():
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(2, 5, 32, 32)).astype(np.float32) * 3
    probs = np.asarray(D.flat_softmax(jnp.asarray(logits)))
    np.testing.assert_allclose(probs.reshape(2, 5, -1).sum(-1), 1.0, atol=1e-5)

    mean, var, cov = D.dsnt_moments(jnp.asarray(probs))
    o_mean, o_var, o_cov = _oracle_moments(probs)
    np.testing.assert_allclose(np.asarray(mean), o_mean, atol=2e-5)
    np.testing.assert_allclose(np.asarray(var), o_var, atol=2e-5)
    np.testing.assert_allclose(np.asarray(cov), o_cov, atol=2e-5)


def test_dsnt_delta_heatmap_recovers_location():
    # A delta at pixel (x0, y0) must produce exactly that pixel coordinate.
    h = w = 64
    logits = np.full((1, 1, h, w), -1e9, np.float32)
    y0, x0 = 17, 42
    logits[0, 0, y0, x0] = 0.0
    _, mu, sigma = D.heatmaps_to_pixel_gaussians(jnp.asarray(logits))
    np.testing.assert_allclose(np.asarray(mu[0, 0]), [x0, y0], atol=1e-3)
    # Variances collapse to the PD-guard floor (1e-2 px^2).
    assert np.all(np.abs(np.asarray(sigma)) <= 1e-2 + 1e-6)


def test_dsnt_gaussian_heatmap_recovers_variance():
    # An isotropic Gaussian pmf has variance sigma^2 in pixel units.
    h = w = 128
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    sig = 5.0
    x0, y0 = 60.0, 50.0
    logp = -((xx - x0) ** 2 + (yy - y0) ** 2) / (2 * sig ** 2)
    logits = logp[None, None].astype(np.float32)
    _, mu, sigma = D.heatmaps_to_pixel_gaussians(jnp.asarray(logits))
    np.testing.assert_allclose(np.asarray(mu[0, 0]), [x0, y0], atol=1e-2)
    np.testing.assert_allclose(
        np.asarray(sigma[0, 0]), np.diag([sig ** 2, sig ** 2]), atol=0.05
    )


def test_gaussian_nll_matches_numpy():
    rng = np.random.default_rng(2)
    mu = rng.normal(size=(7, 2))
    y = rng.normal(size=(7, 2))
    a = rng.normal(size=(7, 2, 2))
    cov = a @ a.transpose(0, 2, 1) + 0.5 * np.eye(2)
    loss, logdet, maha = D.gaussian_nll(jnp.asarray(mu), jnp.asarray(cov), jnp.asarray(y))
    for i in range(7):
        d = (mu[i] - y[i])[:, None]
        ref_maha = float(d.T @ np.linalg.inv(cov[i]) @ d)
        ref_logdet = float(np.log(np.linalg.det(cov[i])))
        np.testing.assert_allclose(float(maha[i]), ref_maha, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(float(logdet[i]), ref_logdet, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(float(loss[i]), ref_logdet + ref_maha, rtol=1e-4, atol=1e-4)


def test_dsnt_is_differentiable():
    def f(logits):
        _, mu, sigma = D.heatmaps_to_pixel_gaussians(logits)
        target = jnp.ones_like(mu) * 10.0
        loss, _, _ = D.gaussian_nll(mu, sigma, target)
        return loss.mean()

    logits = jnp.asarray(np.random.default_rng(3).normal(size=(2, 3, 16, 16)), jnp.float32)
    g = jax.grad(f)(logits)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0


def test_logits_to_pixel_gaussians_matches_base_path():
    rng = np.random.default_rng(7)
    logits = jnp.asarray(rng.normal(size=(2, 5, 32, 32)).astype(np.float32) * 3)
    _, mu0, sig0 = D.heatmaps_to_pixel_gaussians(logits)
    mu1, sig1 = D.logits_to_pixel_gaussians(logits)
    np.testing.assert_allclose(np.asarray(mu1), np.asarray(mu0), atol=1e-4)
    np.testing.assert_allclose(np.asarray(sig1), np.asarray(sig0), rtol=1e-4, atol=1e-3)


def test_pallas_fused_wrapper_matches_base_path():
    # On CPU this exercises the XLA fallback of the fused op + its custom VJP.
    from contouring_uncertainty_tpu.ops.pallas_dsnt import heatmaps_to_pixel_gaussians_fused

    rng = np.random.default_rng(8)
    logits = jnp.asarray(rng.normal(size=(2, 4, 16, 16)).astype(np.float32))
    _, mu0, sig0 = D.heatmaps_to_pixel_gaussians(logits)
    mu1, sig1 = heatmaps_to_pixel_gaussians_fused(logits)
    np.testing.assert_allclose(np.asarray(mu1), np.asarray(mu0), atol=1e-4)
    np.testing.assert_allclose(np.asarray(sig1), np.asarray(sig0), rtol=1e-4, atol=1e-3)

    def f(l):
        mu, sig = heatmaps_to_pixel_gaussians_fused(l)
        return (mu ** 2).mean() + jnp.log(sig[..., 0, 0]).mean()

    def f0(l):
        _, mu, sig = D.heatmaps_to_pixel_gaussians(l)
        return (mu ** 2).mean() + jnp.log(sig[..., 0, 0]).mean()

    g1 = jax.grad(f)(logits)
    g0 = jax.grad(f0)(logits)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), atol=1e-5)


def test_pallas_kernel_interpret_parity_sharp_heatmaps():
    """The actual Pallas online-softmax kernel (interpret mode on CPU) vs the
    XLA reference on trained-model-like sharp Gaussian heatmaps at the
    FLAGSHIP 256^2 resolution.

    256^2 (not a smaller stand-in) matters: the variance derives as
    E[x^2] - E[x]^2 and at 256^2 that cancellation leaves only
    ~(sigma_px/128)^2 ~ 1e-3 of the raw moments' magnitude, so any low-
    precision term rounding in the moment matmul corrupts small sigmas (the
    round-2 bf16-term kernel passed this test at 64^2 and was up to ~100%
    wrong on sigma at 256^2 — caught by bench.py's on-chip parity check).
    The kernel now runs the matmul at full f32 precision; tolerances here are
    f32 accumulation level.
    """
    from contouring_uncertainty_tpu.ops.pallas_dsnt import (
        _raw_moments_pallas,
        _raw_moments_xla,
    )

    rng = np.random.default_rng(11)
    H = W = 256
    yy, xx = np.mgrid[0:H, 0:W]
    maps = []
    for _ in range(8):
        cx, cy = rng.uniform(16, W - 16), rng.uniform(16, H - 16)
        sig = rng.uniform(1.5, 8.0)
        maps.append(-(((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * sig**2)))
    x = jnp.asarray(np.stack(maps).reshape(-1, H * W).astype(np.float32))

    a = np.asarray(_raw_moments_pallas(x, H, W, interpret=True))
    b = np.asarray(_raw_moments_xla(x, H, W))

    def derive(r):
        ex, ey = r[:, 1], r[:, 2]
        return ex, ey, r[:, 3] - ex * ex, r[:, 4] - ey * ey

    exa, eya, vxa, vya = derive(a)
    exb, eyb, vxb, vyb = derive(b)
    # means within ~1e-3 px (normalized units * W/2 = px)
    assert np.abs(exa - exb).max() * W / 2 < 5e-3
    assert np.abs(eya - eyb).max() * W / 2 < 5e-3
    # variances within 0.5% relative (pixel sigma^2 down to ~2.25 px^2)
    np.testing.assert_allclose(vxa, vxb, rtol=5e-3)
    np.testing.assert_allclose(vya, vyb, rtol=5e-3)
    # bf16 input path: bf16 *logits* quantization shifts the softmax itself,
    # identically for both paths — parity must still hold tightly.
    a16 = np.asarray(_raw_moments_pallas(x.astype(jnp.bfloat16), H, W, interpret=True))
    b16 = np.asarray(_raw_moments_xla(x.astype(jnp.bfloat16), H, W))
    np.testing.assert_allclose(a16[:, 1:3], b16[:, 1:3], atol=2e-4)
    exa16, eya16, vxa16, vya16 = derive(a16)
    exb16, eyb16, vxb16, vyb16 = derive(b16)
    np.testing.assert_allclose(vxa16, vxb16, rtol=5e-3)
    np.testing.assert_allclose(vya16, vyb16, rtol=5e-3)


def test_pallas_cols_kernel_interpret_parity():
    """Column-layout kernel (the flagship serving route since round 3 — it
    consumes the head conv's natural batch-in-lanes layout so the feed is a
    bitcast, ops/pallas_dsnt.py _dsnt_kernel_cols) vs the XLA reference at
    the flagship 256^2 resolution, including the bf16-input and odd-column-
    count (padding) paths, plus its custom VJP against the XLA adjoint."""
    from contouring_uncertainty_tpu.ops.pallas_dsnt import (
        _raw_moments_pallas_cols,
        _raw_moments_xla,
        dsnt_raw_moments_cols,
    )

    rng = np.random.default_rng(13)
    H = W = 256
    yy, xx = np.mgrid[0:H, 0:W]
    maps = []
    for _ in range(7):  # odd count: exercises the N_BLOCK zero-pad path
        cx, cy = rng.uniform(16, W - 16), rng.uniform(16, H - 16)
        sig = rng.uniform(1.5, 8.0)
        maps.append(-(((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * sig**2)))
    x = jnp.asarray(np.stack(maps).reshape(-1, H * W).astype(np.float32))

    a = np.asarray(_raw_moments_pallas_cols(x.T, H, W, interpret=True))
    b = np.asarray(_raw_moments_xla(x, H, W))

    def derive(r):
        ex, ey = r[:, 1], r[:, 2]
        return ex, ey, r[:, 3] - ex * ex, r[:, 4] - ey * ey

    exa, eya, vxa, vya = derive(a)
    exb, eyb, vxb, vyb = derive(b)
    assert np.abs(exa - exb).max() * W / 2 < 5e-3
    assert np.abs(eya - eyb).max() * W / 2 < 5e-3
    np.testing.assert_allclose(vxa, vxb, rtol=5e-3)
    np.testing.assert_allclose(vya, vyb, rtol=5e-3)

    a16 = np.asarray(
        _raw_moments_pallas_cols(x.T.astype(jnp.bfloat16), H, W, interpret=True))
    b16 = np.asarray(_raw_moments_xla(x.astype(jnp.bfloat16), H, W))
    np.testing.assert_allclose(a16[:, 1:3], b16[:, 1:3], atol=2e-4)
    _, _, vxa16, vya16 = derive(a16)
    _, _, vxb16, vyb16 = derive(b16)
    np.testing.assert_allclose(vxa16, vxb16, rtol=5e-3)
    np.testing.assert_allclose(vya16, vyb16, rtol=5e-3)

    # custom VJP (CPU takes the XLA fallback inside dsnt_raw_moments_cols;
    # the adjoint itself is shared with the compiled path)
    xt = jnp.asarray(x.T[:, :4])

    def f_cols(z):
        return jnp.sum(jnp.sin(dsnt_raw_moments_cols(z, H, W)))

    def f_ref(z):
        return jnp.sum(jnp.sin(_raw_moments_xla(z.T, H, W)))

    g1 = np.asarray(jax.grad(f_cols)(xt))
    g2 = np.asarray(jax.grad(f_ref)(xt))
    np.testing.assert_allclose(g1, g2, atol=1e-6)
