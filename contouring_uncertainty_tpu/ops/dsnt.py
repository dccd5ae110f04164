"""DSNT (differentiable spatial-to-numerical transform) as one fused moment matmul.

Capability parity with the reference's dsnt/flat_softmax
(contour_uncertainty/task/regression/dsnt/utils.py:7-77), redesigned for TPU:
instead of materializing full X/Y coordinate grids and taking K separate
(K,HW)x(1,HW) inner products per moment, we build a single static basis
matrix  B in R^{HW x M}  whose columns are the monomials
[x, y, x^2, y^2, x*y (, x^3, y^3)] of the normalized cell-center grid and
compute *all* raw moments of all K heatmaps with one MXU matmul

    moments = softmax(logits) @ B        # (N*K, HW) @ (HW, M)

Central moments then follow from raw moments:
    var_x  = E[x^2] - E[x]^2
    cov_xy = E[xy]  - E[x] E[y]
which is algebraically identical to the reference's explicit
sum(p * (X - mu)^2) formulation but reads the heatmap once.

XLA fuses the softmax into the matmul's epilogue; a further Pallas variant
lives in ops/pallas_dsnt.py for the single-pass fused reduction.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from contouring_uncertainty_tpu.ops.coords import normalized_linspace, normalized_to_pixel


def flat_softmax(logits: jnp.ndarray) -> jnp.ndarray:
    """Softmax over the trailing two (spatial) axes. Input (..., H, W)."""
    shape = logits.shape
    flat = logits.reshape(*shape[:-2], shape[-2] * shape[-1])
    return jax.nn.softmax(flat, axis=-1).reshape(shape)


def _moment_basis(height: int, width: int, order: int, dtype) -> jnp.ndarray:
    """Static (H*W, M) monomial basis over the normalized cell-center grid.

    Columns: [x, y, x^2, y^2, x*y] and, if order >= 3, [x^3, y^3].
    """
    xs = normalized_linspace(width, dtype=jnp.float32)
    ys = normalized_linspace(height, dtype=jnp.float32)
    x = jnp.tile(xs[None, :], (height, 1)).reshape(-1)
    y = jnp.tile(ys[:, None], (1, width)).reshape(-1)
    cols = [x, y, x * x, y * y, x * y]
    if order >= 3:
        cols += [x ** 3, y ** 3]
    return jnp.stack(cols, axis=-1).astype(dtype)


@partial(jax.jit, static_argnames=("compute_skew",))
def dsnt_moments(probs: jnp.ndarray, compute_skew: bool = False):
    """First/second (and optionally third central) moments of spatial pmfs.

    Args:
        probs: (..., K, H, W) normalized heatmaps (rows sum to 1).
        compute_skew: also return third *central* moments.

    Returns:
        mean: (..., K, 2) normalized (x, y) coordinates.
        var: (..., K, 2) variances (x, y).
        cov: (..., K) covariance between x and y.
        [skew]: (..., K, 2) third central moments E[(u-mu)^3].
    """
    *lead, height, width = probs.shape
    basis = _moment_basis(height, width, 3 if compute_skew else 2, jnp.float32)
    flat = probs.reshape(-1, height * width).astype(jnp.float32)
    # HIGHEST precision: the central-moment cancellation (E[x^2] - E[x]^2)
    # needs full f32 accumulation, not the MXU's default bf16 passes.
    raw = jnp.dot(flat, basis, precision=jax.lax.Precision.HIGHEST)  # (prod(lead), M)
    raw = raw.reshape(*lead, basis.shape[-1])

    ex, ey = raw[..., 0], raw[..., 1]
    exx, eyy, exy = raw[..., 2], raw[..., 3], raw[..., 4]
    mean = jnp.stack([ex, ey], axis=-1)
    var = jnp.stack([exx - ex * ex, eyy - ey * ey], axis=-1)
    cov = exy - ex * ey
    if not compute_skew:
        return mean, var, cov
    exxx, eyyy = raw[..., 5], raw[..., 6]
    # Third central moment: E[u^3] - 3 mu E[u^2] + 2 mu^3.
    skew = jnp.stack(
        [
            exxx - 3.0 * ex * exx + 2.0 * ex ** 3,
            eyyy - 3.0 * ey * eyy + 2.0 * ey ** 3,
        ],
        axis=-1,
    )
    return mean, var, cov, skew


def build_cov_matrix(var: jnp.ndarray, cov_xy: jnp.ndarray) -> jnp.ndarray:
    """Assemble (..., 2, 2) covariance matrices from per-axis variances + cross term."""
    row0 = jnp.stack([var[..., 0], cov_xy], axis=-1)
    row1 = jnp.stack([cov_xy, var[..., 1]], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


@partial(jax.jit, static_argnames=("use_covar",))
def heatmaps_to_pixel_gaussians(logits: jnp.ndarray, use_covar: bool = True):
    """Full DSNT head: logits -> per-keypoint pixel-space Gaussian (mu, Sigma).

    Mirrors the scaling used by the reference DSNT-AL task
    (task/regression/dsnt/dsnt_al.py:45-71): normalized moments are converted
    to pixels with `pixel = 0.5*((c+1)*size - 1)` and second moments scaled by
    (size/2)^2, assuming square inputs (size = W = H).

    Args:
        logits: (..., K, H, W) raw heatmap logits.
        use_covar: include the xy covariance term (off-diagonal) in Sigma.

    Returns:
        probs: (..., K, H, W) spatial softmax.
        mu: (..., K, 2) pixel coordinates (x, y).
        sigma: (..., K, 2, 2) pixel-space covariance matrices.
    """
    height, width = logits.shape[-2:]
    probs = flat_softmax(logits)
    mean, var, cov = dsnt_moments(probs)
    mu = normalized_to_pixel(mean, (height, width))
    scale = (width / 2.0) ** 2
    # Positive-definiteness guard (the reference loss NaNs when a heatmap
    # collapses to a delta and det(Sigma) <= 0 numerically): floor the
    # variances at ~a hundredth of a pixel^2 and clamp |corr| < 1.
    pixel_var = jnp.maximum(var * scale, 1e-2)
    pixel_cov = jnp.where(use_covar, cov * scale, jnp.zeros_like(cov))
    max_cov = 0.999 * jnp.sqrt(pixel_var[..., 0] * pixel_var[..., 1])
    pixel_cov = jnp.clip(pixel_cov, -max_cov, max_cov)
    sigma = build_cov_matrix(pixel_var, pixel_cov)
    return probs, mu, sigma


@partial(jax.jit, static_argnames=("use_covar",))
def logits_to_pixel_gaussians(logits: jnp.ndarray, use_covar: bool = True):
    """Lean DSNT head used on hot paths: identical math to
    `heatmaps_to_pixel_gaussians` but never materializes the normalized
    softmax — moments of the *unnormalized* exp are taken in one matmul
    (with a leading ones column for the partition sum) and normalized after.
    Saves ~2 HBM passes over the (B, K, H, W) tensor (measured 6.1 -> 5.0 ms
    for batch 128 x K21 x 256^2 on v5e).

    On TPU with bfloat16 logits (the flagship serving path emits the head in
    bf16 — models/unet.py `head_dtype`), this routes through the single-pass
    Pallas online-softmax kernel (ops/pallas_dsnt.py), which reads the
    heatmaps from HBM exactly once: measured 19.5 vs 22.3 us/frame for the
    XLA path at batch 128 x K21 x 256^2 on v5e (round 3, after the moment
    matmul moved to full f32 precision for sigma correctness). f32 logits
    keep the XLA path (the f32 DMA erases the kernel's gain).

    Returns (mu (..., K, 2), sigma (..., K, 2, 2)).
    """
    *lead, height, width = logits.shape
    hw = height * width
    if (
        jax.default_backend() != "cpu"
        and logits.dtype == jnp.bfloat16
        and hw % 128 == 0
    ):
        from contouring_uncertainty_tpu.ops.pallas_dsnt import dsnt_raw_moments_cols

        # Feed the COLUMN-layout kernel with physical order [h][w][*lead
        # reversed]: that is exactly the batch-in-lanes layout the head's 1x1
        # output conv prefers to emit, so this transpose+reshape lowers to a
        # bitcast instead of the two full relayout passes the (B*K, HW) row
        # form forced (28.9 us/frame of `copy` at batch 512, trace r3).
        nd = logits.ndim
        perm = (nd - 2, nd - 1) + tuple(reversed(range(nd - 2)))
        flat_t = jnp.transpose(logits, perm).reshape(hw, -1)
        raw = dsnt_raw_moments_cols(flat_t, height, width)  # (prod(lead), 8)
        raw = raw[:, :6].reshape(*reversed(lead), 6)
        raw = jnp.transpose(raw, tuple(reversed(range(len(lead)))) + (len(lead),))
    else:
        # SEPARABLE moments in the heatmap's NATIVE (..., H, W) layout —
        # no transpose/reshape of the big tensor at all. The earlier
        # column-oriented (6, HW) x (HW, ...) tensordot was "bitcast-clean"
        # at training shapes, but at the predict-head shape (lead (20, 21))
        # XLA relayouted the 110 MB f32 exp tensor to feed the contraction
        # (copy.1652, 655 us/frame = 6% of the TMI view step — round-5
        # trace). Every monomial in [1, x, y, x^2, y^2, xy] is separable, so
        # the six moments reduce along single axes: row/col sums consume e
        # in whatever layout the head conv emitted (XLA reduces any axis
        # in-place and fuses the exp), then the weighted sums run on the
        # tiny (..., H)/(..., W) marginals. E[xy] = sum_h y_h (sum_w x_w
        # e_hw) needs one extra x-weighted pass over e. All accumulation is
        # f32 VPU (no MXU involved) — at least as accurate as the HIGHEST
        # matmul it replaces (oracle gates in tests/test_dsnt.py +
        # test_torch_parity.py). Lead axes never merge, so every lead axis
        # stays GSPMD-shardable (DP serving requirement).
        xs = normalized_linspace(width, dtype=jnp.float32)   # (W,)
        ys = normalized_linspace(height, dtype=jnp.float32)  # (H,)
        t = logits.astype(jnp.float32)
        m = jnp.max(t, axis=(-2, -1), keepdims=True)
        e = jnp.exp(t - m)                     # (..., H, W)
        col = jnp.sum(e, axis=-2)              # (..., W) marginal over y
        row = jnp.sum(e, axis=-1)              # (..., H) marginal over x
        tx = jnp.sum(e * xs, axis=-1)          # (..., H) x-weighted rows
        s0 = jnp.sum(row, axis=-1)             # (...,)
        ex = jnp.sum(col * xs, axis=-1) / s0
        ey = jnp.sum(row * ys, axis=-1) / s0
        ex2 = jnp.sum(col * (xs * xs), axis=-1) / s0
        ey2 = jnp.sum(row * (ys * ys), axis=-1) / s0
        exy = jnp.sum(tx * ys, axis=-1) / s0
        raw = jnp.stack([jnp.ones_like(ex), ex, ey, ex2, ey2, exy], axis=-1)
    return raw6_to_pixel_gaussians(raw, height, width, use_covar)


def raw6_to_pixel_gaussians(raw: jnp.ndarray, height: int, width: int,
                            use_covar: bool = True):
    """Normalized raw moments [1, x, y, x^2, y^2, xy] (..., 6) in normalized
    coordinates -> pixel-space (mu, Sigma) with the shared PD guard. Used by
    both DSNT paths and the fused serving engine's epilogue."""
    ex, ey = raw[..., 1], raw[..., 2]
    var = jnp.stack([raw[..., 3] - ex * ex, raw[..., 4] - ey * ey], axis=-1)
    cov = raw[..., 5] - ex * ey
    mu = normalized_to_pixel(jnp.stack([ex, ey], axis=-1), (height, width))
    scale = (width / 2.0) ** 2
    pixel_var = jnp.maximum(var * scale, 1e-2)
    pixel_cov = jnp.where(use_covar, cov * scale, jnp.zeros_like(cov))
    max_cov = 0.999 * jnp.sqrt(pixel_var[..., 0] * pixel_var[..., 1])
    pixel_cov = jnp.clip(pixel_cov, -max_cov, max_cov)
    return mu, build_cov_matrix(pixel_var, pixel_cov)


def gaussian_nll(mu: jnp.ndarray, sigma: jnp.ndarray, y: jnp.ndarray,
                 log_penalty_weight: float = 1.0, mse_weight: float = 1.0):
    """Per-point bivariate Gaussian NLL:  w1*log|Sigma| + w2*(mu-y)^T Sigma^-1 (mu-y).

    Matches the reference DSNT-AL loss (dsnt_al.py:64-71). Uses closed-form
    2x2 inverse/determinant (no generic linalg on the hot path).

    Args:
        mu: (..., 2), sigma: (..., 2, 2), y: (..., 2).

    Returns:
        (loss_per_point, logdet_term, maha_term), each (...,).
    """
    a = sigma[..., 0, 0]
    b = sigma[..., 0, 1]
    d = sigma[..., 1, 1]
    det = a * d - b * b
    diff = mu - y
    dx, dy = diff[..., 0], diff[..., 1]
    # (mu-y)^T Sigma^-1 (mu-y) with the 2x2 adjugate.
    maha = (d * dx * dx - 2.0 * b * dx * dy + a * dy * dy) / det
    logdet = jnp.log(det)
    loss = log_penalty_weight * logdet + mse_weight * maha
    return loss, logdet, maha


def euclidean_error(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Per-point Euclidean distance over the last axis."""
    return jnp.linalg.norm(pred - target, axis=-1)
