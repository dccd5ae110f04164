"""Small symmetric-matrix helpers used by the bivariate distributions.

All functions broadcast over leading batch axes and avoid general
eigensolvers on the hot path: 2x2 symmetric eigendecompositions are
closed-form, which XLA maps onto the VPU (the reference used
torch.linalg.eig on full matrices — distributions/utils.py:100-129).
"""

from __future__ import annotations

import jax.numpy as jnp


def eigh2x2(mat: jnp.ndarray):
    """Closed-form eigendecomposition of symmetric (..., 2, 2) matrices.

    Returns (eigvals (..., 2) ascending, eigvecs (..., 2, 2) with columns as
    eigenvectors).
    """
    a = mat[..., 0, 0]
    b = mat[..., 0, 1]
    d = mat[..., 1, 1]
    half_tr = 0.5 * (a + d)
    # Radius of the eigenvalue pair around the mean of the trace.
    rad = jnp.sqrt(jnp.maximum(0.25 * (a - d) ** 2 + b * b, 0.0))
    lam1 = half_tr - rad
    lam2 = half_tr + rad
    # Eigenvector for lam2: (b, lam2 - a), falling back to e_x when b == 0.
    safe = jnp.abs(b) > 1e-30
    v2x = jnp.where(safe, b, jnp.where(a >= d, 1.0, 0.0))
    v2y = jnp.where(safe, lam2 - a, jnp.where(a >= d, 0.0, 1.0))
    norm = jnp.sqrt(v2x * v2x + v2y * v2y)
    v2x, v2y = v2x / norm, v2y / norm
    # lam1's eigenvector is the orthogonal complement.
    v1x, v1y = -v2y, v2x
    vals = jnp.stack([lam1, lam2], axis=-1)
    vecs = jnp.stack(
        [jnp.stack([v1x, v2x], axis=-1), jnp.stack([v1y, v2y], axis=-1)], axis=-2
    )
    return vals, vecs


def mat2_vec(mat: jnp.ndarray, vec: jnp.ndarray) -> jnp.ndarray:
    """(..., 2, 2) @ (..., 2) as explicit VPU elementwise ops.

    Avoids dot_general so XLA never routes these tiny contractions through
    the MXU at reduced (bf16) precision.
    """
    x = mat[..., 0, 0] * vec[..., 0] + mat[..., 0, 1] * vec[..., 1]
    y = mat[..., 1, 0] * vec[..., 0] + mat[..., 1, 1] * vec[..., 1]
    return jnp.stack([x, y], axis=-1)


def mat2_mat(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(..., 2, 2) @ (..., 2, 2) as explicit VPU elementwise ops."""
    return jnp.stack(
        [
            jnp.stack(
                [
                    a[..., 0, 0] * b[..., 0, 0] + a[..., 0, 1] * b[..., 1, 0],
                    a[..., 0, 0] * b[..., 0, 1] + a[..., 0, 1] * b[..., 1, 1],
                ],
                axis=-1,
            ),
            jnp.stack(
                [
                    a[..., 1, 0] * b[..., 0, 0] + a[..., 1, 1] * b[..., 1, 0],
                    a[..., 1, 0] * b[..., 0, 1] + a[..., 1, 1] * b[..., 1, 1],
                ],
                axis=-1,
            ),
        ],
        axis=-2,
    )


def sym_matrix_pow(mat: jnp.ndarray, p: float, eps: float = 0.0) -> jnp.ndarray:
    """Real power of symmetric PSD (..., 2, 2) matrices via closed-form eigh."""
    vals, vecs = eigh2x2(mat)
    powed = jnp.power(jnp.maximum(vals, eps), p)
    # V diag(powed) V^T via explicit outer products (full f32 on the VPU).
    v1 = vecs[..., :, 0]
    v2 = vecs[..., :, 1]
    out1 = v1[..., :, None] * v1[..., None, :] * powed[..., 0, None, None]
    out2 = v2[..., :, None] * v2[..., None, :] * powed[..., 1, None, None]
    return out1 + out2


def cov2corr(cov: jnp.ndarray):
    """Covariance -> (correlation matrix, per-axis std). Batched over (..., 2, 2)."""
    std = jnp.sqrt(jnp.diagonal(cov, axis1=-2, axis2=-1))
    corr = cov / (std[..., :, None] * std[..., None, :])
    return corr, std


def rotation_matrix(theta: jnp.ndarray) -> jnp.ndarray:
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.stack(
        [jnp.stack([c, -s], axis=-1), jnp.stack([s, c], axis=-1)], axis=-2
    )


def rotate_cov(cov: jnp.ndarray, theta: jnp.ndarray) -> jnp.ndarray:
    """R(theta) @ cov @ R(theta)^T, batched."""
    rot = rotation_matrix(jnp.asarray(theta, dtype=cov.dtype))
    return mat2_mat(mat2_mat(rot, cov), jnp.swapaxes(rot, -1, -2))


def rotate_alpha(alpha: jnp.ndarray, theta: jnp.ndarray) -> jnp.ndarray:
    """R(theta) @ alpha for (..., 2) vectors."""
    rot = rotation_matrix(jnp.asarray(theta, dtype=alpha.dtype))
    return mat2_vec(rot, alpha)


def inv2x2(mat: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of (..., 2, 2) matrices."""
    a = mat[..., 0, 0]
    b = mat[..., 0, 1]
    c = mat[..., 1, 0]
    d = mat[..., 1, 1]
    det = a * d - b * c
    row0 = jnp.stack([d, -b], axis=-1)
    row1 = jnp.stack([-c, a], axis=-1)
    return jnp.stack([row0, row1], axis=-2) / det[..., None, None]


def det2x2(mat: jnp.ndarray) -> jnp.ndarray:
    return mat[..., 0, 0] * mat[..., 1, 1] - mat[..., 0, 1] * mat[..., 1, 0]


def chol2x2(mat: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Closed-form Cholesky factor (lower) of PSD (..., 2, 2) matrices."""
    a = jnp.maximum(mat[..., 0, 0], eps)
    b = mat[..., 1, 0]
    d = mat[..., 1, 1]
    l00 = jnp.sqrt(a)
    l10 = b / l00
    l11 = jnp.sqrt(jnp.maximum(d - l10 * l10, eps))
    zero = jnp.zeros_like(l00)
    row0 = jnp.stack([l00, zero], axis=-1)
    row1 = jnp.stack([l10, l11], axis=-1)
    return jnp.stack([row0, row1], axis=-2)
