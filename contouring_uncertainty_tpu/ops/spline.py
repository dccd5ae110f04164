"""Interpolating parametric cubic splines on device.

Capability parity with the reference's scipy `splprep(k=3, s=0)` usage
(contour_uncertainty/utils/contour.py:9-25, utils/uncertainty_projection.py:32-38):
a chord-length-parameterized, not-a-knot C^2 cubic through the K landmarks —
which is exactly what FITPACK produces for s=0 (it drops the first/last
interior knots). Redesigned for TPU: the K x K tridiagonal-ish system is
solved as one small batched dense solve, and evaluation at S parameters is a
vectorized searchsorted + Horner step that vmaps over (batch, samples).

All functions are jit/vmap-safe with static shapes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def chord_length_params(points: jnp.ndarray) -> jnp.ndarray:
    """Normalized cumulative chord-length parameter u in [0, 1]. points: (K, 2)."""
    seg = jnp.linalg.norm(jnp.diff(points, axis=0), axis=-1)
    u = jnp.concatenate([jnp.zeros((1,), points.dtype), jnp.cumsum(seg)])
    return u / u[-1]


def _not_a_knot_system(u: jnp.ndarray, y: jnp.ndarray):
    """Build the (K, K) not-a-knot system for second derivatives M of y(u).

    Rows 1..K-2 are the C^2 continuity equations; rows 0 and K-1 impose
    third-derivative continuity at the second and second-to-last nodes.
    """
    k = u.shape[0]
    h = jnp.diff(u)  # (K-1,)
    d = jnp.diff(y) / h  # slopes, (K-1,)

    mat = jnp.zeros((k, k), u.dtype)
    rhs = jnp.zeros((k,), u.dtype)

    idx = jnp.arange(1, k - 1)
    mat = mat.at[idx, idx - 1].set(h[:-1] / 6.0)
    mat = mat.at[idx, idx].set((h[:-1] + h[1:]) / 3.0)
    mat = mat.at[idx, idx + 1].set(h[1:] / 6.0)
    rhs = rhs.at[idx].set(d[1:] - d[:-1])

    # Not-a-knot: (M1 - M0)/h0 = (M2 - M1)/h1 and symmetric at the far end.
    mat = mat.at[0, 0].set(1.0 / h[0])
    mat = mat.at[0, 1].set(-(1.0 / h[0] + 1.0 / h[1]))
    mat = mat.at[0, 2].set(1.0 / h[1])
    mat = mat.at[k - 1, k - 3].set(1.0 / h[-2])
    mat = mat.at[k - 1, k - 2].set(-(1.0 / h[-2] + 1.0 / h[-1]))
    mat = mat.at[k - 1, k - 1].set(1.0 / h[-1])
    return mat, rhs


def _banded_spline_solve(u: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Solve the not-a-knot second-derivative system by banded elimination.

    The K x K system built by `_not_a_knot_system` is tridiagonal except for
    one extra superdiagonal entry in row 0 and one extra subdiagonal entry in
    row K-1 (the third-derivative-continuity end conditions). Dense
    `jnp.linalg.solve` lowers to a pivoted-LU custom call that dominated the
    uncertainty-propagation profile (LuDecompositionBlock, 7.4 ms of the
    68 ms view step for the 1000 batched 21x21 solves — trace r3); this
    unrolled K-step elimination is a few elementwise ops per step, vmaps
    cleanly, and costs ~nothing. No pivoting: after folding the row-0
    not-a-knot condition into row 1, the remaining system is the standard
    strictly-diagonally-dominant spline tridiagonal (h/6, (h+h')/3, h'/6),
    for which Gaussian elimination without pivoting is stable. y: (K,) or
    (K, D) -> second derivatives, same shape.
    """
    k = u.shape[0]
    h = jnp.diff(u)
    d = (jnp.diff(y, axis=0).T / h).T  # slopes, (K-1, ...) per component

    # Row i (1 <= i <= K-2): h[i-1]/6 M[i-1] + (h[i-1]+h[i])/3 M[i]
    #                        + h[i]/6 M[i+1] = d[i] - d[i-1]
    # Row 0:  M0/h0 - (1/h0 + 1/h1) M1 + M2/h1 = 0
    # Row K-1: M[K-3]/h[K-3+?]... symmetric at the far end.
    lower = h[:-1] / 6.0  # coeff of M[i-1] in row i, i = 1..K-2
    diag = (h[:-1] + h[1:]) / 3.0
    upper = h[1:] / 6.0
    rhs = d[1:] - d[:-1]  # (K-2, ...)

    # Eliminate M0 from row 1 using row 0:
    #   M0 = (1 + h0/h1) M1 - (h0/h1) M2
    r01 = h[0] / h[1]
    diag1 = diag[0] + lower[0] * (1.0 + r01)
    upper1 = upper[0] - lower[0] * r01
    # Eliminate M[K-1] from row K-2 using row K-1:
    #   M[K-1] = (1 + h[-1]/h[-2]) M[K-2] - (h[-1]/h[-2]) M[K-3]
    rKK = h[-1] / h[-2]
    diagL = diag[-1] + upper[-1] * (1.0 + rKK)
    lowerL = lower[-1] - upper[-1] * rKK

    n = k - 2  # interior unknowns M1..M[K-2]
    dia = [None] * n
    upp = [None] * n
    low = [None] * n
    for i in range(n):
        dia[i] = diag[i]
        upp[i] = upper[i] if i < n - 1 else None
        low[i] = lower[i] if i > 0 else None
    dia[0], dia[-1] = diag1, diagL
    if n > 1:
        upp[0] = upper1
        low[-1] = lowerL

    # Forward elimination (unrolled Thomas; K is small and static).
    cp = [None] * n  # modified upper
    dp = [None] * n  # modified rhs
    cp[0] = (upp[0] / dia[0]) if n > 1 else None
    dp[0] = (rhs[0].T / dia[0]).T
    for i in range(1, n):
        denom = dia[i] - low[i] * cp[i - 1]
        if i < n - 1:
            cp[i] = upp[i] / denom
        dp[i] = ((rhs[i] - low[i] * dp[i - 1]).T / denom).T
    # Back substitution.
    m_int = [None] * n
    m_int[-1] = dp[-1]
    for i in range(n - 2, -1, -1):
        m_int[i] = dp[i] - (m_int[i + 1].T * cp[i]).T
    m1, m2 = m_int[0], m_int[1]
    mK2, mK3 = m_int[-1], m_int[-2]
    m0 = (1.0 + r01) * m1 - r01 * m2
    mK1 = (1.0 + rKK) * mK2 - rKK * mK3
    return jnp.stack([m0] + m_int + [mK1], axis=0)


def spline_fit(points: jnp.ndarray):
    """Fit x(u), y(u) not-a-knot cubics through (K, 2) landmarks.

    Returns (u_knots (K,), points (K, 2), second_derivs (K, 2)).
    """
    u = chord_length_params(points)
    if points.shape[0] >= 5:
        m = _banded_spline_solve(u, points)  # (K, 2)
    else:  # tiny-K fallback: dense solve (the banded end-condition folding
        # needs >= 3 interior unknowns)
        mats_rhs = [_not_a_knot_system(u, points[:, i]) for i in range(2)]
        mat = jnp.stack([m_ for m_, _ in mats_rhs])
        rhs = jnp.stack([r for _, r in mats_rhs])
        m = jnp.linalg.solve(mat, rhs[..., None])[..., 0].T
    return u, points, m


def spline_eval(u_knots, points, m, t, derivative: int = 0):
    """Evaluate the fitted spline (or its derivative) at parameters t (S,).

    Segment lookup is a one-hot (S, K-1) selection matmul rather than
    searchsorted + dynamic gathers: six gathers per eval point made dense
    rasterization gather-bound on TPU (measured 54 -> 7 ms for 500 splines
    at 1024 points each on v5e); the tiny matmuls are effectively free.

    Returns (S, 2).
    """
    k = u_knots.shape[0]
    # clamp into [u_0, u_{K-1}) for segment selection only (same semantics
    # as the clipped searchsorted index); arithmetic uses the raw t.
    t_cl = jnp.clip(t, u_knots[0], u_knots[-1] - 1e-6)
    sel = (
        (t_cl[:, None] >= u_knots[None, :-1]) & (t_cl[:, None] < u_knots[None, 1:])
    ).astype(u_knots.dtype)  # (S, K-1) one-hot over segments
    # HIGHEST precision: these are exact selections of pixel-space values —
    # the TPU's default bf16 matmul passes would round control points by up
    # to ~0.5 px (CLAUDE.md: tiny linalg never at default precision).
    hp = partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)
    u0 = hp(sel, u_knots[:-1])
    u1 = hp(sel, u_knots[1:])
    h = u1 - u0
    a = (u1 - t) / h
    b = (t - u0) / h
    y0 = hp(sel, points[:-1])  # (S, 2)
    y1 = hp(sel, points[1:])
    m0 = hp(sel, m[:-1])
    m1 = hp(sel, m[1:])
    h_ = h[:, None]
    a_ = a[:, None]
    b_ = b[:, None]
    if derivative == 0:
        return (
            a_ * y0
            + b_ * y1
            + ((a_ ** 3 - a_) * m0 + (b_ ** 3 - b_) * m1) * h_ ** 2 / 6.0
        )
    if derivative == 1:
        return (
            (y1 - y0) / h_
            + (-(3.0 * a_ ** 2 - 1.0) * m0 + (3.0 * b_ ** 2 - 1.0) * m1) * h_ / 6.0
        )
    raise ValueError(f"derivative={derivative} not supported")


@partial(jax.jit, static_argnames=("n", "close"))
def contour_spline(points: jnp.ndarray, n: int = 1001, close: bool = False) -> jnp.ndarray:
    """Dense resampling of the interpolating spline at n uniform parameters.

    Mirrors reference utils/contour.py:9-25 (which appends the first point
    when `close`). points: (K, 2) -> (n [+1], 2).
    """
    u, p, m = spline_fit(points)
    t = jnp.linspace(0.0, 1.0, n, dtype=points.dtype)
    dense = spline_eval(u, p, m, t)
    if close:
        dense = jnp.concatenate([dense, dense[:1]], axis=0)
    return dense


@partial(jax.jit, static_argnames=("n",))
def contour_tangents(points: jnp.ndarray, n: int = 1000):
    """Unit tangent of the spline at each landmark's parameter value.

    Used by the uncertainty projection (reference
    utils/uncertainty_projection.py:32-50, which looks up the nearest of n
    uniform parameter samples rather than evaluating at u exactly — we
    evaluate the derivative at the landmark parameters directly).

    Returns (K, 2) unit tangents.
    """
    u, p, m = spline_fit(points)
    der = spline_eval(u, p, m, u, derivative=1)
    return der / jnp.linalg.norm(der, axis=-1, keepdims=True)
