"""PCA shape priors: loading, fitting, and the posterior-shape-model math.

Capability parity with the reference
(sampler/posterior_shape_model/posteriorshapemodel.py:9-81 and the prior
`.npy` artifacts): a PCA over flattened training contours (2K-dim), the
per-prediction re-fit around a new mean, and the masked conditional
(posterior shape model) distribution.

TPU-first: the train covariance is precomputed once so the per-prediction
re-fit is a rank-1 update + one small symmetric eigh (the reference re-runs
torch.linalg.eig over the full X_train for every image — psm.py:91);
the conditional solve is a Cholesky solve of a (2K, 2K) system, batched over
(batch, samples) with vmap.
"""

from __future__ import annotations

from pathlib import Path
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class ShapePrior(NamedTuple):
    """Static prior data (host -> device constants)."""

    mean_shape: jnp.ndarray  # (P,) PCA mean of training shapes (transformed space)
    train_mean: jnp.ndarray  # (P,) scaler mean
    train_scale: jnp.ndarray  # (P,) scaler scale
    x_train_mean: jnp.ndarray  # (P,) mean of X_train (transformed)
    cov0: jnp.ndarray  # (P, P) centered covariance of X_train (transformed)
    q: jnp.ndarray  # (P, P) default Q = U sqrt(D) around x_train_mean

    @property
    def dim(self) -> int:
        return self.mean_shape.shape[0]


def transform(prior: ShapePrior, s: jnp.ndarray) -> jnp.ndarray:
    """Scaler transform (s - mean) / scale over the flattened last axes."""
    shape = s.shape
    flat = (s.reshape(*shape[:-2], -1) - prior.train_mean) / prior.train_scale
    return flat.reshape(shape)


def inverse_transform(prior: ShapePrior, s: jnp.ndarray) -> jnp.ndarray:
    shape = s.shape
    flat = s.reshape(*shape[:-2], -1) * prior.train_scale + prior.train_mean
    return flat.reshape(shape)


def _q_from_cov(cov: jnp.ndarray) -> jnp.ndarray:
    """Q = U diag(sqrt(|lambda|)) with eigenvalues sorted descending."""
    vals, vecs = jnp.linalg.eigh(cov)
    vals = jnp.abs(vals)[..., ::-1]
    vecs = vecs[..., ::-1]
    return vecs * jnp.sqrt(vals)[..., None, :]


def fit_shape_prior(contours: np.ndarray, with_std: bool = False) -> ShapePrior:
    """Fit a prior from training contours (N, K, 2) — the offline generator
    (reference psm.py:453-554 __main__)."""
    x = contours.reshape(len(contours), -1).astype(np.float64)
    mean = x.mean(0)
    scale = x.std(0) if with_std else np.ones_like(mean)
    xt = (x - mean) / scale
    x_mean = xt.mean(0)
    diff = xt - x_mean
    cov0 = diff.T @ diff / len(xt)
    q = np.asarray(_q_from_cov(jnp.asarray(cov0)))
    return ShapePrior(
        mean_shape=jnp.asarray(x_mean, jnp.float32),
        train_mean=jnp.asarray(mean, jnp.float32),
        train_scale=jnp.asarray(scale, jnp.float32),
        x_train_mean=jnp.asarray(x_mean, jnp.float32),
        cov0=jnp.asarray(cov0, jnp.float32),
        q=jnp.asarray(q, jnp.float32),
    )


def save_prior(path: Path, prior: ShapePrior):
    np.savez(path, **{k: np.asarray(v) for k, v in prior._asdict().items()})


def load_prior(path: Path) -> ShapePrior:
    """Load either our .npz format or the reference .npy dict format
    (mu/Q/scaler_mean/scaler_scale/X_train)."""
    path = Path(path)
    if path.suffix == ".npy":
        data = np.load(path, allow_pickle=True).item()
        x_train = np.asarray(data["X_train"], np.float64)
        mean = np.asarray(data["scaler_mean"], np.float64).reshape(-1)
        scale = np.asarray(data["scaler_scale"], np.float64).reshape(-1)
        xt = (x_train - mean) / scale
        x_mean = xt.mean(0)
        diff = xt - x_mean
        cov0 = diff.T @ diff / len(xt)
        return ShapePrior(
            mean_shape=jnp.asarray(x_mean, jnp.float32),
            train_mean=jnp.asarray(mean, jnp.float32),
            train_scale=jnp.asarray(scale, jnp.float32),
            x_train_mean=jnp.asarray(x_mean, jnp.float32),
            cov0=jnp.asarray(cov0, jnp.float32),
            q=jnp.asarray(data["Q"], jnp.float32),
        )
    data = np.load(path)
    return ShapePrior(**{k: jnp.asarray(data[k]) for k in ShapePrior._fields})


def refit_q(prior: ShapePrior, pred_flat_t: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-prediction PCA re-fit around the (transformed) predicted shape.

    E[(x - m)(x - m)^T] = Cov0 + (xbar - m)(xbar - m)^T  — a rank-1 update of
    the fixed train covariance (reference recomputes the full PCA per image,
    posteriorshapemodel.py:9-46).

    Returns (mu (P,), Q (P, P)).
    """
    d = prior.x_train_mean - pred_flat_t
    cov = prior.cov0 + d[:, None] * d[None, :]
    return pred_flat_t, _q_from_cov(cov)


def cov_factor(prior: ShapePrior, floor: float = 1e-7) -> jnp.ndarray:
    """One-time full-rank factor F0 with F0 F0^T = cov0 (host-side f64 eigh
    with trace-scaled eigenvalue floor — cov0 is stored f32, so its rounding
    leaves eigenvalues ~ -tr*1e-7 that break a plain Cholesky, and
    empirically-singular priors, e.g. a sequence prior fitted from fewer
    pairs than dimensions, are exactly rank-deficient).

    Used by the samplers' factor-form posterior: refitting around a
    prediction appends the single column d = x_train_mean - pred to F0
    (C = F0 F0^T + d d^T = [F0|d][F0|d]^T), so the conditional system stays
    a numerically-PSD Gram *and* needs no per-prediction eigh. (An explicit
    cov form — Cholesky of sigma2 I + M C M with C formed as cov0 + d d^T —
    was built first and removed, git history r3: C's f32 eigenvalue noise
    (~||C|| eps K) exceeds the fill-step sigma2=1e-3 once ||d|| is large
    (untrained/OOD predictions), NaN-ing the solve — caught by the round-3
    TPU verify drive.)
    """
    c0 = np.asarray(prior.cov0, np.float64)
    p = c0.shape[0]
    tr = max(float(np.trace(c0)) / p, 1.0)
    vals, vecs = np.linalg.eigh(c0)
    f0 = vecs * np.sqrt(np.maximum(vals, floor * tr))
    return jnp.asarray(f0, jnp.float32)


def refit_factor(prior: ShapePrior, f0: jnp.ndarray,
                 pred_flat_t: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Factor-form per-prediction re-fit: (mu (P,), F (P, P+1)) with
    F F^T = Cov0 + d d^T (see cov_factor)."""
    d = prior.x_train_mean - pred_flat_t
    return pred_flat_t, jnp.concatenate([f0, d[:, None]], axis=1)


def posterior_shape_model_factor(
    s_g_t: jnp.ndarray,
    g_mask: jnp.ndarray,
    mu_t: jnp.ndarray,
    f: jnp.ndarray,
    sigma2: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Masked conditional shape distribution from a covariance factor
    C = F F^T (F (P, R), any R — the fixed prior's Q, or [F0|d] from
    refit_factor).

    Push-through/Woodbury on C = F F^T (same math as `posterior_shape_model`
    below, reference posteriorshapemodel.py:49-81):

        S     = sigma2 I + (M F)(M F)^T     (symmetric PD)
        mu_c  = mu + C M S^-1 (s_g - mu)_g
        cov_c = C - C M S^-1 M C

    The solve system S is a GRAM matrix — numerically PSD in f32
    regardless of conditioning, like the reference's Q-form A = Q_g^T Q_g
    + sigma2 I — while still needing no eigendecomposition anywhere. The
    (P, P) solves are sample-independent, so they hoist out of the
    T_a-sample vmap (only the mu_c matvec is per-sample).
    """
    p = mu_t.shape[0]
    fg = f * g_mask[:, None]  # M F
    mc = fg @ f.T  # M C  (P, P)
    eye = jnp.eye(p, dtype=f.dtype)
    s = sigma2 * eye + fg @ fg.T
    # Escalating-jitter Cholesky: with the fill-step sigma2=1e-3 the system's
    # condition number can exceed f32's ~1/eps Cholesky breakdown threshold
    # (measured cond ~1e8 for an untrained model's re-fit: the Gram's own
    # rounding ~||F||^2 eps eats the regularization), and jax's f32
    # cho_factor then returns NaN even though S is PD in exact arithmetic.
    # Factor at sigma2 first and fall back to trace-scaled jitters only when
    # that factorization actually NaN'd — bit-identical for healthy inputs,
    # and the extra 42x42 factorizations are noise next to the solve itself.
    tr_mean = jnp.trace(s) / p
    chol0, _ = jax.scipy.linalg.cho_factor(s)
    chol1, _ = jax.scipy.linalg.cho_factor(s + (1e-5 * tr_mean) * eye)
    chol2, _ = jax.scipy.linalg.cho_factor(s + (1e-3 * tr_mean) * eye)
    ok0 = jnp.isfinite(chol0).all()
    ok1 = jnp.isfinite(chol1).all()
    chol = jnp.where(ok0, chol0, jnp.where(ok1, chol1, chol2))
    half = jax.scipy.linalg.cho_solve((chol, False), mc)  # S^-1 M C
    resid = (s_g_t - mu_t) * g_mask
    mu_c = mu_t + half.T @ resid
    cov_c = f @ f.T - half.T @ mc
    return mu_c, cov_c


class PosteriorOperator(NamedTuple):
    """Static per-(mask, sigma2) precompute for the Sherman-Morrison
    posterior (posterior_shape_model_sm). All (P, P), f32 on device, built
    once on host in f64 by `posterior_operator`."""

    g_mask: jnp.ndarray  # (P,) observation mask M (diag)
    k0: jnp.ndarray  # inv(sigma2 I + (M F0)(M F0)^T)  — exact f64 inverse
    mc0: jnp.ndarray  # M C0
    h0: jnp.ndarray  # K0 (M C0)
    c0: jnp.ndarray  # F0 F0^T


def posterior_operator(f0, g_mask, sigma2: float) -> PosteriorOperator:
    """Host-side f64 precompute of the static part of the masked-conditional
    solve for a FIXED factor f0 and observation mask.

    The per-prediction refit appends one column d to f0 (refit_factor), so
    the solve system is S = S0 + (M d)(M d)^T with S0 = sigma2 I +
    (M F0)(M F0)^T **static** — invert S0 once in f64 here and apply
    Sherman-Morrison per prediction/sample (posterior_shape_model_sm). This
    removes every per-sample Cholesky/triangular-solve custom call from the
    sampler hot paths (round-3 trace: 60 batched LAPACK custom calls = 42
    ms/view, 43% of the sequence predict step). It also needs no escalating
    jitter: there is no f32 factorization left to break — S0's inverse is
    exact, and the rank-1 update divides by beta = 1 + u^T K0 u >= 1.
    """
    f0 = np.asarray(f0, np.float64)
    m = np.asarray(g_mask, np.float64)
    p = f0.shape[0]
    c0 = f0 @ f0.T
    fg = f0 * m[:, None]
    s0 = float(sigma2) * np.eye(p) + fg @ fg.T
    k0 = np.linalg.inv(s0)
    mc0 = c0 * m[:, None]
    h0 = k0 @ mc0
    return PosteriorOperator(
        g_mask=jnp.asarray(m, jnp.float32),
        k0=jnp.asarray(k0, jnp.float32),
        mc0=jnp.asarray(mc0, jnp.float32),
        h0=jnp.asarray(h0, jnp.float32),
        c0=jnp.asarray(c0, jnp.float32),
    )


def _hp(a, b):
    """Small-matrix product at HIGHEST precision: the posterior difference
    C - (MC)^T S^-1 (MC) cancels catastrophically for OOD predictions, and
    TPU default-precision f32 matmuls run bf16 passes (CLAUDE.md trap)."""
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


def posterior_shape_model_sm(
    s_g_t: jnp.ndarray,
    mu_t: jnp.ndarray,
    d: Optional[jnp.ndarray],
    op: PosteriorOperator,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Masked conditional shape distribution via Sherman-Morrison on the
    static operator `op` (posterior_operator) — algebraically identical to
    posterior_shape_model_factor with f = [F0|d] (equivalence asserted in
    tests/test_sampler.py), but with zero linear-algebra custom calls:

        S     = S0 + u u^T,  u = M d
        S^-1  = K0 - (K0 u)(K0 u)^T / (1 + u^T K0 u)
        mu_c  = mu + (M C)^T S^-1 (s_g - mu)_g,   M C = M C0 + u d^T
        cov_c = C - (M C)^T S^-1 (M C),           C = C0 + d d^T

    `d = None` means no refit column (fixed-prior posterior, e.g. the plain
    sequence sampler's Q-form).

    Accuracy contract (tests/test_sampler.py SM test): mu_c matches the f32
    factor form at every sigma (and beats it by ~4 orders of magnitude when
    d is None — the base inverse is f64-exact where the f32 Cholesky at
    cond ~1e6 loses digits). cov_c is accurate at the level sigmas (~1.0)
    but degrades by ~beta = 1 + u^T K0 u ULPs of cancellation at the tiny
    fill sigma when d is present — every sampler consumes only mu_c from
    the fill step, so keep it that way.
    """
    resid = (s_g_t - mu_t) * op.g_mask
    if d is None:
        mu_c = mu_t + _hp(op.h0.T, resid)
        cov_c = op.c0 - _hp(op.mc0.T, op.h0)
        return mu_c, cov_c
    u = op.g_mask * d
    v = _hp(op.k0, u)
    beta = 1.0 + jnp.sum(u * v)
    sinv = op.k0 - v[:, None] * v[None, :] / beta
    mc = op.mc0 + u[:, None] * d[None, :]
    half = _hp(sinv, mc)  # S^-1 (M C)
    mu_c = mu_t + _hp(half.T, resid)
    cov_c = op.c0 + d[:, None] * d[None, :] - _hp(mc.T, half)
    return mu_c, cov_c


def refit_d(prior: ShapePrior, pred_flat_t: jnp.ndarray) -> jnp.ndarray:
    """The per-prediction refit column d with C = Cov0 + d d^T (the vector
    refit_factor appends to F0)."""
    return prior.x_train_mean - pred_flat_t


def posterior_shape_model(
    s_g_t: jnp.ndarray,
    g_mask: jnp.ndarray,
    mu_t: jnp.ndarray,
    q: jnp.ndarray,
    sigma2: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Masked conditional (posterior) shape distribution.

    Args:
        s_g_t: (P,) observed (partial) shape in transformed space.
        g_mask: (P,) {0,1} mask of observed coordinates (static per level).
        mu_t: (P,) prior mean (transformed).
        q: (P, P) PCA factor.
        sigma2: slack noise.

    Returns:
        mu_c (P,), cov_c (P, P)  (both transformed space), following
        posteriorshapemodel.py:49-81:
            A = Q_g^T Q_g + sigma2 I
            mu_c = mu + Q A^-1 Q_g^T (s_g - mu_g)
            cov_c = sigma2 Q A^-1 Q^T
    """
    p = mu_t.shape[0]
    q_g = q * g_mask[:, None]
    a = q_g.T @ q_g + sigma2 * jnp.eye(p, dtype=q.dtype)
    chol = jax.scipy.linalg.cho_factor(a)
    resid = (s_g_t - mu_t) * g_mask
    # Associate the solve with the SAMPLE-INDEPENDENT operands: under the
    # (T_a-sample) vmap everything except `resid` is unbatched, so computing
    # the (P, P) posterior operator q A^-1 Q_g^T first lets XLA hoist the
    # triangular solves out of the sample loop entirely — per sample only a
    # matvec remains (sequential 42x42 tri-solves per sample were the PSM
    # pipeline's dominant cost on TPU).
    proj = q @ jax.scipy.linalg.cho_solve(chol, q_g.T)  # (P, P), unbatched
    mu_c = mu_t + proj @ resid
    cov_c = sigma2 * q @ jax.scipy.linalg.cho_solve(chol, q.T)
    return mu_c, cov_c


def diag_blocks_2x2(cov: jnp.ndarray) -> jnp.ndarray:
    """Extract per-point 2x2 diagonal blocks from a (2K, 2K) covariance."""
    p = cov.shape[-1]
    k = p // 2
    idx = jnp.arange(k) * 2
    b00 = cov[idx, idx]
    b01 = cov[idx, idx + 1]
    b10 = cov[idx + 1, idx]
    b11 = cov[idx + 1, idx + 1]
    row0 = jnp.stack([b00, b01], axis=-1)
    row1 = jnp.stack([b10, b11], axis=-1)
    return jnp.stack([row0, row1], axis=-2)
