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
