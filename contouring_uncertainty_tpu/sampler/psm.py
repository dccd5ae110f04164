"""Posterior-shape-model contour sampler, vmapped on device.

Capability parity with the reference PosteriorShapeModelSampler
(sampler/posterior_shape_model/psm.py:23-440): coarse-to-fine sampling of
anatomically-plausible contours — initial landmarks drawn from the predicted
per-point distributions, then successive levels conditioned on everything
sampled so far through the PCA posterior shape model, fused with the
prediction by a Gaussian product, and the remaining points filled from the
posterior mean.

TPU-first redesign (SURVEY §2.6 #2): the reference loops
`for sample: for level: for point:` in Python with a fresh
`torch.linalg.eig` PCA re-fit per image. Here:
- the PCA re-fit appends one rank-1 column d to a fixed factor of cov0
  (prior.py:refit_d), so each level's solve is Sherman-Morrison over a
  STATIC f64-precomputed base inverse (prior.py:posterior_operator) — no
  per-prediction eigh and no Cholesky/solve custom calls anywhere in the
  sampler (round-3 trace: the batched LAPACK custom calls were 43% of the
  sequence predict step);
- level structure (point order, observation masks) is static, precomputed at
  construction;
- one sample is a fixed sequence of 3-4 masked rank-1-updated conditionals;
  samples and batch are vmapped, so the whole (N, T_e, T_a) population is
  one XLA computation.
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from contouring_uncertainty_tpu.distributions import bvn, bsn
from contouring_uncertainty_tpu.distributions.linalg import (
    inv2x2, mat2_mat, mat2_vec, sym_matrix_pow)
from contouring_uncertainty_tpu.sampler import prior as prior_lib
from contouring_uncertainty_tpu.sampler.prior import ShapePrior


def get_points_order(nb_points: int = 21, nb_initial_points: int = 3,
                     levels: Optional[int] = None) -> Tuple[List[int], List[List[int]]]:
    """Coarse-to-fine point ordering by recursive bisection
    (reference psm.py:43-71, rounding toward the base)."""
    initial_points = np.round(np.linspace(0, nb_points - 1, nb_initial_points)).astype(int).tolist()
    levels = levels or int(math.log(nb_points, 2))
    all_points: List[int] = list(initial_points)
    point_order: List[List[int]] = []
    for _ in range(levels):
        level_points = []
        for j in range(len(all_points) - 1):
            if all_points[j] + 1 != all_points[j + 1]:
                point = (all_points[j] + all_points[j + 1]) / 2
                point = math.ceil(point) if point > nb_points / 2 else math.floor(point)
                level_points.append(int(point))
        if not level_points:
            break
        all_points.extend(level_points)
        all_points.sort()
        point_order.append(level_points)
    return initial_points, point_order


def merge_priors(mu1, cov1, mu2, cov2):
    """Gaussian product fusion per point (reference psm.py:423-440).

    Sigma_f = S1 (S1+S2)^-1 S2 ;  mu_f = S1 (S1+S2)^-1 mu2 + S2 (S1+S2)^-1 mu1.
    All (..., 2, 2) / (..., 2) with closed-form 2x2 inverses.
    """
    inv_sum = inv2x2(cov1 + cov2)
    cov_f = mat2_mat(mat2_mat(cov1, inv_sum), cov2)
    mu_f = mat2_vec(mat2_mat(cov1, inv_sum), mu2) + mat2_vec(mat2_mat(cov2, inv_sum), mu1)
    return mu_f, cov_f


class PosteriorShapeModelSampler:
    """Vmapped PSM sampler. Construct once per prior; call per prediction."""

    def __init__(self, prior: ShapePrior, levels: int = 3,
                 sigmas: Tuple[float, ...] = (1.0, 1.0, 1.0, 1.0),
                 fill_sigma: float = 1e-3):
        self.prior = prior
        self.k = prior.dim // 2
        self.initial_points, self.points_order = get_points_order(self.k, levels=levels)
        self.sigmas = sigmas
        self.fill_sigma = fill_sigma

        # Static masks: coords observed *before* each level, and per-level point sets.
        sampled = list(self.initial_points)
        self._level_masks = []  # (P,) coordinate masks
        self._level_points = []  # (L_i,) point indices
        for points in self.points_order:
            mask = np.zeros(prior.dim, np.float32)
            for p in sorted(sampled):
                mask[2 * p:2 * p + 2] = 1.0
            self._level_masks.append(jnp.asarray(mask))
            self._level_points.append(jnp.asarray(np.array(points, np.int32)))
            sampled.extend(points)
        final_mask = np.zeros(prior.dim, np.float32)
        for p in sorted(sampled):
            final_mask[2 * p:2 * p + 2] = 1.0
        self._final_mask = jnp.asarray(final_mask)
        self._sampled_all = jnp.asarray(
            np.isin(np.arange(self.k), np.array(sorted(sampled))).astype(np.float32)
        )
        self._initial = jnp.asarray(np.array(self.initial_points, np.int32))
        # Fixed full-rank factor of cov0 for the factor-form posterior
        # (prior.py:cov_factor — Gram-PSD solves, no per-prediction eigh).
        self._f0 = prior_lib.cov_factor(prior)
        # Static Sherman-Morrison operators per level (+ fill): the refit
        # only adds a rank-1 column, so the solve system's base inverse is
        # precomputed here in f64 and the samplers run with ZERO
        # linear-algebra custom calls (prior.py:posterior_operator).
        f0_np = np.asarray(self._f0)
        self._ops = [
            prior_lib.posterior_operator(f0_np, np.asarray(m), s)
            for m, s in zip(self._level_masks, self.sigmas)
        ]
        self._op_final = prior_lib.posterior_operator(
            f0_np, np.asarray(self._final_mask), self.fill_sigma)

    # ------------------------------------------------------------------ sampling

    def _posterior_points(self, contour, op, mu_t, d):
        """Posterior (mu_c (K,2), cov_c (K,2,2)) in pixel space given the
        currently sampled contour (unsampled entries are zeros, masked out).
        `op` is the level's static Sherman-Morrison operator and `d` the
        per-prediction refit column (prior.refit_d) — no per-prediction eigh
        and no Cholesky custom calls anywhere."""
        s_g_t = prior_lib.transform(self.prior, contour).reshape(-1)
        mu_c_t, cov_c_t = prior_lib.posterior_shape_model_sm(s_g_t, mu_t, d, op)
        mu_c = prior_lib.inverse_transform(
            self.prior, mu_c_t.reshape(self.k, 2)
        )
        # Pixel-space covariance: diag(scale) cov diag(scale) (identity for the
        # shipped *_no_std priors where scale == 1; the reference multiplies
        # rows only, psm.py:277 — identical when scale is 1).
        scale = self.prior.train_scale
        cov_c_t = cov_c_t * scale[None, :] * scale[:, None]
        cov_c = prior_lib.diag_blocks_2x2(cov_c_t)
        # PD floor on the 2x2 blocks: the cov-form difference C - CMS^-1MC
        # cancels catastrophically in f32 when the prediction sits far from
        # the shape space (||d||^2 >> sigma^2 — untrained/OOD models), and a
        # slightly indefinite block NaNs the samplers downstream. Exact
        # no-op for healthy posteriors (eigenvalues already > 1e-6 px^2).
        cov_c = sym_matrix_pow(cov_c, 1.0, eps=1e-6)
        return mu_c, cov_c

    def _sample_one(self, key, mu_p, cov_p, alpha_p, mu_t, d):
        """One contour sample (K, 2). All shapes static."""
        keys = jax.random.split(key, len(self._level_points) + 1)
        contour = jnp.zeros_like(mu_p)

        # Initial points: independent draws from the predicted distributions
        # (skew-normal with y-flipped alpha when alpha is provided, psm.py:233-239).
        if alpha_p is None:
            s0 = bvn.rvs(keys[0], mu_p, cov_p)
        else:
            flipped = alpha_p * jnp.asarray([1.0, -1.0], alpha_p.dtype)
            s0 = bsn.rvs(keys[0], mu_p, cov_p, flipped)
        init_mask = jnp.zeros(self.k, bool).at[self._initial].set(True)
        contour = jnp.where(init_mask[:, None], s0, contour)

        for i, points in enumerate(self._level_points):
            mu_c, cov_c = self._posterior_points(
                contour, self._ops[i], mu_t, d
            )
            mu_f, cov_f = merge_priors(mu_p, cov_p, mu_c, cov_c)
            s = bvn.rvs(keys[i + 1], mu_f, cov_f)
            lvl_mask = jnp.zeros(self.k, bool).at[points].set(True)
            contour = jnp.where(lvl_mask[:, None], s, contour)

        # Fill the remaining points from the posterior mean (sigma2 -> 0).
        mu_c, _ = self._posterior_points(contour, self._op_final, mu_t, d)
        contour = jnp.where(self._sampled_all[:, None] > 0, contour, mu_c)
        return contour

    def __call__(self, key: jax.Array, mu: jnp.ndarray, cov: jnp.ndarray,
                 alpha: Optional[jnp.ndarray] = None, n: int = 1) -> jnp.ndarray:
        """Sample n contours for one prediction. mu (K,2), cov (K,2,2) -> (n,K,2)."""
        mu_t = prior_lib.transform(self.prior, mu).reshape(-1)
        d = prior_lib.refit_d(self.prior, mu_t)
        keys = jax.random.split(key, n)
        if alpha is None:
            fn = lambda k: self._sample_one(k, mu, cov, None, mu_t, d)
        else:
            fn = lambda k: self._sample_one(k, mu, cov, alpha, mu_t, d)
        return jax.vmap(fn)(keys)

    def sample_batch(self, key: jax.Array, mu: jnp.ndarray, cov: jnp.ndarray,
                     alpha: Optional[jnp.ndarray] = None, n: int = 1) -> jnp.ndarray:
        """Batched sampling: mu (..., K, 2), cov (..., K, 2, 2) -> (..., n, K, 2)."""
        lead = mu.shape[:-2]
        flat_mu = mu.reshape((-1,) + mu.shape[-2:])
        flat_cov = cov.reshape((-1,) + cov.shape[-3:])
        keys = jax.random.split(key, flat_mu.shape[0])
        if alpha is None:
            out = jax.vmap(lambda k, m, c: self(k, m, c, None, n))(keys, flat_mu, flat_cov)
        else:
            flat_alpha = alpha.reshape((-1,) + alpha.shape[-2:])
            out = jax.vmap(lambda k, m, c, a: self(k, m, c, a, n))(
                keys, flat_mu, flat_cov, flat_alpha
            )
        return out.reshape(lead + (n, self.k, 2))
