"""Sequence (ED<->ES) PSM samplers: couple a view's two instants through an
84-dim two-instant shape prior.

Capability parity with the reference SequencePSMSampler
(sampler/posterior_shape_model/sequence_sampler.py:13-144) and
SequenceSkewPSMSampler (psm_skew_sequence.py:21-96): per sample, a random
first instant is drawn with the single-instant (skew-)PSM sampler; the
84-dim sequence posterior conditioned on that contour yields a prior for the
second instant, fused with the prediction and sampled with the same
single-instant machinery.

Notes mirrored from the reference:
- the plain sequence sampler uses the *fixed* sequence prior (the per-
  prediction PCA re-fit is commented out at sequence_sampler.py:81-84);
- the skew variant *does* re-fit the sequence PCA around the prediction
  (psm_skew_sequence.py:68) and samples the second instant from the product
  of the predicted skew pdf and the sequence-posterior Gaussian on the grid.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from contouring_uncertainty_tpu.sampler import prior as prior_lib
from contouring_uncertainty_tpu.sampler.prior import ShapePrior
from contouring_uncertainty_tpu.sampler.psm import PosteriorShapeModelSampler, merge_priors
from contouring_uncertainty_tpu.sampler.psm_skew import SkewPosteriorShapeModelSampler


def _instant_masks(k: int):
    m0 = np.zeros(4 * k, np.float32)
    m0[: 2 * k] = 1.0
    m1 = np.zeros(4 * k, np.float32)
    m1[2 * k:] = 1.0
    return jnp.asarray(m0), jnp.asarray(m1)


class SequencePSMSampler(PosteriorShapeModelSampler):
    """Gaussian sequence sampler. mu (2, K, 2) per view."""

    def __init__(self, prior: ShapePrior, seq_prior: ShapePrior, levels: int = 3, **kw):
        super().__init__(prior, levels=levels, **kw)
        self.seq_prior = seq_prior
        self._mask0, self._mask1 = _instant_masks(self.k)
        # Static Sherman-Morrison operators for the two possible observation
        # masks (first instant = ED or ES); the skew variant's per-view refit
        # is the rank-1 d column (prior.py:posterior_operator — removes the
        # per-sample batched Cholesky custom calls that were 43% of the
        # sequence view step in the round-3 trace).
        base = np.asarray(self._seq_base_factor())
        self._seq_ops = (
            prior_lib.posterior_operator(base, np.asarray(self._mask0), 1.0),
            prior_lib.posterior_operator(base, np.asarray(self._mask1), 1.0),
        )

    def _seq_base_factor(self):
        """Fixed factor of the sequence prior's covariance: the PCA factor Q
        for the Gaussian variant (exactly the reference's Q-form posterior,
        Q Q^T = cov0)."""
        return self.seq_prior.q

    def _sequence_posterior(self, s_first, first_is_0, seq_mu_t, seq_d):
        """84-dim posterior conditioned on the first instant's contour.

        Returns per-instant (mu_c (2, K, 2), cov_c (2, K, 2, 2))."""
        k = self.k
        s_full = jnp.where(
            first_is_0,
            jnp.concatenate([s_first.reshape(-1), jnp.zeros(2 * k)]),
            jnp.concatenate([jnp.zeros(2 * k), s_first.reshape(-1)]),
        )
        s_t = (s_full - self.seq_prior.train_mean) / self.seq_prior.train_scale
        op = jax.tree.map(
            lambda a, b: jnp.where(first_is_0, a, b), *self._seq_ops
        )
        mu_c_t, cov_c_t = prior_lib.posterior_shape_model_sm(
            s_t, seq_mu_t, seq_d, op
        )
        mu_c = (mu_c_t * self.seq_prior.train_scale + self.seq_prior.train_mean).reshape(2, k, 2)
        scale = self.seq_prior.train_scale
        cov_c_t = cov_c_t * scale[None, :] * scale[:, None]
        # Same PD floor as PosteriorShapeModelSampler._posterior_points (the
        # f32 cov-form difference can leave slightly indefinite 2x2 blocks).
        from contouring_uncertainty_tpu.distributions.linalg import sym_matrix_pow

        cov_c = sym_matrix_pow(
            prior_lib.diag_blocks_2x2(cov_c_t), 1.0, eps=1e-6
        ).reshape(2, k, 2, 2)
        return mu_c, cov_c

    def _seq_params(self, mu):
        """Sequence-prior (mu_t, refit column d): d is None for the Gaussian
        variant (fixed prior — the reference comments out the re-fit,
        sequence_sampler.py:81-84)."""
        return self.seq_prior.mean_shape, None

    def _sample_pair(self, key, mu, cov, alpha, seq_mu_t, seq_f):
        """One (2, K, 2) sequence sample."""
        k_inst, k_first, k_second = jax.random.split(key, 3)
        first_is_0 = jax.random.bernoulli(k_inst)

        def one_instant(kk, m, c, a):
            mu_t = prior_lib.transform(self.prior, m).reshape(-1)
            return self._sample_one(kk, m, c, a, mu_t,
                                    prior_lib.refit_d(self.prior, mu_t))

        mu_first = jnp.where(first_is_0, mu[0], mu[1])
        cov_first = jnp.where(first_is_0, cov[0], cov[1])
        a_first = None if alpha is None else jnp.where(first_is_0, alpha[0], alpha[1])
        s_first = one_instant(k_first, mu_first, cov_first, a_first)

        mu_c, cov_c = self._sequence_posterior(s_first, first_is_0, seq_mu_t, seq_f)
        mu_f, cov_f = merge_priors(mu.reshape(-1, 2), cov.reshape(-1, 2, 2),
                                   mu_c.reshape(-1, 2), cov_c.reshape(-1, 2, 2))
        mu_f = mu_f.reshape(2, self.k, 2)
        cov_f = cov_f.reshape(2, self.k, 2, 2)

        mu_second = jnp.where(first_is_0, mu_f[1], mu_f[0])
        cov_second = jnp.where(first_is_0, cov_f[1], cov_f[0])
        a_second = None if alpha is None else jnp.where(first_is_0, alpha[1], alpha[0])
        s_second = one_instant(k_second, mu_second, cov_second, a_second)

        s0 = jnp.where(first_is_0, s_first, s_second)
        s1 = jnp.where(first_is_0, s_second, s_first)
        return jnp.stack([s0, s1])

    def __call__(self, key, mu, cov, alpha=None, n: int = 1):
        """mu (2, K, 2), cov (2, K, 2, 2) -> samples (n, 2, K, 2)."""
        seq_mu_t, seq_f = self._seq_params(mu)
        keys = jax.random.split(key, n)
        return jax.vmap(lambda k: self._sample_pair(k, mu, cov, alpha, seq_mu_t, seq_f))(keys)

    def sample_batch(self, key, mu, cov, alpha=None, n: int = 1):
        """Predictor layout: mu (N=2, T_e, K, 2) -> samples (2, T_e, n, K, 2),
        each epistemic forward's ED/ES pair sampled jointly."""
        return _sequence_sample_batch(self, key, mu, cov, alpha, n)


class SequenceSkewPSMSampler(SequencePSMSampler):
    """Skew sequence sampler: skew single-instant sampling + per-prediction
    sequence-PCA re-fit."""

    def __init__(self, prior: ShapePrior, seq_prior: ShapePrior, levels: int = 3,
                 skew_indices: Optional[List[int]] = None, **skew_kw):
        super().__init__(prior, seq_prior, levels=levels)
        self._skew = SkewPosteriorShapeModelSampler(prior, levels=levels,
                                                    skew_indices=skew_indices, **skew_kw)

    def _seq_base_factor(self):
        """Floored full-rank factor of the sequence prior's cov0: the skew
        variant re-fits the sequence PCA around the prediction
        (psm_skew_sequence.py:68) — the refit is the rank-1 d column from
        _seq_params on top of this fixed factor."""
        return prior_lib.cov_factor(self.seq_prior)

    def _seq_params(self, mu):
        seq_pred_t = (
            (mu.reshape(-1) - self.seq_prior.train_mean) / self.seq_prior.train_scale
        )
        return seq_pred_t, prior_lib.refit_d(self.seq_prior, seq_pred_t)

    def _sample_pair(self, key, mu, cov, alpha, seq_mu_t, seq_f):
        k_inst, k_first, k_second = jax.random.split(key, 3)
        first_is_0 = jax.random.bernoulli(k_inst)

        def one_instant(kk, m, c, a):
            return self._skew(kk, m, c, a, n=1)[0]

        mu_first = jnp.where(first_is_0, mu[0], mu[1])
        cov_first = jnp.where(first_is_0, cov[0], cov[1])
        a_first = jnp.where(first_is_0, alpha[0], alpha[1])
        s_first = one_instant(k_first, mu_first, cov_first, a_first)

        mu_c, cov_c = self._sequence_posterior(s_first, first_is_0, seq_mu_t, seq_f)
        mu_f, cov_f = merge_priors(mu.reshape(-1, 2), cov.reshape(-1, 2, 2),
                                   mu_c.reshape(-1, 2), cov_c.reshape(-1, 2, 2))
        mu_f = mu_f.reshape(2, self.k, 2)
        cov_f = cov_f.reshape(2, self.k, 2, 2)

        mu_second = jnp.where(first_is_0, mu_f[1], mu_f[0])
        cov_second = jnp.where(first_is_0, cov_f[1], cov_f[0])
        a_second = jnp.where(first_is_0, alpha[1], alpha[0])
        s_second = one_instant(k_second, mu_second, cov_second, a_second)

        s0 = jnp.where(first_is_0, s_first, s_second)
        s1 = jnp.where(first_is_0, s_second, s_first)
        return jnp.stack([s0, s1])


def _sequence_sample_batch(sampler, key, mu, cov, alpha=None, n: int = 1):
    """Shared implementation of SequencePSMSampler.sample_batch."""
    assert mu.shape[0] == 2, "sequence sampling expects an (ED, ES) view"
    t_e = mu.shape[1]
    keys = jax.random.split(key, t_e)

    def one_te(k, m, c, a):
        return sampler(k, m, c, a, n)  # (n, 2, K, 2)

    if alpha is None:
        out = jax.vmap(lambda k, m, c: one_te(k, m, c, None))(
            keys, jnp.swapaxes(mu, 0, 1), jnp.swapaxes(cov, 0, 1)
        )
    else:
        out = jax.vmap(one_te)(
            keys, jnp.swapaxes(mu, 0, 1), jnp.swapaxes(cov, 0, 1),
            jnp.swapaxes(alpha, 0, 1)
        )
    # (T_e, n, 2, K, 2) -> (2, T_e, n, K, 2)
    return jnp.transpose(out, (2, 0, 1, 3, 4))



