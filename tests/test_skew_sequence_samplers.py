"""Skew PSM (grid-product) and sequence PSM samplers."""

import numpy as np
import jax
import jax.numpy as jnp

from contouring_uncertainty_tpu.sampler import fit_shape_prior
from contouring_uncertainty_tpu.sampler.psm_skew import SkewPosteriorShapeModelSampler
from contouring_uncertainty_tpu.sampler.sequence import (
    SequencePSMSampler,
    SequenceSkewPSMSampler,
)


def _train_contours(n=200, k=21, seed=0, size=256):
    from contouring_uncertainty_tpu.data.synthetic import lv_contour_points

    rng = np.random.default_rng(seed)
    return np.stack([lv_contour_points(rng, k=k, size=size) for _ in range(n)])


def _pairs(n=150, seed=1):
    """Fake ED/ES pairs: ES is the ED contour shrunk toward its centroid."""
    ed = _train_contours(n, seed=seed)
    center = ed.mean(axis=1, keepdims=True)
    es = center + (ed - center) * 0.8
    return ed, es


def test_skew_psm_sampler_runs_and_respects_skew():
    contours = _train_contours()
    prior = fit_shape_prior(contours)
    sampler = SkewPosteriorShapeModelSampler(prior, grid_size=128)
    mu = jnp.asarray(contours[3], jnp.float32)
    cov = jnp.tile(jnp.eye(2) * 16.0, (21, 1, 1))
    alpha = jnp.ones((21, 2)) * jnp.asarray([4.0, 0.0])

    samples = np.asarray(sampler(jax.random.key(0), mu, cov, alpha, n=150))
    assert samples.shape == (150, 21, 2)
    assert np.isfinite(samples).all()
    # Strong +x skew on the freely-sampled initial points biases them right of mu.
    dx = samples[:, 0, 0] - float(mu[0, 0])
    assert dx.mean() > 0.5, f"mean initial-point dx {dx.mean()}"
    # Population stays near the prediction overall.
    assert np.linalg.norm(samples.mean(0) - np.asarray(mu), axis=-1).mean() < 8.0


def test_skew_psm_mixed_indices():
    contours = _train_contours()
    prior = fit_shape_prior(contours)
    sampler = SkewPosteriorShapeModelSampler(prior, skew_indices=[0, 10, 20], grid_size=64)
    mu = jnp.asarray(contours[0], jnp.float32)
    cov = jnp.tile(jnp.eye(2) * 9.0, (21, 1, 1))
    alpha = jnp.zeros((21, 2)).at[jnp.asarray([0, 10, 20])].set(jnp.asarray([3.0, 1.0]))
    samples = np.asarray(sampler(jax.random.key(1), mu, cov, alpha, n=20))
    assert samples.shape == (20, 21, 2) and np.isfinite(samples).all()


def test_sequence_sampler_couples_instants():
    ed, es = _pairs()
    prior = fit_shape_prior(np.concatenate([ed, es]))
    seq = np.concatenate([ed.reshape(len(ed), -1), es.reshape(len(es), -1)], axis=1)
    seq_prior = fit_shape_prior(seq.reshape(len(seq), -1, 2))
    sampler = SequencePSMSampler(prior, seq_prior)

    mu = jnp.asarray(np.stack([ed[7], es[7]]), jnp.float32)  # (2, K, 2)
    cov = jnp.tile(jnp.eye(2) * 9.0, (2, 21, 1, 1))
    samples = np.asarray(sampler(jax.random.key(2), mu, cov, n=40))
    assert samples.shape == (40, 2, 21, 2)
    assert np.isfinite(samples).all()
    # Each instant's population tracks its own prediction.
    for inst in range(2):
        err = np.linalg.norm(samples[:, inst].mean(0) - np.asarray(mu[inst]), axis=-1)
        assert err.mean() < 8.0, f"instant {inst} drift {err.mean()}"
    # ES samples should be smaller than ED samples (area ordering preserved).
    def area(c):
        x, y = c[..., 0], c[..., 1]
        return 0.5 * np.abs(np.sum(x * np.roll(y, -1, -1) - np.roll(x, -1, -1) * y, axis=-1))
    assert area(samples[:, 1]).mean() < area(samples[:, 0]).mean()


def test_sequence_skew_sampler_runs():
    ed, es = _pairs(100)
    prior = fit_shape_prior(np.concatenate([ed, es]))
    seq = np.concatenate([ed.reshape(len(ed), -1), es.reshape(len(es), -1)], axis=1)
    seq_prior = fit_shape_prior(seq.reshape(len(seq), -1, 2))
    sampler = SequenceSkewPSMSampler(prior, seq_prior, grid_size=64)

    mu = jnp.asarray(np.stack([ed[3], es[3]]), jnp.float32)
    cov = jnp.tile(jnp.eye(2) * 9.0, (2, 21, 1, 1))
    alpha = jnp.ones((2, 21, 2)) * 2.0
    samples = np.asarray(sampler(jax.random.key(3), mu, cov, alpha, n=6))
    assert samples.shape == (6, 2, 21, 2)
    assert np.isfinite(samples).all()
