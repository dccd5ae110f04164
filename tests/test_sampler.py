"""PSM sampler: deterministic math vs numpy oracles + statistical shape tests.

Oracle pattern follows the reference's own approach (scipy/numpy checks of
posteriorshapemodel.py math); statistical checks assert the sampled contour
population respects the prediction and the shape prior.
"""

import numpy as np
import jax
import jax.numpy as jnp

from contouring_uncertainty_tpu.sampler import (
    NaiveSampler,
    PosteriorShapeModelSampler,
    fit_shape_prior,
)
from contouring_uncertainty_tpu.sampler import prior as prior_lib
from contouring_uncertainty_tpu.sampler.psm import get_points_order, merge_priors


def _train_contours(n=300, k=21, seed=0):
    from contouring_uncertainty_tpu.data.synthetic import lv_contour_points

    rng = np.random.default_rng(seed)
    return np.stack([lv_contour_points(rng, k=k, size=256) for _ in range(n)])


def test_get_points_order_matches_reference_algorithm():
    initial, order = get_points_order(21, levels=3)
    assert initial == [0, 10, 20]
    # Level 1 bisects [0,10] and [10,20] (rounding toward the base).
    assert order[0] == [5, 15]
    flat = initial + [p for lvl in order for p in lvl]
    assert len(flat) == len(set(flat))  # no duplicates
    assert all(0 <= p < 21 for p in flat)


def test_posterior_shape_model_matches_numpy_oracle():
    rng = np.random.default_rng(1)
    p = 10
    q = rng.normal(size=(p, p)) * 0.5
    mu = rng.normal(size=(p,))
    s_g = rng.normal(size=(p,))
    mask = np.zeros(p)
    mask[[0, 1, 4, 5]] = 1.0
    sigma2 = 0.7

    mu_c, cov_c = prior_lib.posterior_shape_model(
        jnp.asarray(s_g * mask), jnp.asarray(mask), jnp.asarray(mu), jnp.asarray(q), sigma2
    )
    # Oracle: reference formulation with masked matrices (posteriorshapemodel.py:49-81).
    q_g = q * mask[:, None]
    a_inv = np.linalg.inv(q_g.T @ q_g + sigma2 * np.eye(p))
    ref_mu = mu + q @ a_inv @ q_g.T @ ((s_g * mask) - mu * mask)
    ref_cov = sigma2 * q @ a_inv @ q.T
    np.testing.assert_allclose(np.asarray(mu_c), ref_mu, atol=2e-4)
    np.testing.assert_allclose(np.asarray(cov_c), ref_cov, atol=2e-4)


def test_posterior_factor_form_matches_q_form_and_stays_finite():
    """The factor-form posterior (Gram solve on [F0|d], the samplers' hot
    path) must agree with the Q-form for F = Q, and must stay finite at the
    fill-step sigma even when the refit column is huge (the cov-form
    NaN regression caught by the round-3 TPU verify drive)."""
    rng = np.random.default_rng(11)
    p = 12
    q = rng.normal(size=(p, p)) * 0.5
    mu = rng.normal(size=(p,))
    s_g = rng.normal(size=(p,))
    mask = np.zeros(p)
    mask[[0, 1, 6, 7]] = 1.0
    for sigma2 in (1.0, 1e-3):
        mu_q, cov_q = prior_lib.posterior_shape_model(
            jnp.asarray(s_g * mask), jnp.asarray(mask), jnp.asarray(mu),
            jnp.asarray(q), sigma2,
        )
        mu_f, cov_f = prior_lib.posterior_shape_model_factor(
            jnp.asarray(s_g * mask), jnp.asarray(mask), jnp.asarray(mu),
            jnp.asarray(q), sigma2,
        )
        np.testing.assert_allclose(np.asarray(mu_f), np.asarray(mu_q),
                                   atol=5e-4, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(cov_f), np.asarray(cov_q),
                                   atol=5e-4, rtol=1e-3)

    # Robustness: a refit column ~100x the prior scale (untrained/OOD
    # prediction) with the tiny fill sigma must not NaN the Gram solve.
    contours = _train_contours(100)
    prior = fit_shape_prior(contours)
    f0 = prior_lib.cov_factor(prior)
    np.testing.assert_allclose(np.asarray(f0 @ f0.T), np.asarray(prior.cov0),
                               atol=1e-2, rtol=1e-3)
    pred_t = jnp.asarray(prior.x_train_mean + 500.0)
    _, f = prior_lib.refit_factor(prior, f0, pred_t)
    mask_big = np.zeros(prior.dim, np.float32)
    mask_big[: prior.dim // 2] = 1.0
    mu_c, cov_c = prior_lib.posterior_shape_model_factor(
        pred_t * mask_big, jnp.asarray(mask_big), pred_t, f, 1e-3
    )
    assert bool(jnp.isfinite(mu_c).all())
    assert bool(jnp.isfinite(cov_c).all())


def test_posterior_sherman_morrison_matches_factor_form():
    """The Sherman-Morrison posterior (static f64 base inverse + rank-1
    refit, the samplers' hot path since round 3 — zero LA custom calls)
    must agree with the factor-form Gram solve on [F0|d] for healthy
    refits, stay finite for OOD-huge refits at the fill sigma, and with
    d=None reproduce the fixed-prior (Q-form) posterior."""
    contours = _train_contours(100)
    prior = fit_shape_prior(contours)
    p = prior.dim
    f0 = prior_lib.cov_factor(prior)
    mask = np.zeros(p, np.float32)
    mask[: p // 2] = 1.0
    rng = np.random.default_rng(3)
    s_g = jnp.asarray(rng.normal(size=p).astype(np.float32))
    mu_t = jnp.asarray(prior.x_train_mean)

    def oracle(d_np, sigma2):
        """f64 reference of the masked conditional with C = C0 + d d^T."""
        f64 = np.asarray(f0, np.float64)
        m = mask.astype(np.float64)
        c = f64 @ f64.T
        if d_np is not None:
            c = c + np.outer(d_np, d_np)
        s0 = sigma2 * np.eye(p) + (
            (f64 * m[:, None]) @ (f64 * m[:, None]).T
            + (0 if d_np is None else np.outer(m * d_np, m * d_np))
        )
        resid = (np.asarray(s_g, np.float64) - np.asarray(mu_t, np.float64)) * m
        half = np.linalg.solve(s0, c * m[:, None])
        return (np.asarray(mu_t, np.float64) + half.T @ resid,
                c - (c * m[:, None]).T @ half)

    for sigma2 in (1.0, 1e-3):
        op = prior_lib.posterior_operator(np.asarray(f0), mask, sigma2)
        # d = None == fixed prior. The f64-precomputed base inverse makes the
        # SM form far MORE accurate than the f32-Cholesky factor form at the
        # fill sigma (measured 1.6e-6 vs 1.9e-2 abs mu error at cond ~1e6),
        # so the gate is the f64 oracle, not the noisier factor path.
        mu_sm, cov_sm = prior_lib.posterior_shape_model_sm(s_g, mu_t, None, op)
        ref_mu, ref_cov = oracle(None, sigma2)
        np.testing.assert_allclose(np.asarray(mu_sm), ref_mu, atol=1e-4)
        np.testing.assert_allclose(np.asarray(cov_sm), ref_cov, atol=1e-4)

        # Healthy refit column. Accuracy contract (prior.py docstring): the
        # MEAN is factor-form-accurate at every sigma; the COV is asserted
        # only at the level sigma (1.0) — at the fill sigma the rank-1
        # cancellation costs ~beta ULPs and every caller discards the fill
        # cov (`mu_c, _ = _posterior_points(..., fill)`).
        pred_t = mu_t + jnp.asarray(rng.normal(size=p).astype(np.float32)) * 0.1
        d = prior_lib.refit_d(prior, pred_t)
        mu_sm, cov_sm = prior_lib.posterior_shape_model_sm(s_g, mu_t, d, op)
        ref_mu, ref_cov = oracle(np.asarray(d, np.float64), sigma2)
        np.testing.assert_allclose(np.asarray(mu_sm), ref_mu, atol=2e-2)
        if sigma2 == 1.0:
            np.testing.assert_allclose(np.asarray(mu_sm), ref_mu, atol=5e-4)
            np.testing.assert_allclose(np.asarray(cov_sm), ref_cov, atol=5e-3)

    # OOD robustness: a refit column ~500x the prior scale with the fill
    # sigma must stay finite (no factorization exists to NaN).
    op = prior_lib.posterior_operator(np.asarray(f0), mask, 1e-3)
    pred_t = mu_t + 500.0
    mu_sm, cov_sm = prior_lib.posterior_shape_model_sm(
        pred_t * jnp.asarray(mask), pred_t, prior_lib.refit_d(prior, pred_t), op)
    assert bool(jnp.isfinite(mu_sm).all())
    assert bool(jnp.isfinite(cov_sm).all())


def test_refit_q_reconstructs_noncentered_covariance():
    contours = _train_contours(200)
    prior = fit_shape_prior(contours)
    rng = np.random.default_rng(2)
    pred = contours[0] + rng.normal(scale=2.0, size=contours[0].shape)
    pred_t = np.asarray(prior_lib.transform(prior, jnp.asarray(pred, jnp.float32))).reshape(-1)
    _, q = prior_lib.refit_q(prior, jnp.asarray(pred_t))
    # Q Q^T must equal the covariance of X_train about the predicted mean.
    x = contours.reshape(len(contours), -1)
    xt = (x - np.asarray(prior.train_mean)) / np.asarray(prior.train_scale)
    diff = xt - pred_t
    ref_cov = diff.T @ diff / len(xt)
    got = np.asarray(q @ q.T)
    np.testing.assert_allclose(got, ref_cov, atol=5e-2, rtol=1e-2)


def test_merge_priors_is_gaussian_product():
    rng = np.random.default_rng(3)
    a1 = rng.normal(size=(5, 2, 2))
    cov1 = a1 @ a1.transpose(0, 2, 1) + np.eye(2)
    a2 = rng.normal(size=(5, 2, 2))
    cov2 = a2 @ a2.transpose(0, 2, 1) + np.eye(2)
    mu1 = rng.normal(size=(5, 2))
    mu2 = rng.normal(size=(5, 2))
    mu_f, cov_f = merge_priors(
        jnp.asarray(mu1), jnp.asarray(cov1), jnp.asarray(mu2), jnp.asarray(cov2)
    )
    for i in range(5):
        inv = np.linalg.inv(cov1[i] + cov2[i])
        ref_cov = cov1[i] @ inv @ cov2[i]
        ref_mu = cov1[i] @ inv @ mu2[i] + cov2[i] @ inv @ mu1[i]
        np.testing.assert_allclose(np.asarray(cov_f[i]), ref_cov, atol=1e-4)
        np.testing.assert_allclose(np.asarray(mu_f[i]), ref_mu, atol=1e-4)


def test_naive_sampler_moments():
    rng = np.random.default_rng(4)
    mu = rng.normal(size=(21, 2)) * 10 + 128
    cov = np.tile(np.eye(2) * 4.0, (21, 1, 1))
    s = np.asarray(NaiveSampler()(jax.random.key(0), jnp.asarray(mu), jnp.asarray(cov), n=4000))
    np.testing.assert_allclose(s.mean(0), mu, atol=0.3)
    np.testing.assert_allclose(s.var(0), 4.0, atol=0.5)


def test_psm_sampler_population_statistics():
    contours = _train_contours(300)
    prior = fit_shape_prior(contours)
    sampler = PosteriorShapeModelSampler(prior)

    pred = contours[5]
    cov = np.tile(np.eye(2) * 9.0, (21, 1, 1)).astype(np.float32)
    samples = np.asarray(
        sampler(jax.random.key(0), jnp.asarray(pred, jnp.float32), jnp.asarray(cov), n=200)
    )
    assert samples.shape == (200, 21, 2)
    assert np.isfinite(samples).all()
    # Population mean stays near the prediction (within a few px).
    err = np.linalg.norm(samples.mean(0) - pred, axis=-1)
    assert err.mean() < 4.0, f"mean drift {err}"
    # Samples vary (not collapsed) at the freely-sampled initial points...
    assert samples[:, 0].std(0).mean() > 1.0
    # ...and PSM-conditioned points vary less than the naive per-point std.
    naive_std = 3.0
    assert samples.std(0).mean() < naive_std * 1.5
    # Sampled shapes stay anatomically plausible: apex above base.
    assert (samples[:, 10, 1] < samples[:, 0, 1]).mean() > 0.95


def test_psm_sampler_batched():
    contours = _train_contours(100)
    prior = fit_shape_prior(contours)
    sampler = PosteriorShapeModelSampler(prior)
    mu = jnp.asarray(contours[:4].reshape(2, 2, 21, 2), jnp.float32)
    cov = jnp.tile(jnp.eye(2) * 4.0, (2, 2, 21, 1, 1))
    out = sampler.sample_batch(jax.random.key(1), mu, cov, n=5)
    assert out.shape == (2, 2, 5, 21, 2)
    assert bool(jnp.isfinite(out).all())


def test_reference_npy_prior_compatibility():
    """Load the reference's shipped PSM artifact directly and sample with it
    (sampler/prior.py's .npy loader; artifact described in SURVEY §2.3)."""
    from pathlib import Path

    from contouring_uncertainty_tpu.sampler.prior import load_prior

    ref = Path("/root/reference/camus-cont_psm_11_no_std.npy")
    if not ref.exists():
        import pytest

        pytest.skip("reference artifact not mounted")
    prior = load_prior(ref)
    assert prior.dim == 42
    assert np.allclose(np.asarray(prior.train_scale), 1.0)  # *_no_std

    sampler = PosteriorShapeModelSampler(prior)
    # Use the prior's own mean shape (transformed space -> pixel space).
    mu = (np.asarray(prior.x_train_mean) * np.asarray(prior.train_scale)
          + np.asarray(prior.train_mean)).reshape(21, 2).astype(np.float32)
    cov = np.tile(np.eye(2, dtype=np.float32) * 9.0, (21, 1, 1))
    samples = np.asarray(sampler(jax.random.key(0), jnp.asarray(mu), jnp.asarray(cov), n=100))
    assert samples.shape == (100, 21, 2)
    assert np.isfinite(samples).all()
    err = np.linalg.norm(samples.mean(0) - mu, axis=-1)
    assert err.mean() < 4.0, f"drift vs prior mean: {err.mean()}"
    # Sequence artifact too.
    seq = load_prior(Path("/root/reference/camus-cont_sequence_psm_11_no_std.npy"))
    assert seq.dim == 84
