"""Skew PSM (grid-product) and sequence PSM samplers."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

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


def test_skew_subset_matches_gaussian_psm_with_zero_alpha():
    """The static skew-subset gather (grid product computed only at
    skew_indices) must leave the sampling distribution intact: with alpha=0
    the skew-normal is the Gaussian, so a skew5-subset sampler's population
    must match the plain Gaussian PSM sampler's at EVERY point (skew points
    draw from the same fusion product on the lattice; non-skew points take
    the identical Gaussian path)."""
    from contouring_uncertainty_tpu.sampler import PosteriorShapeModelSampler

    contours = _train_contours()
    prior = fit_shape_prior(contours)
    subset = [0, 5, 10, 15, 20]
    skew = SkewPosteriorShapeModelSampler(
        prior, skew_indices=subset, grid_size=256, grid_window=None,
        method="grid")
    gauss = PosteriorShapeModelSampler(prior)
    mu = jnp.asarray(contours[2], jnp.float32)
    cov = jnp.tile(jnp.eye(2) * 9.0, (21, 1, 1))
    alpha = jnp.zeros((21, 2))

    n = 400
    s_skew = np.asarray(skew(jax.random.key(0), mu, cov, alpha, n=n))
    s_gauss = np.asarray(gauss(jax.random.key(1), mu, cov, n=n))
    assert np.isfinite(s_skew).all()

    # Per-point mean agreement: SE of the mean ~ sigma/sqrt(n); the posterior
    # fusion keeps per-point sigma <= 3 px here, so 3-sigma band ~ 0.45 px +
    # 0.5 px lattice quantization headroom at the skew points.
    mean_diff = np.linalg.norm(s_skew.mean(0) - s_gauss.mean(0), axis=-1)
    assert mean_diff.max() < 1.5, f"max mean diff {mean_diff.max():.2f}"
    # Per-point std agreement within 25% relative (chi-square spread at
    # n=400 is ~10%; lattice discretization adds a little at skew points).
    std_s = s_skew.std(0)
    std_g = s_gauss.std(0)
    rel = np.abs(std_s - std_g) / np.maximum(std_g, 0.5)
    assert rel.max() < 0.25, f"max std rel diff {rel.max():.2f}"


_GRID_N = 512


@pytest.fixture(scope="module")
def grid_reference():
    """One shared full-grid (reference-exact) skew population: the 128^2
    full-lattice compile + draw is by far the most expensive piece of this
    file, and both equivalence tests (windowed and ESN) compare against the
    same law — build it once."""
    contours = _train_contours()
    prior = fit_shape_prior(contours)
    mu = jnp.asarray(contours[5], jnp.float32)
    cov = jnp.tile(jnp.eye(2) * 9.0, (21, 1, 1))
    alpha = jnp.ones((21, 2)) * jnp.asarray([3.0, 1.0])
    full = SkewPosteriorShapeModelSampler(prior, grid_size=128,
                                          grid_window=128, method="grid")
    s_full = np.asarray(full(jax.random.key(0), mu, cov, alpha, n=_GRID_N))
    return prior, mu, cov, alpha, s_full


def _population_stats_close(s_ref, s_new, n=_GRID_N):
    """Shared mean/std/skewness agreement gate for two n-draw populations."""
    se = np.sqrt(s_ref.var(0) / n + s_new.var(0) / n)
    mean_z = np.abs(s_ref.mean(0) - s_new.mean(0)) / np.maximum(se, 1e-6)
    assert mean_z.max() < 6.0, f"max mean z-score {mean_z.max():.2f}"
    std_rel = np.abs(s_ref.std(0) - s_new.std(0)) / np.maximum(s_ref.std(0), 0.5)
    assert std_rel.max() < 0.35, f"max std rel diff {std_rel.max():.2f}"

    def skewness(s):
        d = s - s.mean(0)
        return (d**3).mean(0) / np.maximum(s.std(0) ** 3, 1e-6)

    sk_diff = np.abs(skewness(s_ref) - skewness(s_new))
    # Skewness SE ~ sqrt(6/n) ~ 0.108; diff of two populations ~ 0.153.
    assert np.mean(sk_diff) < 0.2, f"mean skewness diff {np.mean(sk_diff):.2f}"
    assert sk_diff.max() < 0.8, f"max skewness diff {sk_diff.max():.2f}"


def test_windowed_vs_full_grid_equivalence(grid_reference):
    """The round-2 windowed grid-product draw must be distributionally
    indistinguishable from the reference-exact full-grid draw
    (sampler/posterior_shape_model/psm_skew.py:44-159 samples the full grid)
    on the same prior, and the window's truncated probability mass must be
    provably negligible — not just asserted so."""
    from contouring_uncertainty_tpu.distributions import bsn, bvn
    from contouring_uncertainty_tpu.sampler import prior as prior_lib
    from contouring_uncertainty_tpu.sampler.psm import merge_priors

    prior, mu, cov, alpha, s_full = grid_reference
    win = SkewPosteriorShapeModelSampler(prior, grid_size=128,
                                         grid_window=None, method="grid")
    assert win._window < 128, "auto window must actually truncate the grid"

    n = _GRID_N
    s_win = np.asarray(win(jax.random.key(1), mu, cov, alpha, n=n))

    # Per-coordinate population mean/std/skewness within statistical
    # tolerance of each other (two independent n-sample populations).
    _population_stats_close(s_full, s_win)

    # Explicit truncation bound: evaluate the fused grid-product density on
    # the FULL grid (level-0 posterior at a representative contour state) and
    # sum the probability mass falling outside each point's window.
    alpha_f = alpha * jnp.asarray([1.0, -1.0])
    mu_t = prior_lib.transform(prior, mu).reshape(-1)
    mu_c, cov_c = win._posterior_points(
        mu, win._ops[0], mu_t, prior_lib.refit_d(prior, mu_t)
    )
    mu_f, cov_f = merge_priors(mu, cov, mu_c, cov_c)
    steps = win._point_steps(cov_f)
    offs = np.asarray(win._window_offsets(mu_f, steps))
    steps = np.asarray(steps)
    step = win._step
    ax = jnp.arange(128, dtype=jnp.float32) * step
    gx, gy = jnp.meshgrid(ax, ax, indexing="ij")
    grid = jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)
    worst = 0.0
    for k in range(21):
        lp = bsn.logpdf(grid, mu[k], cov[k], alpha_f[k]) + bvn.logpdf(
            grid, mu_c[k], cov_c[k]
        )
        p = np.asarray(jax.nn.softmax(lp))
        g = np.asarray(grid)
        hi = (win._window - 1) * steps[k, 0]
        inside = (
            (g[:, 0] >= offs[k, 0] - 1e-5) & (g[:, 0] <= offs[k, 0] + hi + 1e-5)
            & (g[:, 1] >= offs[k, 1] - 1e-5) & (g[:, 1] <= offs[k, 1] + hi + 1e-5)
        )
        worst = max(worst, float(p[~inside].sum()))
    assert worst < 1e-7, f"truncated mass {worst:.2e}"


def test_esn_matches_grid_product(grid_reference):
    """The closed-form ESN draw (default method) must be distributionally
    indistinguishable from the reference-parity full-grid lattice draw of
    the same skew-pdf x posterior-pdf product, on the same prior — mean,
    spread, and skewness. The ESN is the exact continuous law the lattice
    discretizes, so this gates both the derivation and the wiring."""
    prior, mu, cov, alpha, s_grid = grid_reference
    esn = SkewPosteriorShapeModelSampler(prior, grid_size=128, method="esn")
    s_esn = np.asarray(esn(jax.random.key(1), mu, cov, alpha, n=_GRID_N))
    assert np.isfinite(s_esn).all()
    _population_stats_close(s_grid, s_esn)


def test_esn_zero_alpha_matches_gaussian_psm():
    """alpha=0 collapses the ESN tilt to a constant: the default skew sampler
    must then reproduce the plain Gaussian PSM population exactly in law."""
    from contouring_uncertainty_tpu.sampler import PosteriorShapeModelSampler

    contours = _train_contours()
    prior = fit_shape_prior(contours)
    esn = SkewPosteriorShapeModelSampler(prior)
    gauss = PosteriorShapeModelSampler(prior)
    mu = jnp.asarray(contours[2], jnp.float32)
    cov = jnp.tile(jnp.eye(2) * 9.0, (21, 1, 1))
    alpha = jnp.zeros((21, 2))

    n = 400
    s_esn = np.asarray(esn(jax.random.key(0), mu, cov, alpha, n=n))
    s_gauss = np.asarray(gauss(jax.random.key(1), mu, cov, n=n))
    mean_diff = np.linalg.norm(s_esn.mean(0) - s_gauss.mean(0), axis=-1)
    assert mean_diff.max() < 1.5, f"max mean diff {mean_diff.max():.2f}"
    rel = np.abs(s_esn.std(0) - s_gauss.std(0)) / np.maximum(s_gauss.std(0), 0.5)
    assert rel.max() < 0.25, f"max std rel diff {rel.max():.2f}"


def test_window_pitch_adapts_to_ood_posterior():
    """OOD guard (round-3 review finding): the per-prediction re-fit factor
    [F0|d] inflates the posterior sigma ~||d|| for predictions far from the
    shape space — beyond the STATIC window bound computed from the fixed
    prior. The adaptive per-point pitch must widen the lattice so the window
    still spans >= 6 fused sigmas (no silent tail truncation), and samples
    must actually spread beyond the static window's span instead of being
    clipped to it."""
    contours = _train_contours()
    prior = fit_shape_prior(contours)
    win = SkewPosteriorShapeModelSampler(prior, grid_size=128,
                                         grid_window=None, method="grid")
    step0 = win._step

    # Healthy fused covariance -> exact global pitch (full-grid lattice).
    cov_small = jnp.tile(jnp.eye(2) * 4.0, (21, 1, 1))
    np.testing.assert_allclose(np.asarray(win._point_steps(cov_small)), step0)

    # Blown-up fused covariance (sigma 30 px >> static window span / 6).
    cov_big = jnp.tile(jnp.eye(2) * 900.0, (21, 1, 1))
    steps = np.asarray(win._point_steps(cov_big))
    assert (steps > step0).all()
    assert ((win._window - 1) * steps >= 6.0 * 30.0 - 1e-3).all()

    # End to end: an OOD prediction (far off the shape space) with wide
    # predicted sigma must yield finite samples whose spread is NOT clamped
    # by the static window extent.
    mu_ood = jnp.asarray(contours[0] + 60.0, jnp.float32)
    alpha = jnp.ones((21, 2))
    s = np.asarray(win(jax.random.key(3), mu_ood, cov_big, alpha, n=256))
    assert np.isfinite(s).all()
    static_span = (win._window - 1) * step0
    spread = s.std(0).max()
    assert spread > static_span / 4.0, (spread, static_span)


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
