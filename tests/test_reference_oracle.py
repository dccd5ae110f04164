"""Parity against the REFERENCE'S OWN SOURCE, imported directly.

tests/test_torch_parity.py re-transcribes the reference formulas in torch;
these tests instead import `/root/reference`'s actual modules (torch/scipy
only — importable in this env) so a misreading cannot be replicated on both
sides of the comparison (VERDICT round-1, item 4).

Conventions verified here and relied on elsewhere:
- reference DSNT (task/regression/dsnt/utils.py:7-47): moments of softmaxed
  heatmaps in normalized cell-center coordinates; the `compute_skew` branch
  is NOT compared (its `X - x / sqrt(var)` is a reference defect — operator
  precedence makes it x/sqrt(var), not (X-x)/sqrt(var); our skew moments are
  the mathematically intended third central moments).
- reference BivariateNormal/BivariateSkewNormal classmethod API
  (distributions/bivariate{normal,skewnormal}.py).
"""

import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

ref_dsnt = pytest.importorskip("contour_uncertainty.task.regression.dsnt.utils")
ref_bvn_mod = pytest.importorskip("contour_uncertainty.distributions.bivariatenormal")
ref_bsn_mod = pytest.importorskip("contour_uncertainty.distributions.bivariateskewnormal")

from contouring_uncertainty_tpu.distributions import normal as bvn
from contouring_uncertainty_tpu.distributions import skew_normal as bsn
from contouring_uncertainty_tpu.ops import coords as C
from contouring_uncertainty_tpu.ops import dsnt as D

RefBVN = ref_bvn_mod.BivariateNormal
RefBSN = ref_bsn_mod.BivariateSkewNormal


def _rand_cov(rng, scale=4.0):
    a = rng.normal(size=(2, 2))
    return (a @ a.T + 0.5 * np.eye(2)) * scale


def test_normalized_linspace_matches_reference():
    for n in (4, 7, 256):
        ours = np.asarray(C.normalized_linspace(n, dtype=jnp.float64))
        ref = ref_dsnt.normalized_linspace(n, dtype=torch.float64).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-12)


def test_coordinate_transforms_match_reference():
    rng = np.random.default_rng(0)
    pts = rng.uniform(-1, 1, size=(5, 3, 2))
    size = (64, 48)  # (H, W)
    ours = np.asarray(C.normalized_to_pixel(jnp.asarray(pts), size))
    ref = ref_dsnt.normalized_to_pixel_coordinates(torch.tensor(pts), size).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)

    px = rng.uniform(0, 48, size=(5, 3, 2))
    ours = np.asarray(C.pixel_to_normalized(jnp.asarray(px), size))
    ref = ref_dsnt.pixel_to_normalized_coordinates(torch.tensor(px), size).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_flat_softmax_and_dsnt_moments_match_reference():
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(2, 5, 32, 32)).astype(np.float32) * 3

    ref_probs = ref_dsnt.flat_softmax(torch.tensor(logits))
    ours_probs = np.asarray(D.flat_softmax(jnp.asarray(logits)))
    np.testing.assert_allclose(ours_probs, ref_probs.numpy(), atol=1e-6)

    ref_mean, ref_var, ref_cov = ref_dsnt.dsnt(ref_probs)
    mean, var, cov = D.dsnt_moments(jnp.asarray(ours_probs))
    np.testing.assert_allclose(np.asarray(mean), ref_mean.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(var), ref_var.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(cov), ref_cov.numpy(), atol=2e-5)


def test_euclidean_losses_match_reference():
    rng = np.random.default_rng(2)
    a = rng.normal(size=(4, 21, 2))
    b = rng.normal(size=(4, 21, 2))
    ours = np.asarray(D.euclidean_error(jnp.asarray(a), jnp.asarray(b)))
    ref = ref_dsnt.euclidean_losses(torch.tensor(a), torch.tensor(b)).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_bivariate_normal_logpdf_nll_match_reference():
    rng = np.random.default_rng(3)
    for _ in range(5):
        mu = rng.normal(size=2) * 10
        cov = _rand_cov(rng)
        x = rng.normal(size=2) * 10

        ours = float(bvn.logpdf(jnp.asarray(x), jnp.asarray(mu), jnp.asarray(cov)))
        ref = float(RefBVN.logpdf(torch.tensor(x)[None], torch.tensor(mu),
                                  torch.tensor(cov)))
        np.testing.assert_allclose(ours, ref, rtol=1e-5)

        o_nll, o_t1, o_t2 = bvn.nll(jnp.asarray(x), jnp.asarray(mu), jnp.asarray(cov))
        r_nll, r_t1, r_t2 = RefBVN.nll(torch.tensor(x)[:, None],
                                       torch.tensor(mu)[:, None],
                                       torch.tensor(cov))
        np.testing.assert_allclose(float(o_nll), float(r_nll), rtol=1e-5)
        np.testing.assert_allclose(float(o_t1), float(r_t1), rtol=1e-5)
        np.testing.assert_allclose(float(o_t2), float(r_t2), rtol=1e-5)


def test_bivariate_normal_conditional_variance_and_marginal_match_reference():
    rng = np.random.default_rng(4)
    # f32 torch tensors: the reference's rotate_cov builds f32 internals and
    # torch refuses mixed f32/f64 matmuls.
    t = lambda z: torch.tensor(np.asarray(z, np.float32))
    for _ in range(5):
        mu = rng.normal(size=2).astype(np.float32)
        cov = _rand_cov(rng).astype(np.float32)
        angle = np.float32(rng.uniform(-np.pi, np.pi))

        ours = float(bvn.conditional_variance(jnp.asarray(cov), jnp.asarray(angle)))
        ref = float(RefBVN.conditional_variance(t(mu), t(cov), t(angle)))
        np.testing.assert_allclose(ours, ref, rtol=1e-4)

        for axis in (0, 1):
            o_mu, o_var = bvn.marginal(jnp.asarray(mu), jnp.asarray(cov), axis,
                                       jnp.asarray(angle))
            r_mu, r_var = RefBVN.marginal(t(mu), t(cov), axis, t(angle))
            np.testing.assert_allclose(float(o_mu), float(r_mu), rtol=1e-4,
                                       atol=1e-5)
            np.testing.assert_allclose(float(o_var), float(r_var), rtol=1e-4)


def test_skew_normal_logpdf_nll_match_reference():
    # Moderate skew and near-mode evaluation points: our unit_normal_logcdf
    # clamps the deep tail (NaN-safety for training); parity is asserted in
    # the regime the losses actually operate in.
    rng = np.random.default_rng(5)
    for _ in range(5):
        mu = rng.normal(size=2) * 5
        cov = _rand_cov(rng)
        alpha = rng.normal(size=2) * 1.5
        x = mu + rng.normal(size=2)

        ours = float(bsn.logpdf(jnp.asarray(x), jnp.asarray(mu), jnp.asarray(cov),
                                jnp.asarray(alpha)))
        ref = float(RefBSN.logpdf(torch.tensor(x)[None], torch.tensor(mu),
                                  torch.tensor(cov), torch.tensor(alpha)))
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

        o = bsn.nll(jnp.asarray(x), jnp.asarray(mu), jnp.asarray(cov),
                    jnp.asarray(alpha))
        o_nll = o[0] if isinstance(o, tuple) else o
        # reference call convention (dsnt_skew.py:84-91): (B, 2, 1) columns
        col = lambda z: torch.tensor(z)[None, :, None]
        r = RefBSN.nll(col(x), col(mu), torch.tensor(cov)[None], col(alpha))
        r_nll = r[0] if isinstance(r, tuple) else r
        np.testing.assert_allclose(float(jnp.ravel(o_nll)[0]),
                                   float(torch.ravel(r_nll)[0]),
                                   rtol=1e-4, atol=1e-5)


def test_skew_normal_mode_reference_defect_documented():
    """The reference's bivariate mode (bivariateskewnormal.py:72-81) is
    BUGGY: its cov2corr returns the stds as a (1, 2) ROW vector, so
    `w @ corr @ alpha` collapses to a scalar and the same offset is added to
    both coordinates. Our mode implements the intended formula
    mu + (m0(a*)/a*) * std * (corr @ alpha) and is validated against scipy
    numeric pdf-argmax in tests/test_distributions.py. This test pins the
    divergence so parity checks don't chase it."""
    rng = np.random.default_rng(6)
    mu = rng.normal(size=2) * 5
    cov = _rand_cov(rng)
    alpha = rng.normal(size=2) * 3
    ref = RefBSN.mode(torch.tensor(mu), torch.tensor(cov),
                      torch.tensor(alpha)).numpy().reshape(-1)
    off = ref - mu
    np.testing.assert_allclose(off[0], off[1], rtol=1e-6)  # the defect
    ours = np.asarray(bsn.mode(jnp.asarray(mu), jnp.asarray(cov),
                               jnp.asarray(alpha))).reshape(-1)
    assert abs(ours[0] - mu[0] - (ours[1] - mu[1])) > 1e-3  # ours does not


def test_skew_normal_helper_functions_match_reference():
    rng = np.random.default_rng(7)
    a = rng.normal(size=(6, 2)) * 3
    np.testing.assert_allclose(
        np.asarray(bsn.delta(jnp.asarray(a))),
        ref_bsn_mod.delta(torch.tensor(a)).numpy(), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(bsn.skewness(jnp.asarray(a))),
        ref_bsn_mod.skewness(torch.tensor(a)).numpy(), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(bsn.m0(jnp.asarray(a))),
        ref_bsn_mod.m0(torch.tensor(a)).numpy(), atol=1e-5)


def test_skew_normal_rvs_population_matches_reference_rvs_fast():
    """Distributional parity: moments of 40k draws from our augmented-
    Cholesky sampler vs the reference's rvs_fast."""
    rng = np.random.default_rng(8)
    mu = np.array([2.0, -1.0])
    cov = np.array([[4.0, 1.2], [1.2, 2.5]])
    alpha = np.array([3.0, -1.5])
    n = 40_000

    torch.manual_seed(0)
    ref = RefBSN.rvs_fast(torch.tensor(mu), torch.tensor(cov),
                          torch.tensor(alpha), size=(n,)).numpy().reshape(n, 2)
    ours = np.asarray(bsn.rvs(jax.random.key(0), jnp.asarray(mu),
                              jnp.asarray(cov), jnp.asarray(alpha), (n,)))
    ours = ours.reshape(n, 2)

    np.testing.assert_allclose(ours.mean(0), ref.mean(0), atol=0.06)
    np.testing.assert_allclose(np.cov(ours.T), np.cov(ref.T), atol=0.15)
    # third standardized moment captures the skew direction
    def sk(z):
        c = z - z.mean(0)
        return (c ** 3).mean(0) / (c ** 2).mean(0) ** 1.5
    np.testing.assert_allclose(sk(ours), sk(ref), atol=0.05)


def test_projected_uncertainty_matches_reference_source():
    """Spline-tangent uncertainty projection vs the reference's own
    uncertainty_projection.py (it nearest-neighbour-searches 1000 dense
    scipy-spline samples for tangents; we evaluate the fitted spline's
    derivative at the landmark parameters — same curve, so u agrees to
    ~1e-3 rel and the projection directions align to ~1e-4)."""
    ref_proj = pytest.importorskip("contour_uncertainty.utils.uncertainty_projection")
    from contouring_uncertainty_tpu.utils import projection as P

    rng = np.random.default_rng(3)
    t_par = np.linspace(0, np.pi, 21)
    mu = np.stack([128 + 60 * np.cos(t_par), 200 - 120 * np.sin(t_par)], -1)
    mu = (mu + rng.normal(0, 1.5, mu.shape)).astype(np.float32)
    cov = np.stack([_rand_cov(rng, scale=3.0) for _ in range(21)]).astype(np.float32)

    u_ref, v_ref = ref_proj.projected_uncertainty(
        torch.tensor(mu), torch.tensor(cov), all=True)
    u_ref = np.asarray([float(x) for x in u_ref])
    v_ref = np.asarray(v_ref, dtype=np.float64)
    u, v = jax.tree.map(np.asarray,
                        P.projected_uncertainty(jnp.asarray(mu), jnp.asarray(cov)))

    np.testing.assert_allclose(u, u_ref, rtol=5e-3)
    cos = np.abs(np.sum(v * v_ref, -1)
                 / (np.linalg.norm(v, axis=-1) * np.linalg.norm(v_ref, axis=-1)))
    assert cos.min() > 1 - 1e-4, cos.min()

    # Scalar instant value (sum of projected sigmas, reference :11-14).
    val_ref = float(ref_proj.projected_uncertainty_value(
        torch.tensor(mu), torch.tensor(cov)))
    val = float(P.projected_uncertainty_value(jnp.asarray(mu), jnp.asarray(cov)))
    np.testing.assert_allclose(val, val_ref, rtol=5e-3)

    # Skew variant: projected alpha must match too (rotate_alpha convention).
    alpha = rng.normal(0, 2.0, (21, 2)).astype(np.float32)
    u_ref, v_ref, a_ref = ref_proj.projected_uncertainty(
        torch.tensor(mu), torch.tensor(cov), alpha=torch.tensor(alpha), all=True)
    u_s, v_s, a_s = jax.tree.map(np.asarray, P.projected_uncertainty(
        jnp.asarray(mu), jnp.asarray(cov), alpha=jnp.asarray(alpha)))
    np.testing.assert_allclose(u_s, np.asarray([float(x) for x in u_ref]), rtol=5e-3)
    # alpha_proj is SIGNED along the tangent direction, so it inherits the
    # full sensitivity of the angle difference between our exact spline
    # derivative and the reference's nearest-of-1000 dense-sample tangent
    # (u only sees that difference through the (smooth) marginal variance).
    # ~1e-3 rad of angle difference moves alpha_proj by up to |alpha| * 1e-3
    # * d(rotation)/d(angle) ~ 0.01-0.05 for |alpha| ~ 4.
    np.testing.assert_allclose(a_s, np.asarray([float(x) for x in a_ref]),
                               rtol=0.02, atol=0.05)


def test_psm_posterior_matches_reference_source():
    """PCA fit + masked posterior conditional vs the reference's own
    posteriorshapemodel.py (torch). The PCA factor Q is sign/degenerate-
    subspace ambiguous, so parity is asserted on the invariants: the
    reconstructed covariance Q Q^T and the posterior (mu_c, cov_c) computed
    by the REFERENCE formula from OUR Q vs our Q-form and factor-form
    implementations."""
    ref_psm = pytest.importorskip(
        "contour_uncertainty.sampler.posterior_shape_model.posteriorshapemodel")
    from contouring_uncertainty_tpu.sampler import fit_shape_prior
    from contouring_uncertainty_tpu.sampler import prior as prior_lib

    rng = np.random.default_rng(11)
    t_par = np.linspace(0, np.pi, 21)
    base = np.stack([128 + 60 * np.cos(t_par), 200 - 120 * np.sin(t_par)], -1)
    contours = np.stack(
        [base + rng.normal(0, 4.0, base.shape) for _ in range(200)]
    ).astype(np.float32)
    x = contours.reshape(200, -1)

    # PCA parity (covariance reconstruction; Q itself is sign-ambiguous).
    mu_ref, q_ref = ref_psm.pca(torch.tensor(x, dtype=torch.float64))
    prior = fit_shape_prior(contours)
    qqt_ref = (q_ref @ q_ref.T).numpy()
    q_ours = np.asarray(prior.q, np.float64)
    # Our prior centers X before the PCA (scaler with_std=False), the
    # reference pca() does its own centering — same cov either way.
    np.testing.assert_allclose(q_ours @ q_ours.T, qqt_ref, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(prior.train_mean, np.float64) + np.asarray(prior.x_train_mean, np.float64),
        mu_ref.numpy()[:, 0], atol=1e-3)

    # Posterior conditional parity on identical (mu, Q): reference formula
    # vs our Q-form and factor-form, masked to the first 3 landmarks.
    p = 42
    g_indices = [0, 1, 2, 3, 4, 5]  # first 3 points' coordinates
    g_mask = np.zeros(p, np.float32)
    g_mask[g_indices] = 1.0
    s_obs = (x[0] - x.mean(0)).astype(np.float64)
    sigma2 = 1.0

    mu_t = torch.tensor(np.zeros((p, 1)))  # transformed space is centered
    q_t = torch.tensor(np.asarray(prior.q, np.float64))
    mu_c_ref, cov_c_ref = ref_psm.posterior_shape_model(
        torch.tensor(s_obs[:, None]), g_indices, mu_t, q_t, sigma2=sigma2)
    mu_c_ref = mu_c_ref.numpy()[:, 0]
    cov_c_ref = cov_c_ref.numpy()

    mu_c, cov_c = prior_lib.posterior_shape_model(
        jnp.asarray(s_obs * g_mask, jnp.float32), jnp.asarray(g_mask),
        jnp.zeros(p, jnp.float32), jnp.asarray(prior.q), sigma2)
    np.testing.assert_allclose(np.asarray(mu_c), mu_c_ref, atol=2e-3)
    np.testing.assert_allclose(np.asarray(cov_c), cov_c_ref, atol=2e-3)

    # Factor form (the production path: Gram solves on the fixed factor,
    # no eigh) must agree with the same reference numbers.
    f0 = prior_lib.cov_factor(prior)
    mu_c_f, cov_c_f = prior_lib.posterior_shape_model_factor(
        jnp.asarray(s_obs * g_mask, jnp.float32), jnp.asarray(g_mask),
        jnp.zeros(p, jnp.float32), f0, sigma2)
    np.testing.assert_allclose(np.asarray(mu_c_f), mu_c_ref, atol=2e-3)
    np.testing.assert_allclose(np.asarray(cov_c_f), cov_c_ref, atol=2e-3)
