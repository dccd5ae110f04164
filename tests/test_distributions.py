"""Distribution oracles: scipy multivariate_normal / skewnorm, exactly the
validation pattern the reference used in its __main__ checks
(distributions/bivariatenormal.py:93-111, bivariateskewnormal.py:222-293)."""

import numpy as np
import jax
import jax.numpy as jnp
import scipy.linalg
from scipy.stats import multivariate_normal as scipy_mvn
from scipy.stats import norm as scipy_norm
from scipy.stats import skewnorm

from contouring_uncertainty_tpu.distributions import bvn, bsn
from contouring_uncertainty_tpu.distributions import linalg as L


def _rng(seed=42):
    return np.random.default_rng(seed)


def _random_cov(n=1, seed=42):
    a = _rng(seed).normal(size=(n, 2, 2))
    return a @ a.transpose(0, 2, 1) + 0.7 * np.eye(2)


# --- linalg ----------------------------------------------------------------------

def test_eigh2x2_matches_numpy():
    covs = _random_cov(50)
    vals, vecs = L.eigh2x2(jnp.asarray(covs))
    ref_vals, _ = np.linalg.eigh(covs)
    np.testing.assert_allclose(np.asarray(vals), ref_vals, rtol=1e-5, atol=1e-6)
    # Reconstruction check (eigvec conventions may differ by sign).
    rec = np.einsum("nij,nj,nkj->nik", np.asarray(vecs), np.asarray(vals), np.asarray(vecs))
    np.testing.assert_allclose(rec, covs, rtol=1e-3, atol=1e-4)


def test_sym_matrix_pow_matches_scipy():
    covs = _random_cov(10)
    for p in (-0.5, 0.5, -1.0):
        got = np.asarray(L.sym_matrix_pow(jnp.asarray(covs), p))
        for i in range(len(covs)):
            ref = scipy.linalg.fractional_matrix_power(covs[i], p).real
            np.testing.assert_allclose(got[i], ref, rtol=1e-4, atol=1e-5)


def test_chol2x2_matches_numpy():
    covs = _random_cov(20)
    got = np.asarray(L.chol2x2(jnp.asarray(covs)))
    ref = np.linalg.cholesky(covs)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_inv2x2():
    covs = _random_cov(20)
    got = np.asarray(L.inv2x2(jnp.asarray(covs)))
    np.testing.assert_allclose(got, np.linalg.inv(covs), rtol=1e-4, atol=1e-5)


def test_rotate_cov():
    cov = np.array([[4.0, 1.0], [1.0, 2.0]])
    th = 0.7
    rot = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    np.testing.assert_allclose(
        np.asarray(L.rotate_cov(jnp.asarray(cov), th)), rot @ cov @ rot.T, rtol=1e-5
    )


# --- bivariate normal ------------------------------------------------------------

def test_bvn_logpdf_matches_scipy():
    covs = _random_cov(5, seed=7)
    mus = _rng(8).normal(size=(5, 2)) * 3
    xs = _rng(9).normal(size=(5, 2)) * 3
    got = np.asarray(bvn.logpdf(jnp.asarray(xs), jnp.asarray(mus), jnp.asarray(covs)))
    for i in range(5):
        ref = scipy_mvn(mus[i], covs[i]).logpdf(xs[i])
        np.testing.assert_allclose(got[i], ref, rtol=1e-5)


def test_bvn_marginal_and_conditional():
    cov = np.array([[25.0, 4.0], [4.0, 50.0]])
    mu = np.array([100.0, 100.0])
    m, v = bvn.marginal(jnp.asarray(mu), jnp.asarray(cov), axis=0)
    assert float(m) == 100.0 and abs(float(v) - 25.0) < 1e-5
    # Conditional variance along x-axis (angle 0) is det/yy = sigma_x^2 (1 - rho^2).
    cv = float(bvn.conditional_variance(jnp.asarray(cov), jnp.asarray(0.0)))
    np.testing.assert_allclose(cv, np.linalg.det(cov) / cov[1, 1], rtol=1e-5)


def test_bvn_rvs_moments():
    cov = np.array([[4.0, 1.5], [1.5, 3.0]])
    mu = np.array([2.0, -1.0])
    s = bvn.rvs(jax.random.key(0), jnp.asarray(mu), jnp.asarray(cov), shape=(20000,))
    s = np.asarray(s)
    np.testing.assert_allclose(s.mean(0), mu, atol=0.05)
    np.testing.assert_allclose(np.cov(s.T), cov, atol=0.15)


# --- bivariate skew-normal -------------------------------------------------------

def _oracle_bsn_pdf(x, mu, cov, alpha):
    """2 phi2(x) Phi(alpha^T cov^{-1/2} (x-mu)) via scipy, vectorized over rows."""
    inv_sqrt = scipy.linalg.fractional_matrix_power(cov, -0.5).real
    z = (x - mu) @ inv_sqrt.T
    return 2 * scipy_mvn(mu, cov).pdf(x) * scipy_norm.cdf(z @ alpha)


def test_bsn_pdf_matches_scipy_oracle():
    mu = np.array([0.5, -0.2])
    cov = np.array([[2.0, 0.5], [0.5, 2.0]])
    alpha = np.array([5.0, 1.0])
    xs = _rng(10).normal(size=(200, 2)) * 2
    got = np.asarray(bsn.pdf(jnp.asarray(xs), jnp.asarray(mu), jnp.asarray(cov), jnp.asarray(alpha)))
    ref = _oracle_bsn_pdf(xs, mu, cov, alpha)
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-7)


def test_bsn_pdf_integrates_to_one():
    mu = np.array([0.0, 0.0])
    cov = np.array([[1.5, -0.4], [-0.4, 1.0]])
    alpha = np.array([3.0, -2.0])
    g = np.linspace(-8, 8, 400)
    X, Y = np.meshgrid(g, g)
    pts = np.stack([X.ravel(), Y.ravel()], -1)
    p = np.asarray(bsn.pdf(jnp.asarray(pts), jnp.asarray(mu), jnp.asarray(cov), jnp.asarray(alpha)))
    integral = p.sum() * (g[1] - g[0]) ** 2
    np.testing.assert_allclose(integral, 1.0, atol=1e-3)


def test_bsn_nll_terms():
    mu = np.array([1.0, 2.0])
    cov = np.array([[3.0, 0.5], [0.5, 2.0]])
    alpha = np.array([2.0, -1.0])
    y = np.array([1.5, 1.0])
    loss, logdet, maha, term3 = bsn.nll(
        jnp.asarray(y), jnp.asarray(mu), jnp.asarray(cov), jnp.asarray(alpha)
    )
    ref_logdet = np.log(np.linalg.det(cov))
    d = (mu - y)[:, None]
    ref_maha = float(d.T @ np.linalg.inv(cov) @ d)
    inv_sqrt = scipy.linalg.fractional_matrix_power(cov, -0.5).real
    ref_t3 = np.log(scipy_norm.cdf(alpha @ inv_sqrt @ (y - mu)) + 1e-7)
    np.testing.assert_allclose(float(logdet), ref_logdet, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(float(maha), ref_maha, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(float(term3), ref_t3, rtol=1e-4)
    np.testing.assert_allclose(
        float(loss), 0.5 * ref_logdet + 0.5 * ref_maha - ref_t3, rtol=1e-4
    )


def test_bsn_univariate_mode_matches_numerical():
    loc, scale, alpha = 3.0, 2.0, 3.0
    x = np.linspace(-5, 10, 20001)
    numerical = x[skewnorm.pdf(x, alpha, loc, scale).argmax()]
    got = float(bsn.univariate_mode(jnp.asarray(loc), jnp.asarray(scale), jnp.asarray(alpha)))
    assert abs(got - numerical) < 0.05


def test_bsn_bivariate_mode_matches_numerical():
    mu = np.array([100.0, 150.0])
    cov = np.array([[10.0, -5.0], [-5.0, 10.0]])
    alpha = np.array([5.0, 0.0])
    g = np.linspace(90, 160, 701)
    X, Y = np.meshgrid(g, g)
    pts = np.stack([X.ravel(), Y.ravel()], -1)
    p = np.asarray(bsn.pdf(jnp.asarray(pts), jnp.asarray(mu), jnp.asarray(cov), jnp.asarray(alpha)))
    iy, ix = np.unravel_index(p.reshape(X.shape).argmax(), X.shape)
    numerical = np.array([X[iy, ix], Y[iy, ix]])
    got = np.asarray(bsn.mode(jnp.asarray(mu), jnp.asarray(cov), jnp.asarray(alpha)))
    np.testing.assert_allclose(got, numerical, atol=0.5)


def test_bsn_marginal_matches_numerical_integration():
    # Diagonal cov + alpha=[3,0] so the reference's y-flip quirk is inert.
    mu = np.array([1.0, -2.0])
    cov = np.array([[4.0, 0.0], [0.0, 9.0]])
    alpha = np.array([3.0, 0.0])
    m, v, a = bsn.marginal(jnp.asarray(mu), jnp.asarray(cov), jnp.asarray(alpha), axis=0)
    xs = np.linspace(-10, 12, 301)
    ys = np.linspace(-25, 21, 2001)
    X, Y = np.meshgrid(xs, ys, indexing="ij")
    pts = np.stack([X.ravel(), Y.ravel()], -1)
    p = np.asarray(bsn.pdf(jnp.asarray(pts), jnp.asarray(mu), jnp.asarray(cov), jnp.asarray(alpha)))
    marg = p.reshape(X.shape).sum(1) * (ys[1] - ys[0])
    ref = skewnorm.pdf(xs, float(a), float(m), np.sqrt(float(v)))
    np.testing.assert_allclose(marg, ref, atol=2e-3)


def test_bsn_rvs_mean_matches_theory():
    # For the sampled law 2 phi2 Phi(alpha^T (x-mu)): E[x] = mu + sqrt(2/pi) delta,
    # delta = cov alpha / sqrt(1 + alpha^T cov alpha).
    mu = np.array([1.0, 2.0])
    cov = np.array([[2.0, 0.6], [0.6, 1.5]])
    alpha = np.array([3.0, -1.0])
    s = np.asarray(
        bsn.rvs(jax.random.key(1), jnp.asarray(mu), jnp.asarray(cov), jnp.asarray(alpha), shape=(40000,))
    )
    delta = cov @ alpha / np.sqrt(1 + alpha @ cov @ alpha)
    expected = mu + np.sqrt(2 / np.pi) * delta
    np.testing.assert_allclose(s.mean(0), expected, atol=0.03)
    # Covariance of the skew-normal: cov - (2/pi) delta delta^T.
    np.testing.assert_allclose(np.cov(s.T), cov - 2 / np.pi * np.outer(delta, delta), atol=0.06)


def test_bsn_rvs_consistent_matches_logpdf_mean():
    # Sampler consistent with logpdf: E[x] = mu + sqrt(2/pi) Sigma^(1/2) alpha/sqrt(1+|alpha|^2).
    mu = np.array([0.0, 0.0])
    cov = np.array([[2.0, 0.5], [0.5, 1.0]])
    alpha = np.array([4.0, 0.0])
    s = np.asarray(
        bsn.rvs_consistent(
            jax.random.key(2), jnp.asarray(mu), jnp.asarray(cov), jnp.asarray(alpha), shape=(40000,)
        )
    )
    sqrt_cov = scipy.linalg.fractional_matrix_power(cov, 0.5).real
    dz = alpha / np.sqrt(1 + alpha @ alpha)
    expected = mu + np.sqrt(2 / np.pi) * sqrt_cov @ dz
    np.testing.assert_allclose(s.mean(0), expected, atol=0.03)


def test_bsn_rvs_product_matches_dense_oracle():
    """rvs_product draws p(x) ∝ phi2(x; mu_f, cov_f) Phi(w^T (x - mu_ref))
    exactly (extended skew-normal via a truncated-normal latent). Oracle: a
    dense-lattice categorical draw of the same density with numpy/scipy —
    mean, covariance, and per-axis skewness must agree to MC tolerance."""
    rng = np.random.default_rng(0)
    mu_p = np.array([-0.4, 0.3])
    cov_p = np.array([[1.3, 0.4], [0.4, 0.9]])
    mu_g = np.array([0.2, -0.1])
    cov_g = np.array([[0.8, -0.2], [-0.2, 1.1]])
    alpha = np.array([2.5, -1.5])

    # Merge the Gaussian factors; whitened skew direction w = cov_p^{-1/2} a.
    w = np.linalg.inv(scipy.linalg.fractional_matrix_power(cov_p, 0.5).real) @ alpha
    p1, p2 = np.linalg.inv(cov_p), np.linalg.inv(cov_g)
    cov_f = np.linalg.inv(p1 + p2)
    mu_f = cov_f @ (p1 @ mu_p + p2 @ mu_g)

    # Dense-lattice reference draw.
    g = np.linspace(-6, 6, 300)
    X, Y = np.meshgrid(g, g, indexing="ij")
    pts = np.stack([X.ravel(), Y.ravel()], -1)
    d = pts - mu_f
    logits = (
        -0.5 * np.einsum("ni,ij,nj->n", d, np.linalg.inv(cov_f), d)
        + scipy_norm.logcdf(pts @ w - w @ mu_p)
    )
    prob = np.exp(logits - logits.max())
    prob /= prob.sum()
    n = 100_000
    idx = rng.choice(len(pts), size=n, p=prob)
    cell = g[1] - g[0]
    ref = pts[idx] + rng.uniform(-cell / 2, cell / 2, size=(n, 2))

    s = np.asarray(bsn.rvs_product(
        jax.random.key(3), jnp.asarray(mu_f, jnp.float32),
        jnp.asarray(cov_f, jnp.float32), jnp.asarray(w, jnp.float32),
        jnp.asarray(mu_p, jnp.float32), shape=(n,),
    ))
    assert np.isfinite(s).all()
    np.testing.assert_allclose(s.mean(0), ref.mean(0), atol=0.02)
    np.testing.assert_allclose(np.cov(s.T), np.cov(ref.T), atol=0.03)

    def skewness(x):
        dd = x - x.mean(0)
        return (dd**3).mean(0) / x.std(0) ** 3

    np.testing.assert_allclose(skewness(s), skewness(ref), atol=0.06)


def test_bsn_rvs_product_zero_skew_is_gaussian():
    """w = 0 must reduce rvs_product to a plain N(mu_f, cov_f) draw."""
    mu_f = np.array([1.0, -2.0])
    cov_f = np.array([[2.0, 0.7], [0.7, 1.4]])
    s = np.asarray(bsn.rvs_product(
        jax.random.key(5), jnp.asarray(mu_f, jnp.float32),
        jnp.asarray(cov_f, jnp.float32), jnp.zeros(2, jnp.float32),
        jnp.zeros(2, jnp.float32), shape=(40_000,),
    ))
    np.testing.assert_allclose(s.mean(0), mu_f, atol=0.03)
    np.testing.assert_allclose(np.cov(s.T), cov_f, atol=0.05)
