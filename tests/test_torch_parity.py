"""Numerical parity against a torch implementation of the reference math.

BASELINE.md's parity gate is 'Dice & per-point NLL within 1% of the torch
reference'. The reference itself cannot run here (hydra/lightning absent), so
these tests re-express its exact formulas in torch
(task/regression/dsnt/utils.py:7-118, dsnt_al.py:64-71,
bivariateskewnormal.py:51-61) and check our JAX ops match well inside 1%.
"""

import numpy as np
import torch
import jax.numpy as jnp

from contouring_uncertainty_tpu.ops import dsnt as D
from contouring_uncertainty_tpu.ops import coords as Cc
from contouring_uncertainty_tpu.distributions import bsn


def _torch_dsnt(heatmaps: torch.Tensor):
    """Reference DSNT (dsnt/utils.py:7-47): explicit grid inner products."""
    size = heatmaps.shape[-1]
    first = -(size - 1.0) / size
    lin = torch.arange(size, dtype=heatmaps.dtype) * (2.0 / size) + first
    X = lin[None].repeat(size, 1)
    Y = X.t()
    X = X[None, None]
    Y = Y[None, None]
    flat = heatmaps.flatten(-2)
    x = torch.inner(flat, X.flatten(-2)).squeeze(-1).squeeze(-1)
    y = torch.inner(flat, Y.flatten(-2)).squeeze(-1).squeeze(-1)
    xb = x[..., None, None]
    yb = y[..., None, None]
    var_x = (flat * ((X - xb) ** 2).flatten(-2)).sum(-1)
    var_y = (flat * ((Y - yb) ** 2).flatten(-2)).sum(-1)
    covar = (flat * ((X - xb) * (Y - yb)).flatten(-2)).sum(-1)
    return torch.stack([x, y], -1), torch.stack([var_x, var_y], -1), covar


def _torch_pixel_gaussians(logits: torch.Tensor, covar: bool = True):
    """Reference dsnt_al.py:45-71 scaling chain."""
    n, k, h, w = logits.shape
    flat = torch.nn.functional.softmax(logits.reshape(n, k, -1), -1).reshape(n, k, h, w)
    coords, var, cov = _torch_dsnt(flat.double())
    size = torch.tensor([float(w), float(h)])
    pixel = 0.5 * ((coords + 1) * size - 1)
    pv = var * (w / 2.0) ** 2
    pc = (cov if covar else torch.zeros_like(cov)) * (w / 2.0) ** 2
    sigma = torch.zeros(n, k, 2, 2, dtype=torch.float64)
    sigma[..., 0, 0] = pv[..., 0]
    sigma[..., 1, 1] = pv[..., 1]
    sigma[..., 0, 1] = pc
    sigma[..., 1, 0] = pc
    return pixel, sigma


def test_dsnt_pipeline_matches_torch_reference():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(3, 21, 64, 64)).astype(np.float32) * 2
    t_mu, t_sigma = _torch_pixel_gaussians(torch.tensor(logits))
    _, j_mu, j_sigma = D.heatmaps_to_pixel_gaussians(jnp.asarray(logits))
    np.testing.assert_allclose(np.asarray(j_mu), t_mu.numpy(), atol=5e-3)
    # Variance floor (1e-2) only matters for collapsed heatmaps; these aren't.
    np.testing.assert_allclose(np.asarray(j_sigma), t_sigma.numpy(), rtol=5e-3, atol=2e-2)


def test_gaussian_nll_loss_matches_torch_reference():
    """Loss parity (dsnt_al.py:64-71): log det Sigma + Mahalanobis."""
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(4, 21, 64, 64)).astype(np.float32) * 2
    y = rng.uniform(10, 54, size=(4, 21, 2)).astype(np.float32)

    t_mu, t_sigma = _torch_pixel_gaussians(torch.tensor(logits))
    t_y = torch.tensor(y, dtype=torch.float64)
    mu_flat = t_mu.flatten(0, 1).unsqueeze(-1)
    y_flat = t_y.flatten(0, 1).unsqueeze(-1)
    s_flat = t_sigma.flatten(0, 1)
    term1 = torch.log(torch.det(s_flat))
    term2 = ((mu_flat - y_flat).transpose(-1, -2) @ torch.inverse(s_flat)) @ (mu_flat - y_flat)
    torch_loss = (term1 + term2.squeeze()).mean().item()

    _, j_mu, j_sigma = D.heatmaps_to_pixel_gaussians(jnp.asarray(logits))
    loss, _, _ = D.gaussian_nll(j_mu, j_sigma, jnp.asarray(y))
    jax_loss = float(loss.mean())
    assert abs(jax_loss - torch_loss) / abs(torch_loss) < 0.01, (jax_loss, torch_loss)


def test_skew_nll_matches_torch_reference():
    """Skew NLL parity (bivariateskewnormal.py:51-61) using torch linalg for
    the matrix inverse square root."""
    rng = np.random.default_rng(2)
    mu = torch.tensor(rng.normal(size=(50, 2)) * 3)
    y = torch.tensor(rng.normal(size=(50, 2)) * 3)
    a_mat = torch.tensor(rng.normal(size=(50, 2, 2)))
    cov = a_mat @ a_mat.transpose(-1, -2) + 2 * torch.eye(2)
    alpha = torch.tensor(rng.normal(size=(50, 2)) * 2)

    term1 = torch.log(torch.det(cov))
    diff = (mu - y).unsqueeze(-1)
    term2 = (diff.transpose(-1, -2) @ torch.inverse(cov) @ diff).squeeze()
    # Sigma^(-1/2) via eigendecomposition (reference batch_matrix_pow).
    vals, vecs = torch.linalg.eigh(cov)
    inv_sqrt = vecs @ torch.diag_embed(vals.pow(-0.5)) @ vecs.transpose(-1, -2)
    x_aff = (alpha.unsqueeze(1) @ inv_sqrt @ (y - mu).unsqueeze(-1)).squeeze()
    term3 = torch.log(0.5 * (1 + torch.erf(x_aff / np.sqrt(2))) + 1e-7)
    torch_nll = (0.5 * term1 + 0.5 * term2 - term3).numpy()

    loss, _, _, _ = bsn.nll(
        jnp.asarray(y.numpy(), jnp.float32), jnp.asarray(mu.numpy(), jnp.float32),
        jnp.asarray(cov.numpy(), jnp.float32), jnp.asarray(alpha.numpy(), jnp.float32),
    )
    # Strict parity where Phi is not in the deep tail. In the tail the f32
    # granularity of (1 + erf) near 0 makes log(Phi + 1e-7) quantize in ANY
    # f32 implementation (the torch reference trains in f32 too) — there both
    # implementations sit within the same log(1e-7) floor band.
    x_aff_np = x_aff.numpy()
    bulk = x_aff_np > -4.0
    got = np.asarray(loss)
    np.testing.assert_allclose(got[bulk], torch_nll[bulk], rtol=1e-3, atol=1e-3)
    assert np.abs(got[bulk] - torch_nll[bulk]).mean() / np.abs(torch_nll[bulk]).mean() < 0.01
    # Tail: both bounded by the epsilon floor, within ~|log(1e-7)| band.
    tail = ~bulk
    if tail.any():
        assert np.all(np.abs(got[tail] - torch_nll[tail]) < 2.0)


def test_skew_rvs_population_matches_torch_reference_sampler():
    """Statistical parity of the skew sampler with the reference rvs_fast
    (bivariateskewnormal.py:159-191), reimplemented in torch."""
    mu = torch.tensor([1.0, 2.0])
    cov = torch.tensor([[2.0, 0.6], [0.6, 1.5]])
    alpha = torch.tensor([3.0, -1.0])
    torch.manual_seed(0)

    a_cov_a = alpha @ cov @ alpha
    delta = (1 / torch.sqrt(1 + a_cov_a)) * cov @ alpha
    cov_star = torch.zeros((3, 3))
    cov_star[0, 0] = 1
    cov_star[1:, 0] = delta
    cov_star[0, 1:] = delta
    cov_star[1:, 1:] = cov
    x = torch.distributions.MultivariateNormal(torch.zeros(3), cov_star).sample((60000,))
    x0, x1 = x[:, 0], x[:, 1:]
    x1[x0 <= 0] = -x1[x0 <= 0]
    t_samples = (x1 + mu[None]).numpy()

    import jax

    j_samples = np.asarray(bsn.rvs(
        jax.random.key(0), jnp.asarray(mu.numpy()), jnp.asarray(cov.numpy()),
        jnp.asarray(alpha.numpy()), shape=(60000,),
    ))
    np.testing.assert_allclose(j_samples.mean(0), t_samples.mean(0), atol=0.03)
    np.testing.assert_allclose(np.cov(j_samples.T), np.cov(t_samples.T), atol=0.05)
    # Higher moment: per-axis skewness.
    from scipy.stats import skew as sp_skew

    np.testing.assert_allclose(sp_skew(j_samples), sp_skew(t_samples), atol=0.05)
