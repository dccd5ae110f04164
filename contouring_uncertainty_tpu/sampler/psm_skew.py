"""Skew posterior-shape-model sampler: grid-product sampling on device.

Capability parity with the reference SkewPosteriorShapeModelSampler
(sampler/posterior_shape_model/psm_skew.py:162-420): initial landmarks drawn
from the predicted bivariate skew-normals (alpha y-flipped), then per level
each *skew* point is drawn from the pointwise product of its predicted
skew-normal pdf and the PSM posterior Gaussian evaluated on a 256x256 grid
(categorical draw), while non-skew points use the Gaussian product fusion;
remaining points fill from the posterior mean.

TPU-first (SURVEY §2.6 #3): two methods, both fully vmapped over
(samples x batch) — the reference looped points x samples in Python with
torch.multinomial per point and a try/except fallback to mu.

- ``method="esn"`` (default): the product of the predicted skew-normal and
  the posterior Gaussian is itself an *extended skew-normal* (merge the two
  Gaussian factors; the leftover Phi term is an ESN tilt), which
  bsn.rvs_product draws EXACTLY in closed form via a truncated-normal
  latent — no lattice, no window, no tail truncation, O(1) transcendentals
  per point instead of O(W^2) lattice evaluations (round-3 trace: the grid
  categorical alone cost 17 ms/view at the TMI budget). Distributional
  equivalence with the grid draw is gated by
  tests/test_skew_sequence_samplers.py::test_esn_matches_grid_product.
- ``method="grid"``: reference-parity lattice draw — the grid product is
  computed in log space for all S skew points at once ((S, W^2) logits +
  one categorical per point, a static gather at skew_indices — skew5/skew9
  configs pay 5/21 or 9/21 of the full grid work). The categorical runs
  over a WINDOW of the pixel grid (default 64x64, same integer cell centers
  as the reference's full 256x256 grid) centered on the Gaussian-product
  fusion mean of each point: the product's mass lives within a few sigma of
  that center (posterior sigmas are a handful of pixels), so the truncated
  tails carry ~e^-hundreds of probability while the per-sample grid work
  drops 16x (profiled 362 -> 273 ms/view at the TMI predict budget). Set
  grid_window=grid_size to recover the exact full-grid draw.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from contouring_uncertainty_tpu.distributions import bsn, bvn, linalg
from contouring_uncertainty_tpu.sampler import prior as prior_lib
from contouring_uncertainty_tpu.sampler.prior import ShapePrior
from contouring_uncertainty_tpu.sampler.psm import PosteriorShapeModelSampler, merge_priors


class SkewPosteriorShapeModelSampler(PosteriorShapeModelSampler):
    def __init__(self, prior: ShapePrior, levels: int = 3,
                 skew_indices: Optional[List[int]] = None,
                 grid_size: int = 256, image_extent: float = 255.0,
                 grid_window: Optional[int] = 64, method: str = "esn",
                 **kwargs):
        if method not in ("esn", "grid"):
            raise ValueError(f"method must be 'esn' or 'grid', got {method!r}")
        super().__init__(prior, levels=levels, **kwargs)
        self._method = method
        skew_indices = list(range(self.k)) if skew_indices is None else list(skew_indices)
        # Static positions of the skew points: the grid-product categorical
        # (the expensive part — (S, W^2) fused logpdf evals per level) only
        # runs at these indices instead of all K. For the reference's skew5/
        # skew9 configs that is a 4.2x/2.3x cut in grid work; for the default
        # all-points config it is the identity. Static index array => static
        # shapes under jit.
        self._skew_idx = jnp.asarray(
            np.sort(np.unique(np.asarray(skew_indices, np.int32)))
        )
        self._extent = float(image_extent)
        self._step = image_extent / (grid_size - 1)  # grid cell pitch
        # Window sizing against silent truncation, two layers:
        # (a) STATIC cell count from the fixed-prior posterior bound
        #     (sigma_l^2 Q A^-1 Q^T — depends only on level masks, prior Q,
        #     level sigma). grid_window=None derives the count from it; an
        #     explicit window smaller than the bound warns once.
        # (b) ADAPTIVE per-point pitch at sample time: the per-prediction
        #     re-fit factor [F0|d] can inflate the posterior sigma ~||d||
        #     for OOD predictions (coordinates the static bound cannot see),
        #     so each point's lattice pitch is widened to
        #     max(step, 6 sigma_fused / (W-1)) — the window always spans
        #     >= 6 fused sigmas. Healthy predictions keep the exact global
        #     pitch (bit-identical to the full-grid draw's lattice); only a
        #     blown-up point trades lattice resolution (still W cells across
        #     6 sigma) for zero tail truncation.
        max_std_px = self._posterior_std_bound_px()
        needed = int(np.ceil(6.0 * max_std_px / self._step)) + 1
        if grid_window is None:
            w = min(max(needed, 32), int(grid_size))
        else:
            w = min(int(grid_window), int(grid_size))
            if w < min(needed, int(grid_size)) and method == "grid":
                import warnings

                warnings.warn(
                    f"SkewPSM grid_window={w} covers less than 6 prior sigmas "
                    f"({max_std_px:.1f} px max marginal prior std needs "
                    f"~{needed} cells): grid-product samples may truncate "
                    "tail mass. Pass grid_window=None to auto-size, or "
                    "grid_window=grid_size for the exact full-grid draw.",
                    stacklevel=2,
                )
        self._window = w
        ax = jnp.arange(w, dtype=jnp.float32)  # cell units; scaled per point
        gx, gy = jnp.meshgrid(ax, ax, indexing="ij")
        self._wgrid = jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)  # (W^2, 2)

    def _posterior_std_bound_px(self) -> float:
        """Max per-coordinate posterior std (pixels) over all sampling levels,
        computed with the default prior Q (the per-prediction re-fit perturbs
        Q only mildly). cov_c = sigma_l^2 Q (Q_g^T Q_g + sigma_l^2 I)^-1 Q^T."""
        q = np.asarray(self.prior.q, np.float64)
        scale = np.asarray(self.prior.train_scale, np.float64)
        p = q.shape[0]
        worst = 0.0
        for mask, sigma2 in zip(
            [np.asarray(m) for m in self._level_masks], self.sigmas
        ):
            q_g = q * mask[:, None]
            a = q_g.T @ q_g + float(sigma2) * np.eye(p)
            cov = float(sigma2) * q @ np.linalg.solve(a, q.T)
            std_px = np.sqrt(np.maximum(np.diagonal(cov), 0.0)) * scale
            worst = max(worst, float(std_px.max()))
        return worst

    def _point_steps(self, cov_fuse):
        """(..., 1) per-point lattice pitch: the global grid pitch, widened
        where the fused covariance needs more span than the static window
        provides (layer (b) above). sigma bound = sqrt(max diag)."""
        sig = jnp.sqrt(jnp.maximum(
            jnp.maximum(cov_fuse[..., 0, 0], cov_fuse[..., 1, 1]), 0.0))
        return jnp.maximum(self._step,
                           6.0 * sig / (self._window - 1))[:, None]

    def _window_offsets(self, centers, steps):
        """(..., 2) window origins on the global grid lattice, centered on the
        per-point product-fusion means and clipped inside the image.
        `steps` (..., 1) is the per-point pitch from `_point_steps`."""
        half = (self._window - 1) / 2.0 * steps
        lo = jnp.zeros((), jnp.float32)
        hi = jnp.maximum(self._extent - (self._window - 1) * steps, 0.0)
        snapped = jnp.round((centers - half) / self._step) * self._step
        return jnp.clip(snapped, lo, hi)

    def _sample_one_skew(self, key, mu_p, cov_p, alpha_f, mu_t, d):
        keys = jax.random.split(key, 2 * len(self._level_points) + 1)
        contour = jnp.zeros_like(mu_p)

        s0 = bsn.rvs(keys[0], mu_p, cov_p, alpha_f)
        init_mask = jnp.zeros(self.k, bool).at[self._initial].set(True)
        contour = jnp.where(init_mask[:, None], s0, contour)

        for i, points in enumerate(self._level_points):
            mu_c, cov_c = self._posterior_points(
                contour, self._ops[i], mu_t, d
            )
            # Gaussian path (non-skew points).
            mu_fuse, cov_fuse = merge_priors(mu_p, cov_p, mu_c, cov_c)
            s_gauss = bvn.rvs(keys[2 * i + 1], mu_fuse, cov_fuse)
            # Skew-product path (skew points only — static gather at
            # self._skew_idx). The target law is the product of the predicted
            # skew-normal and the PSM posterior Gaussian; with the Gaussian
            # factors merged (mu_fuse, cov_fuse, already computed above) it
            # is exactly an extended skew-normal, so the default 'esn' method
            # draws it in closed form (bsn.rvs_product — O(1) transcendentals
            # per point instead of a W^2-cell lattice; round-3 trace: the
            # grid categorical cost 17 ms/view at the TMI budget).
            si = self._skew_idx
            if self._method == "esn":
                w = linalg.mat2_vec(
                    linalg.sym_matrix_pow(cov_p[si], -0.5), alpha_f[si]
                )  # whitened skew direction Sigma^{-1/2} alpha (bsn.logpdf)
                s_skew = bsn.rvs_product(
                    keys[2 * i + 2], mu_fuse[si], cov_fuse[si], w, mu_p[si]
                )
            else:
                # 'grid': reference-parity categorical over a pixel-grid
                # window around each point's fusion mean. The window
                # coordinates are (re)derived inside the fused logpdf
                # computation and the drawn point is reconstructed from the
                # index arithmetically — materializing an (S, W^2, 2) grid
                # tensor would batch to tens of GB under the (T_e x T_a)
                # sample vmaps.
                steps = self._point_steps(cov_fuse[si])  # (S, 1) pitch
                offs = self._window_offsets(mu_fuse[si], steps)  # (S, 2)

                def point_logits(off, st, m, c, a, mc, cc):
                    g = off[None, :] + self._wgrid * st  # (W^2, 2) fused
                    return bsn.logpdf(g, m, c, a) + bvn.logpdf(g, mc, cc)

                logits = jax.vmap(point_logits)(
                    offs, steps, mu_p[si], cov_p[si], alpha_f[si],
                    mu_c[si], cov_c[si]
                )  # (S, W^2)
                idx = jax.random.categorical(
                    keys[2 * i + 2], logits, axis=-1)  # (S,)
                sub = jnp.stack(
                    [idx // self._window, idx % self._window], axis=-1)
                s_skew = offs + sub.astype(offs.dtype) * steps
            s = s_gauss.at[si].set(s_skew)

            lvl_mask = jnp.zeros(self.k, bool).at[points].set(True)
            contour = jnp.where(lvl_mask[:, None], s, contour)

        mu_c, _ = self._posterior_points(contour, self._op_final, mu_t, d)
        return jnp.where(self._sampled_all[:, None] > 0, contour, mu_c)

    def __call__(self, key: jax.Array, mu: jnp.ndarray, cov: jnp.ndarray,
                 alpha: Optional[jnp.ndarray] = None, n: int = 1) -> jnp.ndarray:
        assert alpha is not None, "SkewPSM requires alpha"
        # Reference flips the y component once up front (psm_skew.py:231).
        alpha_f = alpha * jnp.asarray([1.0, -1.0], alpha.dtype)
        mu_t = prior_lib.transform(self.prior, mu).reshape(-1)
        d = prior_lib.refit_d(self.prior, mu_t)
        keys = jax.random.split(key, n)
        return jax.vmap(
            lambda k: self._sample_one_skew(k, mu, cov, alpha_f, mu_t, d)
        )(keys)

    def sample_batch(self, key, mu, cov, alpha=None, n: int = 1):
        assert alpha is not None
        lead = mu.shape[:-2]
        flat_mu = mu.reshape((-1,) + mu.shape[-2:])
        flat_cov = cov.reshape((-1,) + cov.shape[-3:])
        flat_alpha = alpha.reshape((-1,) + alpha.shape[-2:])
        keys = jax.random.split(key, flat_mu.shape[0])
        out = jax.vmap(lambda k, m, c, a: self(k, m, c, a, n))(
            keys, flat_mu, flat_cov, flat_alpha
        )
        return out.reshape(lead + (n, self.k, 2))
