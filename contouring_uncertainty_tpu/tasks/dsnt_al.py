"""DSNT-AL task: U-Net heatmaps -> DSNT -> per-point bivariate Gaussian NLL.

Capability parity with the reference DSNTAleatoric
(contour_uncertainty/task/regression/dsnt/dsnt_al.py:17-151): same loss
(log|Sigma| + Mahalanobis, weighted — :64-71), same pixel-space scaling, same
validation Dice via linear contour reconstruction (:80-87) — except the
reconstruction runs on device through the scanline rasterizer instead of a
per-image host loop.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from contouring_uncertainty_tpu.data.config import DataParams, Label, Tags
from contouring_uncertainty_tpu.models.unet import UNet
from contouring_uncertainty_tpu.ops import dsnt as dsnt_ops
from contouring_uncertainty_tpu.ops.rasterize import rasterize_batch
from contouring_uncertainty_tpu.utils.metrics import dice_binary


def regression_gaussians(mu, sigma_params, use_covar: bool = True):
    """Per-point bivariate Gaussians from a coordinate-regression head.

    The standalone Resnet backbone (reference models/resnet.py:196-225)
    outputs landmark coordinates (N, K, 2) directly plus `sigma_out`
    uncertainty parameters per point (:181-188) instead of DSNT heatmaps.
    Parameterization: (log sigma_x, log sigma_y[, atanh-rho logit]) ->
    the same (mu, 2x2 cov) contract `logits_to_pixel_gaussians` provides,
    so the aleatoric NLL and the whole predict pipeline are shared.
    """
    log_s = jnp.clip(sigma_params[..., :2], -6.0, 8.0)
    sx, sy = jnp.exp(log_s[..., 0]), jnp.exp(log_s[..., 1])
    if use_covar and sigma_params.shape[-1] >= 3:
        rho = 0.99 * jnp.tanh(sigma_params[..., 2])
    else:
        rho = jnp.zeros_like(sx)
    off = rho * sx * sy
    cov = jnp.stack(
        [jnp.stack([sx * sx, off], axis=-1),
         jnp.stack([off, sy * sy], axis=-1)],
        axis=-2,
    )
    return mu, cov


def mc_dropout_apply(model, variables, img, t_e, key, mesh=None):
    """One batched MC-dropout forward at batch T_e*N -> raw output dict,
    T_e-major ordering (sample e of frame i at batch index e*N + i).

    `mesh` (optional) shards the T_e*N batch axis of the stochastic tail
    across the mesh's data axis (parallel/serving.py constrain_sample_axis)
    — the single-view LATENCY serving mode: post prefix-sharing the MC
    forward is the dominant per-view cost, and without a constraint GSPMD
    replicates it on every chip while only the later T_a sample axis is
    partitioned. Instance norm is per-sample and every op below is
    batch-elementwise, so the tail partitions with no collectives until the
    downstream epistemic fusion touches all T_e (tiny (K, 2) tensors). The
    bf16 Pallas DSNT head is the one op GSPMD cannot partition (it gathers
    the logits first); the f32 default predict head shards clean.

    For a UNet backbone with `drop_block`, the deterministic encoder prefix
    (stem + every stage before the first dropout — the FLOP-heavy
    high-resolution stages) is computed ONCE at batch N and tiled across the
    T_e epistemic samples; only the stochastic tail runs at batch T_e*N.
    Algorithmically exact vs tiling the input (the prefix has no dropout,
    instance norm is per-sample, and the dropout masks are identical — rng
    folding is by module path, not execution order): CPU test
    (tests/test_tasks.py::test_mc_prefix_sharing_matches_tiled_forward)
    and on-TPU at HIGHEST matmul precision the logits match to 4e-5. At the
    TPU DEFAULT conv precision the batch-2 prefix and batch-20 full forward
    reduce in different orders, the same drift class as view batching
    (measured on-chip, untrained flagship: logits 0.15 max, DSNT mu
    0.031 px, cov 3e-4 of scale — half the accepted predict_batch_views
    tolerance). Measured 1.30x on the flagship epistemic forward on v5e
    (22.8 -> 17.5 ms, interleaved best-of-3).
    Non-UNet backbones fall back to the tiled-input forward.
    """
    from contouring_uncertainty_tpu.parallel.serving import constrain_sample_axis

    shard = lambda a: constrain_sample_axis(a, mesh, 0)
    tile = lambda a: shard(jnp.tile(a, (t_e,) + (1,) * (a.ndim - 1)))
    inner = getattr(model, "unet", model)
    if isinstance(inner, UNet) and inner.drop_block:
        prefix = model.apply(variables, img, mode="encode_prefix")
        tiled = {"skips": [tile(s) for s in prefix["skips"]]}
        return model.apply(
            variables, None, mode="decode_from_prefix", prefix=tiled,
            deterministic=False, rngs={"dropout": key},
        )
    return model.apply(
        variables, tile(img), deterministic=False, rngs={"dropout": key}
    )


@dataclass
class DSNTAleatoric:
    """Config + pure step functions for the DSNT aleatoric contour task."""

    data_params: DataParams
    covar: bool = True
    mse_weight: float = 1.0
    log_penalty_weight: float = 1.0
    t_a: int = 25
    t_e: int = 1
    model_kwargs: Dict[str, Any] = field(default_factory=dict)
    model_name: str = "unet2"
    task_name: str = "dsnt-al"

    def build_model(self):
        from contouring_uncertainty_tpu.models import build_backbone

        c, h, w = self.data_params.in_shape
        k = self.data_params.out_shape[0]
        if self.model_name == "resnet":
            # Coordinate-regression backbone: output (K, 2) landmarks plus a
            # sigma branch sized to the task's covariance parameterization
            # (3 full / 2 diagonal), reference resnet.py:196-225.
            kwargs = dict(self.model_kwargs)
            kwargs.setdefault("sigma_out", 3 if self.covar else 2)
            return build_backbone("resnet", (c, h, w), (k, 2), **kwargs)
        return build_backbone(self.model_name, (c, h, w), (k, h, w), **self.model_kwargs)

    def _gaussians_from_out(self, out):
        """Model output dict -> (mu, cov), for both heatmap (DSNT) and
        coordinate-regression (Resnet sigma head) backbones."""
        o = out["out"]
        if o.ndim == 3:  # (N, K, 2) direct coordinates
            return regression_gaussians(o, out["sigma"], use_covar=self.covar)
        return dsnt_ops.logits_to_pixel_gaussians(o, use_covar=self.covar)

    # ------------------------------------------------------------------- steps

    def forward_gaussians(self, model, variables, img, rng=None, mc_dropout=False):
        """img (N, C, H, W) -> (mu (N,K,2), sigma (N,K,2,2)) in pixel space."""
        kwargs = {}
        if mc_dropout:
            kwargs = dict(deterministic=False, rngs={"dropout": rng})
        return self._gaussians_from_out(model.apply(variables, img, **kwargs))

    def _forward_loss(self, model, variables, batch, rng, train: bool):
        """One forward -> (loss, logs, mu); loss/val share the same pass."""
        img = batch[Tags.img]
        y = batch[Tags.contour]
        kwargs: Dict[str, Any] = dict(train=train)
        if train:
            kwargs["rngs"] = {"dropout": rng}
        out = model.apply(variables, img, **kwargs)
        mu, sigma = self._gaussians_from_out(out)
        point_loss, logdet, maha = dsnt_ops.gaussian_nll(
            mu, sigma, y,
            log_penalty_weight=self.log_penalty_weight,
            mse_weight=self.mse_weight,
        )
        loss = point_loss.mean()
        logs = {
            "loss": loss,
            "distance_loss": dsnt_ops.euclidean_error(mu, y).mean(),
            "loss_term1": (self.log_penalty_weight * logdet).mean(),
            "loss_term2": (self.mse_weight * maha).mean(),
        }
        return loss, logs, mu

    def loss(self, model, variables, batch, rng, train: bool = True):
        loss, logs, _ = self._forward_loss(model, variables, batch, rng, train)
        return loss, logs

    def _mc_apply(self, model, variables, img, t_e, key, mesh=None):
        return mc_dropout_apply(model, variables, img, t_e, key, mesh=mesh)

    def predict(self, model, variables, img, rng=None, mesh=None):
        """Epistemic-sampling forward: (N, C, H, W) -> mu (N, T_e, K, 2),
        cov (N, T_e, K, 2, 2).

        T_e > 1 uses MC-dropout forwards (reference dsnt_al.py:133-151 +
        uncertainty.py:75 patching — here just `deterministic=False` with a
        fresh key per pass). `variables` may be a list for deep ensembles
        (reference uncertainty.py:54-70). `mesh` shards the MC forward's
        batch axis for latency-mode serving (mc_dropout_apply).
        """
        ensemble = variables if isinstance(variables, (list, tuple)) else None
        t_e = len(ensemble) if ensemble else self.t_e
        if ensemble is None and t_e > 1:
            # MC dropout: ONE forward at batch T_e*N instead of T_e sequential
            # batch-N forwards — N is tiny (2 frames/view), so the sequential
            # loop left the MXU idle; flax dropout draws independent masks per
            # batch element, so the tiled pass is statistically identical
            # (different draws for a given key, like any vectorization
            # reordering). The deterministic encoder prefix is shared across
            # the T_e tiles (_mc_apply).
            n = img.shape[0]
            key = rng if rng is not None else jax.random.key(0)
            out = self._mc_apply(model, variables, img, t_e, key, mesh=mesh)
            mu, sigma = self._gaussians_from_out(out)
            mu = mu.reshape((t_e, n) + mu.shape[1:]).swapaxes(0, 1)
            sigma = sigma.reshape((t_e, n) + sigma.shape[1:]).swapaxes(0, 1)
            return mu, sigma
        mus, covs = [], []
        for i in range(t_e):
            v = ensemble[i] if ensemble else variables
            key = jax.random.fold_in(rng, i) if rng is not None else jax.random.key(i)
            mu, sigma = self.forward_gaussians(
                model, v, img, rng=key, mc_dropout=False
            )
            mus.append(mu)
            covs.append(sigma)
        return jnp.stack(mus, axis=1), jnp.stack(covs, axis=1)

    def val_figure(self, model, variables, batch, max_items: int = 4):
        """Contour-overlay panel logged each validation epoch (reference
        task/uncertainty.py:100-104 uploads figures per val epoch).

        Returns a matplotlib figure: image, GT landmarks, predicted means
        with 2-sigma confidence ellipses.
        """
        import matplotlib
        matplotlib.use("Agg", force=False)
        import matplotlib.pyplot as plt

        from contouring_uncertainty_tpu.utils.plotting import confidence_ellipse

        img = batch[Tags.img][:max_items]
        mu, sigma = self.forward_gaussians(model, variables, img)
        mu = np.asarray(mu)
        sigma = np.asarray(sigma)
        n = img.shape[0]
        fig, axes = plt.subplots(1, n, figsize=(3 * n, 3), squeeze=False)
        gt = batch.get(Tags.contour)
        for i, ax in enumerate(axes[0]):
            ax.imshow(np.asarray(img[i, 0]), cmap="gray")
            if gt is not None:
                g = np.asarray(gt[i])
                ax.scatter(g[:, 0], g[:, 1], s=6, c="lime", label="gt")
            ax.scatter(mu[i, :, 0], mu[i, :, 1], s=6, c="red", label="pred")
            for k in range(mu.shape[1]):
                confidence_ellipse(mu[i, k, 0], mu[i, k, 1], sigma[i, k], ax,
                                   n_std=2.0, edgecolor="orange", alpha=0.6)
            ax.set_axis_off()
        axes[0, 0].legend(loc="lower right", fontsize=6)
        fig.tight_layout()
        return fig

    def val_metrics(self, model, variables, batch) -> Dict[str, jnp.ndarray]:
        """Val loss + Dice from linear contour reconstruction (on device);
        one model forward serves both the loss and the Dice.

        Note: the Dice rasterizes the full landmark vector as one closed
        polygon against the first foreground label — exact for single-
        structure datasets (CAMUS LV); for multi-structure landmark vectors
        (JSRT) it is only a coarse training signal (the predict pipeline
        rasterizes per structure)."""
        loss, logs, mu = self._forward_loss(model, variables, batch, rng=None, train=False)
        img = batch[Tags.img]
        h, w = img.shape[-2:]
        pred = rasterize_batch(mu, h, w, linear=True)
        gt_bin = (batch[Tags.gt] == int(Label.LV)).astype(jnp.float32)
        logs = dict(logs)
        logs["dice"] = dice_binary(pred, gt_bin).mean()
        return logs
