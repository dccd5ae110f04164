"""DSNT-skew task: heatmaps + bottleneck ConfidenceNet -> per-point bivariate
skew-normal NLL (MICCAI 2023 asymmetric contour uncertainty).

Capability parity with the reference DSNTSkew
(task/regression/dsnt/dsnt_skew.py:18-199): the U-Net runs with
bottleneck_out, a ConfidenceNet head regresses 2*|skew_indices| alpha values
scattered into the (N, K, 2) alpha tensor, the loss is the skew-normal NLL
(0.5 log|S| + 0.5 maha - log Phi), and at predict time alpha's y component is
flipped (dsnt_skew.py:164).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from contouring_uncertainty_tpu.data.config import DataParams, Label, Tags
from contouring_uncertainty_tpu.distributions import bsn
from contouring_uncertainty_tpu.models.unet import ConfidenceNet, UNet
from contouring_uncertainty_tpu.ops import dsnt as dsnt_ops
from contouring_uncertainty_tpu.ops.rasterize import rasterize_batch
from contouring_uncertainty_tpu.tasks.dsnt_al import DSNTAleatoric
from contouring_uncertainty_tpu.utils.metrics import dice_binary


class SkewUNet(nn.Module):
    """Backbone + ConfidenceNet skew head over the bottleneck features."""

    unet: nn.Module
    n_skew: int

    @nn.compact
    def __call__(self, x, *, train: bool = False, deterministic: Optional[bool] = None,
                 mode: str = "full", prefix: Optional[dict] = None):
        # Non-UNet backbones (ENet, DeepLabV3) have no prefix modes; only the
        # default mode is routed to them unchanged.
        extra = {} if mode == "full" else dict(mode=mode, prefix=prefix)
        out = self.unet(x, train=train, deterministic=deterministic, **extra)
        if mode == "encode_prefix":
            return out
        a = ConfidenceNet(output_size=self.n_skew * 2, name="confidence_net")(
            out["bottleneck"]
        )
        out["alpha_raw"] = a.reshape(a.shape[0], self.n_skew, 2)
        return out


@dataclass
class DSNTSkew(DSNTAleatoric):
    """Skew task config; inherits the DSNT pipeline from DSNTAleatoric."""

    skew_indices: Optional[Tuple[int, ...]] = None
    task_name: str = "dsnt-skew"
    # Two-stage fine-tune mode (reference dsnt_skew.py:39-44): freeze the
    # segmentation backbone and train only the ConfidenceNet skew head.
    # Config-reachable as task.freeze_seg=true; typically combined with
    # loading a pretrained dsnt-al checkpoint.
    freeze_seg: bool = False

    def optimizer_labels(self, params) -> Optional[Dict]:
        """Optax multi_transform labels: 'freeze' for the backbone subtree,
        'train' for everything else. None when freeze_seg is off."""
        if not self.freeze_seg:
            return None
        return {
            k: jax.tree_util.tree_map(lambda _: "freeze" if k == "unet" else "train", v)
            for k, v in params.items()
        }

    def _indices(self):
        k = self.data_params.out_shape[0]
        return tuple(range(k)) if self.skew_indices is None else tuple(self.skew_indices)

    def build_model(self) -> SkewUNet:
        from contouring_uncertainty_tpu.models import build_backbone

        c, h, w = self.data_params.in_shape
        k = self.data_params.out_shape[0]
        backbone = build_backbone(self.model_name, (c, h, w), (k, h, w),
                                  bottleneck_out=True, **self.model_kwargs)
        return SkewUNet(unet=backbone, n_skew=len(self._indices()))

    def _scatter_alpha(self, alpha_raw: jnp.ndarray) -> jnp.ndarray:
        """(N, K*, 2) head output -> (N, K, 2) alpha with zeros elsewhere."""
        k = self.data_params.out_shape[0]
        n = alpha_raw.shape[0]
        idx = jnp.asarray(np.array(self._indices(), np.int32))
        alpha = jnp.zeros((n, k, 2), alpha_raw.dtype)
        return alpha.at[:, idx].set(alpha_raw)

    def _forward_loss(self, model, variables, batch, rng, train: bool):
        img = batch[Tags.img]
        y = batch[Tags.contour]
        kwargs: Dict[str, Any] = dict(train=train)
        if train:
            kwargs["rngs"] = {"dropout": rng}
        out = model.apply(variables, img, **kwargs)
        mu, sigma = dsnt_ops.logits_to_pixel_gaussians(out["out"], use_covar=self.covar)
        alpha = self._scatter_alpha(out["alpha_raw"])

        point_loss, logdet, maha, term3 = bsn.nll(y, mu, sigma, alpha)
        loss = point_loss.mean()
        logs = {
            "loss": loss,
            "distance_loss": dsnt_ops.euclidean_error(mu, y).mean(),
            "loss_term1": logdet.mean(),
            "loss_term2": maha.mean(),
            "loss_term3": term3.mean(),
            "alpha_norm": jnp.linalg.norm(alpha, axis=-1).mean(),
        }
        return loss, logs, mu

    def loss(self, model, variables, batch, rng, train: bool = True):
        loss, logs, _ = self._forward_loss(model, variables, batch, rng, train)
        return loss, logs

    def _outputs_to_skew(self, out):
        mu, sigma = dsnt_ops.logits_to_pixel_gaussians(out["out"], use_covar=self.covar)
        alpha = self._scatter_alpha(out["alpha_raw"])
        # Test-time y flip (dsnt_skew.py:164): image y-axis points down.
        alpha = alpha * jnp.asarray([1.0, -1.0], alpha.dtype)
        return mu, sigma, alpha

    def forward_skew(self, model, variables, img, rng=None, mc_dropout=False):
        kwargs = {}
        if mc_dropout:
            kwargs = dict(deterministic=False, rngs={"dropout": rng})
        return self._outputs_to_skew(model.apply(variables, img, **kwargs))

    def predict(self, model, variables, img, rng=None, mesh=None):
        """-> mu (N, T_e, K, 2), cov (N, T_e, K, 2, 2), alpha (N, T_e, K, 2)."""
        ensemble = variables if isinstance(variables, (list, tuple)) else None
        t_e = len(ensemble) if ensemble else self.t_e
        if ensemble is None and t_e > 1:
            # One batched MC-dropout forward with the deterministic encoder
            # prefix shared across the T_e tiles (DSNTAleatoric._mc_apply).
            n = img.shape[0]
            key = rng if rng is not None else jax.random.key(0)
            out = self._mc_apply(model, variables, img, t_e, key, mesh=mesh)
            mu, sigma, alpha = self._outputs_to_skew(out)
            unbatch = lambda a: a.reshape((t_e, n) + a.shape[1:]).swapaxes(0, 1)
            return unbatch(mu), unbatch(sigma), unbatch(alpha)
        mus, covs, alphas = [], [], []
        for i in range(t_e):
            v = ensemble[i] if ensemble else variables
            key = jax.random.fold_in(rng, i) if rng is not None else jax.random.key(i)
            mu, sigma, alpha = self.forward_skew(model, v, img, rng=key, mc_dropout=False)
            mus.append(mu)
            covs.append(sigma)
            alphas.append(alpha)
        return (jnp.stack(mus, axis=1), jnp.stack(covs, axis=1), jnp.stack(alphas, axis=1))

    def val_metrics(self, model, variables, batch) -> Dict[str, jnp.ndarray]:
        loss, logs, mu = self._forward_loss(model, variables, batch, rng=None, train=False)
        img = batch[Tags.img]
        h, w = img.shape[-2:]
        pred = rasterize_batch(mu, h, w, linear=True)
        gt_bin = (batch[Tags.gt] == int(Label.LV)).astype(jnp.float32)
        logs = dict(logs)
        logs["dice"] = dice_binary(pred, gt_bin).mean()
        return logs
