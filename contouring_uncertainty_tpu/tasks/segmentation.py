"""Segmentation-space uncertainty baselines: base task, MC-dropout, aleatoric
(per-pixel sigma), TTA, and Stochastic Segmentation Networks.

Capability parity with contour_uncertainty/task/segmentation/:
- SegmentationUncertaintyTask: Dice + CE loss with the deep-supervision
  ladder (segmentation_uncertainty.py:32-58), predict with fill-holes +
  largest-blob post-processing and border-zeroed entropy (:102-127);
- McDropoutUncertainty (mcdropout.py:12-48): T_e stochastic forwards;
- AleatoricUncertainty (aleatoric.py:18-150): two-headed model (ssn_rank=1),
  Normal(logits, softplus sigma) MC-integrated CE;
- TTAUncertainty (tta.py:12-96): random invertible augs, inverse-warped logits;
- StochasticSegmentationNetwork (ssn.py:19-288): low-rank MVN over logits,
  MC-integral NLL with antithetic sampling, diagonal fallback.

TPU-first: every MC loop (dropout passes, aleatoric samples, TTA passes, SSN
samples) is a vmapped/batched device computation under one jit; the reference
looped on host per pass.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from contouring_uncertainty_tpu.data import augment as aug
from contouring_uncertainty_tpu.data.config import DataParams, Label, Tags
from contouring_uncertainty_tpu.utils.metrics import soft_dice


def _seg_channels(data_params: DataParams) -> int:
    n_labels = len([l for l in data_params.labels])
    return 1 if n_labels <= 2 else n_labels


@dataclass
class SegmentationUncertaintyTask:
    """Base segmentation task: Dice + CE loss, deep-supervision ladder."""

    data_params: DataParams
    ce_weight: float = 0.1
    dice_weight: float = 1.0
    t_a: int = 25
    t_e: int = 1
    model_kwargs: Dict[str, Any] = field(default_factory=dict)
    model_name: str = "unet2"
    task_name: str = "segmentation"

    @property
    def n_channels(self) -> int:
        return _seg_channels(self.data_params)

    def build_model(self):
        from contouring_uncertainty_tpu.models import build_backbone

        c, h, w = self.data_params.in_shape
        return build_backbone(self.model_name, (c, h, w),
                              (self.n_channels, h, w), **self.model_kwargs)

    # -------------------------------------------------------------------- loss

    def compute_loss(self, y: jnp.ndarray, logits: jnp.ndarray):
        """y (N, H, W) int, logits (N, C, H, W)."""
        if logits.shape[1] == 1:
            target = (y > 0).astype(jnp.float32)
            log_p = jax.nn.log_sigmoid(logits[:, 0])
            log_1mp = jax.nn.log_sigmoid(-logits[:, 0])
            ce = -(target * log_p + (1 - target) * log_1mp).mean()
            probs = jax.nn.sigmoid(logits)
        else:
            logp = jax.nn.log_softmax(logits, axis=1)
            onehot = jax.nn.one_hot(y, logits.shape[1], axis=1)
            ce = -(onehot * logp).sum(1).mean()
            probs = jax.nn.softmax(logits, axis=1)
        dice = soft_dice(probs, y, self.n_channels)
        loss = self.ce_weight * ce + self.dice_weight * (1.0 - dice.mean())
        return loss, ce, dice.mean()

    def loss(self, model, variables, batch, rng, train: bool = True):
        img, y = batch[Tags.img], batch[Tags.gt]
        kwargs: Dict[str, Any] = dict(train=train)
        if train:
            kwargs["rngs"] = {"dropout": rng}
        out = model.apply(variables, img, **kwargs)
        loss, ce, dice = self.compute_loss(y, out["out"])
        if train and out.get("deep_supervision"):
            heads = out["deep_supervision"]
            for i, head in enumerate(heads):
                hh, ww = head.shape[-2:]
                factor_h = y.shape[-2] // hh
                y_ds = y[:, ::factor_h, ::factor_h]
                l_ds, _, _ = self.compute_loss(y_ds, head)
                loss = loss + 0.5 ** (i + 1) * l_ds
            loss = loss / (2.0 - 2.0 ** (-(len(heads) + 1)))
        return loss, {"loss": loss, "ce": ce, "dice": dice}

    def val_metrics(self, model, variables, batch):
        loss, logs = self.loss(model, variables, batch, rng=None, train=False)
        return logs

    def val_figure(self, model, variables, batch, max_items: int = 4):
        """Per-val-epoch overlay panel (reference uncertainty.py:100-104):
        image, GT boundary, predicted label map."""
        import matplotlib

        matplotlib.use("Agg", force=False)
        import matplotlib.pyplot as plt
        import numpy as np

        img = batch[Tags.img][:max_items]
        probs = self._activate(model.apply(variables, img)["out"])
        probs = np.asarray(probs)
        if probs.shape[1] == 1:
            pred = (probs[:, 0] > 0.5).astype(np.int32)
        else:
            pred = probs.argmax(axis=1)
        n = img.shape[0]
        fig, axes = plt.subplots(1, n, figsize=(3 * n, 3), squeeze=False)
        gt = batch.get(Tags.gt)
        for i, ax in enumerate(axes[0]):
            ax.imshow(np.asarray(img[i, 0]), cmap="gray")
            ax.imshow(pred[i], alpha=0.35, cmap="viridis",
                      interpolation="nearest")
            if gt is not None:
                ax.contour(np.asarray(gt[i]), levels=[0.5], colors="lime",
                           linewidths=0.8)
            ax.set_axis_off()
        fig.tight_layout()
        return fig

    # ----------------------------------------------------------------- predict

    def predict_probs(self, model, variables, img, rng, mesh=None):
        """-> probs (N, T_e, T_a, C, H, W). Base: deterministic single pass."""
        logits = model.apply(variables, img)["out"]
        probs = self._activate(logits)
        return probs[:, None, None]

    def _activate(self, logits):
        if logits.shape[1] == 1:
            return jax.nn.sigmoid(logits)
        return jax.nn.softmax(logits, axis=1)


@dataclass
class McDropoutUncertainty(SegmentationUncertaintyTask):
    """T_e MC-dropout forwards (mcdropout.py:12-48)."""

    task_name: str = "mcdropout"

    def build_model(self):
        if self.model_name in ("unet2", "unet"):
            self.model_kwargs.setdefault("drop_block", True)
        return super().build_model()

    def predict_probs(self, model, variables, img, rng, mesh=None):
        # One batched T_e*N forward with the deterministic encoder prefix
        # computed once and tiled (tasks/dsnt_al.py mc_dropout_apply) — the
        # vmapped per-key loop re-ran the FLOP-heavy high-res encoder T_e
        # times on identical inputs.
        from contouring_uncertainty_tpu.tasks.dsnt_al import mc_dropout_apply

        n = img.shape[0]
        logits = mc_dropout_apply(model, variables, img, self.t_e, rng,
                                  mesh=mesh)["out"]
        probs = self._activate(logits)
        probs = probs.reshape((self.t_e, n) + probs.shape[1:])  # (T_e, N, C, H, W)
        return jnp.moveaxis(probs, 0, 1)[:, :, None]  # (N, T_e, 1, C, H, W)


@dataclass
class AleatoricUncertainty(SegmentationUncertaintyTask):
    """Two-headed logits + sigma with MC-integrated CE (aleatoric.py:18-150)."""

    iterations: int = 10
    task_name: str = "aleatoric"

    def build_model(self):
        self.model_kwargs["ssn_rank"] = 1
        return super().build_model()

    def loss(self, model, variables, batch, rng, train: bool = True):
        img, y = batch[Tags.img], batch[Tags.gt]
        kwargs: Dict[str, Any] = dict(train=train)
        # Independent keys for dropout vs the MC noise draws (sharing one key
        # deterministically correlates the dropout masks with the noise).
        if rng is not None:
            drop_key, noise_key = jax.random.split(rng)
        else:
            drop_key, noise_key = None, jax.random.key(0)
        if train and drop_key is not None:
            kwargs["rngs"] = {"dropout": drop_key}
        out = model.apply(variables, img, **kwargs)
        logits = out["out"]
        sigma = jax.nn.softplus(out["ssn"][0]) + 1e-8
        eps = jax.random.normal(noise_key, (self.iterations,) + logits.shape)
        x_hat = logits[None] + sigma[None] * eps

        if logits.shape[1] == 1:
            mc = jax.nn.sigmoid(x_hat).mean(0)  # (N, 1, H, W)
            target = (y > 0).astype(jnp.float32)
            ce = -(target * jnp.log(mc[:, 0] + 1e-8)
                   + (1 - target) * jnp.log(1 - mc[:, 0] + 1e-8)).mean()
        else:
            mc = jax.nn.softmax(x_hat, axis=2).mean(0)
            onehot = jax.nn.one_hot(y, logits.shape[1], axis=1)
            ce = -(onehot * jnp.log(mc + 1e-8)).sum(1).mean()
        dice = soft_dice(mc, y, self.n_channels)
        loss = self.ce_weight * ce + self.dice_weight * (1.0 - dice.mean())
        return loss, {"loss": loss, "ce": ce, "dice": dice.mean()}

    def predict_probs(self, model, variables, img, rng, mesh=None):
        out = model.apply(variables, img)
        logits = out["out"]
        sigma = jax.nn.softplus(out["ssn"][0]) + 1e-8
        eps = jax.random.normal(rng, (self.t_a,) + logits.shape)
        probs = self._activate((logits[None] + sigma[None] * eps).reshape(
            (-1,) + logits.shape[1:])).reshape((self.t_a,) + logits.shape)
        return jnp.moveaxis(probs, 0, 1)[:, None]  # (N, 1, T_a, C, H, W)


@dataclass
class TTAUncertainty(SegmentationUncertaintyTask):
    """Test-time augmentation with inverse-warped logits (tta.py:12-96)."""

    task_name: str = "tta"

    def predict_probs(self, model, variables, img, rng, mesh=None):
        n = img.shape[0]

        def one(key):
            params = aug.sample_params(key, n)
            warped = aug.apply({"img": img}, params)["img"]
            logits = model.apply(variables, warped)["out"]
            logits = aug.un_apply_logits(logits, params)
            return self._activate(logits)

        probs = jax.vmap(one)(jax.random.split(rng, self.t_a))
        return jnp.moveaxis(probs, 0, 1)[:, None]  # (N, 1, T_a, C, H, W)


@dataclass
class StochasticSegmentationNetwork(SegmentationUncertaintyTask):
    """Low-rank multivariate normal over logits (ssn.py:19-288)."""

    rank: int = 10
    mc_samples: int = 20
    epsilon: float = 1e-5
    diagonal: bool = False
    task_name: str = "ssn"

    def build_model(self):
        self.model_kwargs["ssn_rank"] = self.rank
        return super().build_model()

    def _distribution_params(self, out):
        """-> mean (N, D), diag (N, D), factor (N, D, R) with D = C*H*W."""
        n = out["out"].shape[0]
        mean = out["out"].reshape(n, -1)
        diag = jnp.exp(out["ssn"][0]).reshape(n, -1) + self.epsilon
        c = out["out"].shape[1]
        factor = out["ssn"][1].reshape(n, self.rank, c, -1).reshape(n, self.rank, -1)
        return mean, diag, jnp.swapaxes(factor, 1, 2)

    def _sample_logits(self, key, mean, diag, factor, num, antithetic=True):
        """num samples from N(mean, FF^T + D), (num, N, D)."""
        n, d = mean.shape
        half = (num + 1) // 2 if antithetic else num
        k1, k2 = jax.random.split(key)
        eps_f = jax.random.normal(k1, (half, n, self.rank))
        eps_d = jax.random.normal(k2, (half, n, d))
        dev = jnp.einsum("ndr,snr->snd", factor, eps_f) + jnp.sqrt(diag)[None] * eps_d
        if self.diagonal:
            dev = jnp.sqrt(diag)[None] * eps_d
        if antithetic:
            dev = jnp.concatenate([dev, -dev], axis=0)[:num]
        return mean[None] + dev

    def loss(self, model, variables, batch, rng, train: bool = True):
        img, y = batch[Tags.img], batch[Tags.gt]
        kwargs: Dict[str, Any] = dict(train=train)
        # Independent keys for dropout vs the MC noise draws (sharing one key
        # deterministically correlates the dropout masks with the noise).
        if rng is not None:
            drop_key, noise_key = jax.random.split(rng)
        else:
            drop_key, noise_key = None, jax.random.key(0)
        if train and drop_key is not None:
            kwargs["rngs"] = {"dropout": drop_key}
        out = model.apply(variables, img, **kwargs)
        mean, diag, factor = self._distribution_params(out)
        num = self.mc_samples
        samples = self._sample_logits(noise_key, mean, diag, factor, num)  # (S, N, D)

        n = img.shape[0]
        c = self.n_channels
        hw = y.shape[-2] * y.shape[-1]
        logit_s = samples.reshape(num, n, c, hw)
        if c == 1:
            target = (y > 0).astype(jnp.float32).reshape(1, n, hw)
            logp = -jnp.maximum(logit_s[:, :, 0], 0) + logit_s[:, :, 0] * target \
                - jnp.log1p(jnp.exp(-jnp.abs(logit_s[:, :, 0])))
        else:
            target = y.reshape(1, n, hw)
            lsm = jax.nn.log_softmax(logit_s, axis=2)
            logp = jnp.take_along_axis(
                lsm, jnp.broadcast_to(target[:, :, None], (num, n, 1, hw)), axis=2
            )[:, :, 0]
        # log E_s[ prod_pixels p ] via logsumexp over samples (ssn.py:116-138).
        loglik = jax.nn.logsumexp(logp.sum(-1), axis=0) - jnp.log(num)
        loss = -loglik.mean()

        probs = self._activate(out["out"])
        dice = soft_dice(probs, y, c)
        return loss, {"loss": loss, "ce": loss, "dice": dice.mean()}

    def predict_probs(self, model, variables, img, rng, mesh=None):
        out = model.apply(variables, img)
        mean, diag, factor = self._distribution_params(out)
        samples = self._sample_logits(rng, mean, diag, factor, self.t_a, antithetic=False)
        n = img.shape[0]
        c = self.n_channels
        h, w = img.shape[-2:]
        logits = samples.reshape(self.t_a, n, c, h, w)
        probs = self._activate(logits.reshape((-1, c, h, w))).reshape(logits.shape)
        return jnp.moveaxis(probs, 0, 1)[:, None]  # (N, 1, T_a, C, H, W)
