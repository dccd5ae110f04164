"""Standalone ResNet-50 coordinate-regression model, in Flax (NHWC).

Capability parity with the reference's `Resnet`
(contour_uncertainty/models/resnet.py:12-79 DropoutBottleneck,
:80-193 _ResNet, :196-225 Resnet; config/task/model/resnet.yaml): a
torchvision-style ResNet-50 V1.5 (bottleneck [3, 4, 6, 3], stride on the 3x3
conv) whose blocks carry optional channel dropout after each conv
(nn.Dropout2d -> flax Dropout broadcast over H, W), a stem adapted to the
dataset's input channels (resnet.py:217), global average pooling, and a dense
head reshaped to `output_shape` — landmark coordinates (K, 2) for contour
data. With `sigma_out > 0` a second branch deep-copies layers 3-4
(resnet.py:113-119: independent parameters, same architecture) from the
shared layer-2 features and regresses (K, sigma_out) per-point uncertainty
parameters (resnet.py:181-188).

The reference ships this model as an instantiable config option
(`task/model=resnet`) without an in-tree task consuming its coordinate
output; here the DSNT-AL task accepts it directly (tasks/dsnt_al.py detects
the (N, K, 2) output and builds the per-point bivariate Gaussian from the
sigma branch instead of DSNT moments), so `task/model=resnet` trains and
predicts through the same aleatoric pipeline.

TPU notes: NHWC layout throughout (XLA's native conv layout), norms are
per-channel GroupNorm like the DeepLabV3 port (BatchNorm would thread
mutable batch_stats through every jitted step for no accuracy gain at the
instance-norm-trained regime this project uses), and the whole forward is a
static graph of MXU convs — no data-dependent control flow.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from contouring_uncertainty_tpu.models.deeplabv3 import _norm


class RegressionBottleneck(nn.Module):
    """ResNet V1.5 bottleneck with dropout after every conv
    (reference resnet.py:54-77: drop1/drop2/drop3)."""

    features: int
    strides: int = 1
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        def drop(h):
            if self.dropout > 0:
                h = nn.Dropout(self.dropout, broadcast_dims=(1, 2))(
                    h, deterministic=deterministic)
            return h

        residual = x
        out = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype)(x)
        out = drop(nn.relu(_norm()(out)))
        # V1.5: the stride lives on the 3x3 conv; torch pads 1 both sides
        # (XLA "SAME" for stride 2 pads (0, 1) — see models/unet.py).
        out = nn.Conv(self.features, (3, 3), strides=(self.strides, self.strides),
                      padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype)(out)
        out = drop(nn.relu(_norm()(out)))
        out = nn.Conv(self.features * 4, (1, 1), use_bias=False, dtype=self.dtype)(out)
        out = _norm()(out)
        if residual.shape[-1] != self.features * 4 or self.strides != 1:
            residual = nn.Conv(self.features * 4, (1, 1),
                               strides=(self.strides, self.strides),
                               use_bias=False, dtype=self.dtype)(residual)
            residual = _norm()(residual)
        # Reference order: relu(out + identity) then drop3 (resnet.py:73-75).
        return drop(nn.relu(out + residual))


class _Stage(nn.Module):
    """One ResNet stage: `blocks` bottlenecks, stride on the first."""

    features: int
    blocks: int
    strides: int = 1
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        for b in range(self.blocks):
            x = RegressionBottleneck(
                self.features, strides=self.strides if b == 0 else 1,
                dropout=self.dropout, dtype=self.dtype,
            )(x, deterministic=deterministic)
        return x


class Resnet(nn.Module):
    """ResNet-50 landmark regressor; output dict {"out": (N, *output_shape)}
    plus {"sigma": (N, K, sigma_out)} when `sigma_out > 0`."""

    input_shape: Sequence[int]  # (C, H, W)
    output_shape: Sequence[int]  # (K, 2)
    layers: Sequence[int] = (3, 4, 6, 3)
    dropout: float = 0.0
    sigma_out: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False,
                 deterministic: Optional[bool] = None):
        if deterministic is None:
            deterministic = not train
        n = x.shape[0]
        x = jnp.transpose(x, (0, 2, 3, 1)).astype(self.dtype)

        # Stem (reference resnet.py:217: 7x7/2 conv on the dataset's channels).
        out = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                      use_bias=False, dtype=self.dtype)(x)
        out = nn.relu(_norm()(out))
        out = nn.max_pool(out, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        stage = lambda f, blocks, s, name: _Stage(
            f, blocks, strides=s, dropout=self.dropout, dtype=self.dtype,
            name=name)
        out = stage(64, self.layers[0], 1, "layer1")(out, deterministic=deterministic)
        out = stage(128, self.layers[1], 2, "layer2")(out, deterministic=deterministic)
        sigma_split = out  # branch point (reference resnet.py:174)
        out = stage(256, self.layers[2], 2, "layer3")(out, deterministic=deterministic)
        out = stage(512, self.layers[3], 2, "layer4")(out, deterministic=deterministic)

        out = jnp.mean(out, axis=(1, 2)).astype(jnp.float32)  # global avg pool
        feat_dim = 1
        for d in self.output_shape:
            feat_dim *= int(d)
        mu = nn.Dense(feat_dim, name="fc")(out).reshape((n,) + tuple(self.output_shape))
        result = {"out": mu}

        if self.sigma_out > 0:
            s = stage(256, self.layers[2], 2, "sigma_layer3")(
                sigma_split, deterministic=deterministic)
            s = stage(512, self.layers[3], 2, "sigma_layer4")(
                s, deterministic=deterministic)
            s = jnp.mean(s, axis=(1, 2)).astype(jnp.float32)
            k = int(self.output_shape[0])
            sigma = nn.Dense(k * self.sigma_out, name="sigma_fc")(s)
            result["sigma"] = sigma.reshape((n, k, self.sigma_out))
        return result
