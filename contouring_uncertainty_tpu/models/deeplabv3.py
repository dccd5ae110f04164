"""DeepLabV3 with a dropout-capable ResNet backbone, in Flax (NHWC).

Capability parity with the reference's torchvision forks
(contour_uncertainty/models/resnet.py:12-79 DropoutBottleneck,
models/deeplabv3/_deeplabv3.py:30-262 + deeplabv3.py:41): a ResNet-50-style
backbone whose bottleneck blocks carry optional channel dropout (the MC-
dropout source), dilated stages for output-stride 16, an ASPP head, bilinear
upsampling to input resolution, multi-head outputs, SSN heads, and
`bottleneck_out` backbone features for the skew ConfidenceNet.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def _norm():
    return nn.GroupNorm(num_groups=None, group_size=1, epsilon=1e-5, dtype=jnp.float32)


class DropoutBottleneck(nn.Module):
    """ResNet bottleneck (1x1 -> 3x3 -> 1x1, x4 expansion) with optional
    channel dropout (reference resnet.py:12-79)."""

    features: int
    strides: int = 1
    dilation: int = 1
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        residual = x
        out = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype)(x)
        out = _norm()(out)
        out = nn.relu(out)
        # torch-style symmetric padding: dilated 3x3 pads by dilation
        # (torchvision Bottleneck conv2: padding=dilation); XLA SAME pads
        # (0, d+...) asymmetrically for stride 2.
        pad = self.dilation
        out = nn.Conv(self.features, (3, 3), strides=(self.strides, self.strides),
                      kernel_dilation=(self.dilation, self.dilation),
                      padding=((pad, pad), (pad, pad)),
                      use_bias=False, dtype=self.dtype)(out)
        out = _norm()(out)
        out = nn.relu(out)
        out = nn.Conv(self.features * 4, (1, 1), use_bias=False, dtype=self.dtype)(out)
        out = _norm()(out)
        if self.dropout > 0:
            out = nn.Dropout(self.dropout, broadcast_dims=(1, 2))(
                out, deterministic=deterministic)
        if residual.shape[-1] != self.features * 4 or self.strides != 1:
            residual = nn.Conv(self.features * 4, (1, 1),
                               strides=(self.strides, self.strides),
                               use_bias=False, dtype=self.dtype)(residual)
            residual = _norm()(residual)
        return nn.relu(out + residual)


class ResNetBackbone(nn.Module):
    """ResNet-50-style backbone, output stride 16 (stage 4 dilated)."""

    layers: Sequence[int] = (3, 4, 6, 3)
    base: int = 64
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        out = nn.Conv(self.base, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                      use_bias=False, dtype=self.dtype)(x)
        out = _norm()(out)
        out = nn.relu(out)
        out = nn.max_pool(out, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        stage_cfg = [
            (self.base, 1, 1),
            (self.base * 2, 2, 1),
            (self.base * 4, 2, 1),
            (self.base * 8, 1, 2),  # dilated, keeps stride 16
        ]
        for (features, stride, dilation), blocks in zip(stage_cfg, self.layers):
            for b in range(blocks):
                out = DropoutBottleneck(
                    features, strides=stride if b == 0 else 1, dilation=dilation,
                    dropout=self.dropout, dtype=self.dtype,
                )(out, deterministic=deterministic)
        return out  # (N, H/16, W/16, base*32)


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling head (rates 12/24/36 + image pooling)."""

    features: int = 256
    rates: Tuple[int, ...] = (12, 24, 36)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        branches = [nn.relu(_norm()(nn.Conv(self.features, (1, 1), use_bias=False,
                                            dtype=self.dtype)(x)))]
        for rate in self.rates:
            b = nn.Conv(self.features, (3, 3), kernel_dilation=(rate, rate),
                        padding="SAME", use_bias=False, dtype=self.dtype)(x)
            branches.append(nn.relu(_norm()(b)))
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        pooled = nn.relu(_norm()(nn.Conv(self.features, (1, 1), use_bias=False,
                                         dtype=self.dtype)(pooled)))
        pooled = jnp.broadcast_to(pooled, branches[0].shape)
        out = jnp.concatenate(branches + [pooled], axis=-1)
        out = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype)(out)
        return nn.relu(_norm()(out))


class DeepLabV3(nn.Module):
    """DeepLabV3 with the project's extensions; same output dict as UNet."""

    input_shape: Sequence[int]  # (C, H, W)
    output_shape: Sequence[int]  # (C_out, H, W)
    layers: Sequence[int] = (3, 4, 6, 3)
    base: int = 64
    dropout: float = 0.0
    n_heads: int = 1
    ssn_rank: int = 0
    bottleneck_out: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False, deterministic: Optional[bool] = None):
        if deterministic is None:
            deterministic = not train
        n, _, h, w = x.shape
        x = jnp.transpose(x, (0, 2, 3, 1)).astype(self.dtype)
        feats = ResNetBackbone(self.layers, self.base, self.dropout,
                               dtype=self.dtype)(x, deterministic=deterministic)
        aspp = ASPP(dtype=self.dtype)(feats)

        n_classes = self.output_shape[0]
        head_sizes = [n_classes]
        if self.ssn_rank > 0:
            head_sizes = [n_classes, n_classes, n_classes * self.ssn_rank]
        elif self.n_heads > 1:
            head_sizes = [n_classes] * self.n_heads

        outs = []
        for i, size in enumerate(head_sizes):
            head = nn.Conv(256, (3, 3), padding="SAME", use_bias=False,
                           dtype=self.dtype, name=f"head_conv_{i}")(aspp)
            head = nn.relu(_norm()(head))
            head = nn.Conv(size, (1, 1), dtype=self.dtype, name=f"head_out_{i}")(head)
            head = jax.image.resize(head.astype(jnp.float32), (n, h, w, size), "bilinear")
            outs.append(head)

        result = {"out": jnp.transpose(outs[0], (0, 3, 1, 2))}
        if self.ssn_rank > 0:
            result["ssn"] = [jnp.transpose(o, (0, 3, 1, 2)) for o in outs[1:]]
        elif self.n_heads > 1:
            result["heads"] = [jnp.transpose(o, (0, 3, 1, 2)) for o in outs]
        if self.bottleneck_out:
            result["bottleneck"] = feats.astype(jnp.float32)
        return result
