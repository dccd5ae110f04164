"""ENet in Flax (NHWC): lightweight real-time segmentation backbone.

Capability parity with the reference Enet
(vital/vital/models/segmentation/enet.py:7-620 +
contour_uncertainty/models/enet.py:43-190): initial block (conv || maxpool
concat), encoder of regular / dilated / asymmetric bottlenecks with two
downsampling stages, decoder with two upsampling stages, plus the project's
extensions — multi-head decoders (`n_heads`), SSN heads (`ssn_rank` adds
sigma / low-rank-factor heads), `bottleneck_out` features for the skew
ConfidenceNet.

TPU-native adaptation: the reference decoder uses max-unpooling with stored
pool indices — a scatter op XLA handles poorly — replaced by strided
transposed convolutions (standard substitution, same shapes/receptive
fields), and batch norm is replaced by instance norm (batch-stat updates
don't fit the pure jitted step; the UNet uses instance norm too). PReLU is
kept (a per-channel learned slope).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn


class PReLU(nn.Module):
    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", nn.initializers.constant(0.25), (x.shape[-1],))
        return jnp.where(x >= 0, x, alpha * x)


def _act(relu: bool):
    return (lambda x: nn.relu(x)) if relu else PReLU()


class InitialBlock(nn.Module):
    """3x3/2 conv (C-3 maps) concatenated with 2x2 maxpool of the input."""

    out_channels: int = 16
    relu: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # torch pads stride-2 3x3 convs symmetrically (1, 1); XLA SAME
        # would pad (0, 1) and shift the downsample by a pixel.
        main = nn.Conv(self.out_channels - x.shape[-1], (3, 3), strides=(2, 2),
                       padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype)(x)
        ext = nn.max_pool(x, (2, 2), strides=(2, 2))
        out = jnp.concatenate([main, ext], axis=-1)
        out = nn.GroupNorm(num_groups=None, group_size=1, epsilon=1e-5, dtype=jnp.float32)(out)
        return _act(self.relu)(out)


class Bottleneck(nn.Module):
    """Regular / dilated / asymmetric / downsampling / upsampling bottleneck."""

    channels: int
    internal_ratio: int = 4
    kernel_size: int = 3
    dilation: int = 1
    asymmetric: bool = False
    downsample: bool = False
    upsample: bool = False
    dropout: float = 0.1
    relu: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        internal = max(self.channels // self.internal_ratio, 1)
        # A fresh activation module per use site: PReLU has a per-channel
        # param, so it cannot be shared across tensors of different widths.
        act = lambda h: _act(self.relu)(h)
        ext = x

        # 1x1 projection (2x2/2 conv when downsampling).
        if self.downsample:
            ext = nn.Conv(internal, (2, 2), strides=(2, 2), use_bias=False, dtype=self.dtype)(ext)
        else:
            ext = nn.Conv(internal, (1, 1), use_bias=False, dtype=self.dtype)(ext)
        ext = nn.GroupNorm(num_groups=None, group_size=1, epsilon=1e-5, dtype=jnp.float32)(ext)
        ext = act(ext)

        if self.upsample:
            ext = nn.ConvTranspose(internal, (3, 3), strides=(2, 2), padding="SAME",
                                   use_bias=False, dtype=self.dtype)(ext)
        elif self.asymmetric:
            k = self.kernel_size
            ext = nn.Conv(internal, (k, 1), padding="SAME", use_bias=False, dtype=self.dtype)(ext)
            ext = nn.Conv(internal, (1, k), padding="SAME", use_bias=False, dtype=self.dtype)(ext)
        else:
            ext = nn.Conv(internal, (self.kernel_size, self.kernel_size), padding="SAME",
                          kernel_dilation=(self.dilation, self.dilation),
                          use_bias=False, dtype=self.dtype)(ext)
        ext = nn.GroupNorm(num_groups=None, group_size=1, epsilon=1e-5, dtype=jnp.float32)(ext)
        ext = act(ext)

        # 1x1 expansion + spatial dropout (regularizer).
        ext = nn.Conv(self.channels, (1, 1), use_bias=False, dtype=self.dtype)(ext)
        ext = nn.GroupNorm(num_groups=None, group_size=1, epsilon=1e-5, dtype=jnp.float32)(ext)
        ext = nn.Dropout(self.dropout, broadcast_dims=(1, 2))(ext, deterministic=deterministic)

        # Main branch.
        main = x
        if self.downsample:
            main = nn.max_pool(x, (2, 2), strides=(2, 2))
            pad = self.channels - main.shape[-1]
            if pad > 0:
                main = jnp.pad(main, ((0, 0), (0, 0), (0, 0), (0, pad)))
        elif self.upsample:
            main = nn.Conv(self.channels, (1, 1), use_bias=False, dtype=self.dtype)(main)
            main = nn.GroupNorm(num_groups=None, group_size=1, epsilon=1e-5, dtype=jnp.float32)(main)
            n, h, w, c = main.shape
            main = jnp.repeat(jnp.repeat(main, 2, axis=1), 2, axis=2)
        elif main.shape[-1] != self.channels:
            main = nn.Conv(self.channels, (1, 1), use_bias=False, dtype=self.dtype)(main)

        return act(main + ext)


class DecoderHead(nn.Module):
    """Stage-5 decoder head: upsample + regular + final transposed conv
    (one per output head, contour_uncertainty/models/enet.py:91-108)."""

    init_channels: int
    out_channels: int
    dropout: float
    relu: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        x = Bottleneck(self.init_channels, upsample=True, dropout=self.dropout,
                       relu=self.relu, dtype=self.dtype)(x, deterministic=deterministic)
        x = Bottleneck(self.init_channels, dropout=self.dropout, relu=self.relu,
                       dtype=self.dtype)(x, deterministic=deterministic)
        x = nn.ConvTranspose(self.out_channels, (3, 3), strides=(2, 2), padding="SAME",
                             use_bias=False, dtype=self.dtype)(x)
        return x.astype(jnp.float32)


class Enet(nn.Module):
    """ENet with the project's multi-head / SSN / bottleneck-out extensions.

    __call__ accepts NCHW and returns the same dict layout as UNet:
    {"out", "ssn": [...], "bottleneck"}.
    """

    input_shape: Sequence[int]  # (C, H, W)
    output_shape: Sequence[int]  # (C_out, H, W)
    init_channels: int = 16
    dropout: float = 0.1
    encoder_relu: bool = True
    decoder_relu: bool = True
    bottleneck_out: bool = False
    n_heads: int = 1
    ssn_rank: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False, deterministic: Optional[bool] = None):
        if deterministic is None:
            deterministic = not train
        det = deterministic
        c0 = self.init_channels
        drop = self.dropout
        enc = self.encoder_relu
        x = jnp.transpose(x, (0, 2, 3, 1)).astype(self.dtype)

        out = InitialBlock(c0, relu=enc, dtype=self.dtype)(x)

        # Stage 1: downsample to 2*c0 + 4 regular bottlenecks (dropout/10).
        out = Bottleneck(2 * c0, downsample=True, dropout=drop / 10, relu=enc,
                         dtype=self.dtype)(out, deterministic=det)
        for _ in range(4):
            out = Bottleneck(2 * c0, dropout=drop / 10, relu=enc, dtype=self.dtype)(
                out, deterministic=det)

        # Stage 2: downsample to 4*c0, then dilated/asymmetric mix (x2 stages).
        out = Bottleneck(4 * c0, downsample=True, dropout=drop, relu=enc,
                         dtype=self.dtype)(out, deterministic=det)
        for _ in range(2):
            out = Bottleneck(4 * c0, dropout=drop, relu=enc, dtype=self.dtype)(out, deterministic=det)
            out = Bottleneck(4 * c0, dilation=2, dropout=drop, relu=enc, dtype=self.dtype)(out, deterministic=det)
            out = Bottleneck(4 * c0, kernel_size=5, asymmetric=True, dropout=drop,
                             relu=enc, dtype=self.dtype)(out, deterministic=det)
            out = Bottleneck(4 * c0, dilation=4, dropout=drop, relu=enc, dtype=self.dtype)(out, deterministic=det)
            out = Bottleneck(4 * c0, dropout=drop, relu=enc, dtype=self.dtype)(out, deterministic=det)
            out = Bottleneck(4 * c0, dilation=8, dropout=drop, relu=enc, dtype=self.dtype)(out, deterministic=det)
            out = Bottleneck(4 * c0, kernel_size=5, asymmetric=True, dropout=drop,
                             relu=enc, dtype=self.dtype)(out, deterministic=det)
            out = Bottleneck(4 * c0, dilation=16, dropout=drop, relu=enc, dtype=self.dtype)(out, deterministic=det)
        bottleneck_features = out

        # Stage 4: upsample to 2*c0 + 2 regular.
        out = Bottleneck(2 * c0, upsample=True, dropout=drop, relu=self.decoder_relu,
                         dtype=self.dtype)(out, deterministic=det)
        for _ in range(2):
            out = Bottleneck(2 * c0, dropout=drop, relu=self.decoder_relu,
                             dtype=self.dtype)(out, deterministic=det)

        # Stage 5 heads.
        n_classes = self.output_shape[0]
        head_sizes = [n_classes]
        if self.ssn_rank > 0:
            head_sizes = [n_classes, n_classes, n_classes * self.ssn_rank]
        elif self.n_heads > 1:
            head_sizes = [n_classes] * self.n_heads

        heads = [
            DecoderHead(c0, size, drop, self.decoder_relu, dtype=self.dtype,
                        name=f"head_{i}")(out, deterministic=det)
            for i, size in enumerate(head_sizes)
        ]
        result = {"out": jnp.transpose(heads[0], (0, 3, 1, 2))}
        if self.ssn_rank > 0:
            result["ssn"] = [jnp.transpose(h, (0, 3, 1, 2)) for h in heads[1:]]
        elif self.n_heads > 1:
            result["heads"] = [jnp.transpose(h, (0, 3, 1, 2)) for h in heads]
        if self.bottleneck_out:
            result["bottleneck"] = bottleneck_features.astype(jnp.float32)
        return result
