"""nnU-Net-style dynamic U-Net in Flax (NHWC, bf16-friendly).

Capability parity with the reference UNet
(contour_uncertainty/models/nnUnet/unet2.py:37-208 and layers.py): 8 stages,
filters min(2^(5+i), 480), double-conv blocks of
conv -> [channel dropout] -> instance norm -> leaky ReLU, optional residual
blocks, attention-gated skips, deep supervision, SSN heads (mean / sigma /
low-rank factor), `drop_block` MC-dropout in the two deepest encoder stages +
bottleneck, bottleneck feature output feeding a ConfidenceNet skew head.

TPU-first design choices:
- NHWC layout end-to-end (XLA's native conv layout on TPU).
- A `dtype` knob runs all convs in bfloat16 with float32 params/norms.
- Dropout uses flax's deterministic flag; MC-dropout at inference is just
  `deterministic=False` with a fresh key per epistemic sample — no module
  patching (the reference monkey-patches torch modules, utils/mcdropout.py).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

# Matches torch kaiming_normal_(a=negative_slope) used by the reference
# (unet2.py:309-314): N(0, sqrt(2 / ((1 + a^2) fan_in))).
_KAIMING = nn.initializers.variance_scaling(
    2.0 / (1.0 + 0.01 ** 2), "fan_in", "truncated_normal"
)


class InstanceNorm(nn.Module):
    """Instance norm with f32 statistics but activations stored in `dtype`.

    Keeping the stored tensor in the compute dtype matters on TPU: with the
    stock f32 GroupNorm between bf16 convs every layer boundary reads/writes
    f32 activations and the early 256^2 stages become HBM-bound (measured
    ~2x traffic). Here the f32 math lives only inside the fusion; params stay
    f32.
    """

    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        xf = x.astype(jnp.float32)
        # Single-pass statistics (E[x^2] - E[x]^2): one read of x for both
        # moments — the two-pass (x - mean)^2 form costs an extra HBM pass.
        mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
        mean2 = jnp.mean(jnp.square(xf), axis=(1, 2), keepdims=True)
        var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias
        return y.astype(self.dtype)


def torch_padding(kernel_size) -> tuple:
    """Symmetric torch-style padding ((k//2, k//2), ...).

    NOT XLA's "SAME": for stride-2 convs on even inputs SAME pads (0, 1)
    while torch pads (k//2, k//2) on both sides, shifting every downsample
    by one pixel — caught by tests/test_reference_model_parity.py, which
    runs the reference's own torch UNet with ported weights.
    """
    return tuple((k // 2, k // 2) for k in kernel_size)


class ConvLayer(nn.Module):
    """conv -> [drop] -> instance norm -> leaky relu."""

    features: int
    kernel_size: Sequence[int] = (3, 3)
    strides: Sequence[int] = (1, 1)
    negative_slope: float = 1e-2
    drop_block: bool = False
    drop_rate: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        x = nn.Conv(
            self.features,
            tuple(self.kernel_size),
            strides=tuple(self.strides),
            padding=torch_padding(self.kernel_size),
            kernel_init=_KAIMING,
            dtype=self.dtype,
        )(x)
        if self.drop_block:
            # Channel dropout (torch Dropout2d): broadcast over H, W.
            x = nn.Dropout(self.drop_rate, broadcast_dims=(1, 2))(
                x, deterministic=deterministic
            )
        x = InstanceNorm(dtype=self.dtype)(x)
        return nn.leaky_relu(x, self.negative_slope)


class ConvBlock(nn.Module):
    """Double ConvLayer; first carries the stage stride."""

    features: int
    kernel_size: Sequence[int] = (3, 3)
    strides: Sequence[int] = (1, 1)
    negative_slope: float = 1e-2
    drop_block: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        x = ConvLayer(
            self.features, self.kernel_size, self.strides,
            self.negative_slope, self.drop_block, dtype=self.dtype,
        )(x, deterministic=deterministic)
        x = ConvLayer(
            self.features, self.kernel_size, (1, 1),
            self.negative_slope, self.drop_block, dtype=self.dtype,
        )(x, deterministic=deterministic)
        return x


class ResidBlock(nn.Module):
    """Residual double-conv block (reference layers.py ResidBlock)."""

    features: int
    kernel_size: Sequence[int] = (3, 3)
    strides: Sequence[int] = (1, 1)
    negative_slope: float = 1e-2
    drop_block: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        residual = x
        out = ConvLayer(
            self.features, self.kernel_size, self.strides,
            self.negative_slope, self.drop_block, dtype=self.dtype,
        )(x, deterministic=deterministic)
        out = nn.Conv(
            self.features, tuple(self.kernel_size),
            padding=torch_padding(self.kernel_size),
            kernel_init=_KAIMING, dtype=self.dtype,
        )(out)
        if self.drop_block:
            out = nn.Dropout(0.5, broadcast_dims=(1, 2))(out, deterministic=deterministic)
        out = InstanceNorm(dtype=self.dtype)(out)
        needs_proj = max(self.strides) > 1 or x.shape[-1] != self.features
        if needs_proj:
            residual = nn.Conv(
                self.features, tuple(self.kernel_size), strides=tuple(self.strides),
                padding=torch_padding(self.kernel_size),
                kernel_init=_KAIMING, dtype=self.dtype,
            )(residual)
            if self.drop_block:
                residual = nn.Dropout(0.5, broadcast_dims=(1, 2))(
                    residual, deterministic=deterministic
                )
            residual = InstanceNorm(dtype=self.dtype)(residual)
        return nn.leaky_relu(out + residual, self.negative_slope)


class AttentionGate(nn.Module):
    """Additive attention gate on a skip connection (reference AttentionLayer use)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, gate, skip):
        def att_layer(h, f):
            h = nn.Conv(f, (3, 3), padding=torch_padding((3, 3)),
                        kernel_init=_KAIMING, dtype=self.dtype)(h)
            return InstanceNorm(dtype=self.dtype)(h)

        half = self.features // 2
        g = att_layer(gate, half)
        s = att_layer(skip, half)
        psi = att_layer(nn.relu(g + s), 1)
        return skip * nn.sigmoid(psi)


class UpsampleBlock(nn.Module):
    """Transposed conv upsample + (gated) skip concat + double conv."""

    features: int
    kernel_size: Sequence[int] = (3, 3)
    strides: Sequence[int] = (2, 2)
    negative_slope: float = 1e-2
    attention: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skip, *, deterministic: bool = True):
        x = nn.ConvTranspose(
            self.features, tuple(self.strides), strides=tuple(self.strides),
            padding="VALID", use_bias=False, kernel_init=_KAIMING, dtype=self.dtype,
        )(x)
        if self.attention:
            skip = AttentionGate(self.features, dtype=self.dtype)(x, skip)
        x = jnp.concatenate([x, skip], axis=-1)
        return ConvBlock(
            self.features, self.kernel_size, (1, 1),
            self.negative_slope, False, dtype=self.dtype,
        )(x, deterministic=deterministic)


class OutputBlock(nn.Module):
    """1x1 conv head (reference OutputBlock; bias off by default).

    `out_dtype` controls the emitted dtype: f32 by default; the flagship
    serving path emits bf16 so the fused Pallas DSNT kernel can stream the
    heatmaps without an extra f32 cast pass (the head's f32 write alone is
    ~10 us/frame of HBM traffic at 256^2 x K21).
    """

    features: int
    use_bias: bool = False
    dtype: Any = jnp.float32
    out_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.features, (1, 1), use_bias=self.use_bias,
            kernel_init=_KAIMING, dtype=self.dtype,
        )(x).astype(self.out_dtype)


class ConfidenceNet(nn.Module):
    """Bottleneck (N, Hb, Wb, 480) -> (N, output_size) skew head
    (reference unet2.py:14-34)."""

    output_size: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for _ in range(3):
            x = nn.Conv(128, (3, 3), padding=torch_padding((3, 3)),
                        kernel_init=_KAIMING, dtype=self.dtype)(x)
            x = nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        return nn.Dense(self.output_size, dtype=self.dtype)(x).astype(jnp.float32)


class UNet(nn.Module):
    """Dynamic 2D U-Net.

    Args mirror the reference constructor (unet2.py:58-96). `output_shape[0]`
    is the number of output channels (K heatmaps or classes).

    __call__ returns a dict:
        out: (N, C_out, H, W) main head   (NCHW to match task-side math)
        deep_supervision: list of lower-res heads (train + deep_supervision)
        ssn: list of extra SSN heads
        bottleneck: (N, Hb, Wb, 480) features when bottleneck_out
    """

    input_shape: Sequence[int]  # (C, H, W)
    output_shape: Sequence[int]  # (C_out, H, W)
    kernels: Sequence[Sequence[int]] = ((3, 3),) * 8
    strides: Sequence[Sequence[int]] = ((1, 1),) + ((2, 2),) * 7
    negative_slope: float = 1e-2
    deep_supervision: bool = False
    attention: bool = False
    drop_block: bool = False
    residual: bool = False
    out_seg_bias: bool = False
    ssn_rank: int = 0
    bottleneck_out: bool = False
    dtype: Any = jnp.float32
    head_dtype: Any = jnp.float32  # main-head output dtype (bf16 on serving)

    @property
    def filters(self):
        return [min(2 ** (5 + i), 480) for i in range(len(self.strides))]

    @nn.compact
    def __call__(self, x, *, train: bool = False, deterministic: Optional[bool] = None,
                 mode: str = "full", prefix: Optional[dict] = None):
        """mode selects which slice of the network runs:

        - "full" (default): the whole network.
        - "encode_prefix": only the deterministic encoder prefix — the stem
          plus every encoder stage BEFORE the first `drop_block` stage (the
          dropout lives in the two deepest encoder stages + bottleneck, so
          with the flagship 8-stage net this is the FLOP-heavy 256^2..16^2
          part). Returns {"skips": [...]} — per-sample deterministic, hence
          identical across MC-dropout epistemic samples.
        - "decode_from_prefix": the stochastic tail (remaining encoder
          stages + bottleneck + decoder + heads) from `prefix` (the
          encode_prefix output, possibly tiled along batch); `x` is ignored.

        The MC-dropout predict path (tasks/dsnt_al.py) computes the prefix
        once per frame and tiles it T_e times instead of re-running the
        high-resolution encoder T_e times on identical inputs — an exact
        algorithmic de-dup (the prefix has no dropout), worth ~25-30% of the
        epistemic forward FLOPs at t_e=10.
        """
        if deterministic is None:
            deterministic = not train
        filters = self.filters
        n_classes = self.output_shape[0]
        block = ResidBlock if self.residual else ConvBlock
        n_down = len(filters) - 2
        drop_flags = [self.drop_block and (n_down - i) <= 2 for i in range(n_down)]
        # First stochastic encoder stage; the prefix is everything before it.
        first_drop = next((i for i, f in enumerate(drop_flags) if f), n_down)

        # Stage blocks carry explicit names matching flax's auto-naming of the
        # original single-pass implementation (ConvBlock_0..) so checkpoints
        # are unchanged and the three modes address identical params even
        # though each instantiates only the blocks it calls.
        def stage(idx: int, use_drop: bool):
            f = filters[idx] if idx <= n_down else filters[-1]
            return block(f, self.kernels[idx], self.strides[idx],
                         self.negative_slope, use_drop, dtype=self.dtype,
                         name=f"{block.__name__}_{idx}")

        if mode == "decode_from_prefix":
            if prefix is None:
                raise ValueError("mode='decode_from_prefix' requires prefix=")
            skips = [s.astype(self.dtype) for s in prefix["skips"]]
            out = skips[-1]
        else:
            # Accept NCHW (reference convention) and run NHWC internally.
            x = jnp.transpose(x, (0, 2, 3, 1)).astype(self.dtype)
            out = stage(0, False)(x, deterministic=deterministic)
            skips = [out]
            stop = first_drop if mode == "encode_prefix" else n_down
            for i in range(stop):
                # drop_block only in the two deepest encoder stages (unet2.py:303).
                out = stage(i + 1, drop_flags[i])(out, deterministic=deterministic)
                skips.append(out)
            if mode == "encode_prefix":
                return {"skips": skips}

        if mode == "decode_from_prefix":
            for i in range(first_drop, n_down):
                out = stage(i + 1, drop_flags[i])(out, deterministic=deterministic)
                skips.append(out)
        out = stage(n_down + 1, self.drop_block)(out, deterministic=deterministic)
        bottleneck = out

        decoder_outputs = []
        up_filters = filters[:-1][::-1]
        up_kernels = list(self.kernels[1:])[::-1]
        up_strides = list(self.strides[1:])[::-1]
        for i, skip in enumerate(reversed(skips)):
            out = UpsampleBlock(up_filters[i], up_kernels[i], up_strides[i],
                                self.negative_slope, self.attention, dtype=self.dtype)(
                out, skip, deterministic=deterministic)
            decoder_outputs.append(out)

        upsample_out = out
        # The head conv computes at the WIDER of (trunk, head) dtype: for the
        # matched configs (f32/f32, bf16/bf16) this is a no-op, but for the
        # mixed serving mode (dtype=bf16, head_dtype=f32) it makes the head
        # emit true f32 logits (f32 conv of the bf16 features) instead of a
        # degenerate upcast of bf16-rounded logits — without this, mixed mode
        # is bit-identical to full bf16 (measured: tools/bf16_accuracy.py).
        head_compute = jnp.promote_types(self.dtype, self.head_dtype)
        main = OutputBlock(n_classes, self.out_seg_bias, dtype=head_compute,
                           out_dtype=self.head_dtype)(out)

        result = {"out": jnp.transpose(main, (0, 3, 1, 2))}

        if self.deep_supervision and train:
            ds = []
            # Heads on all decoder levels except the two lowest resolutions
            # (unet2.py:196-199: decoder_outputs[2:-1] reversed).
            for j, dec in enumerate(decoder_outputs[2:-1][::-1]):
                level = len(decoder_outputs) - 1 - (j + 2) + 1  # filters index
                head = OutputBlock(n_classes, self.out_seg_bias, dtype=self.dtype,
                                   name=f"deep_supervision_{j}")(dec)
                ds.append(jnp.transpose(head, (0, 3, 1, 2)))
            result["deep_supervision"] = ds

        if self.ssn_rank != 0:
            ssn_heads = [OutputBlock(n_classes, dtype=self.dtype, name="ssn_sigma")(upsample_out)]
            if self.ssn_rank > 1:
                ssn_heads.append(
                    OutputBlock(n_classes * self.ssn_rank, dtype=self.dtype,
                                name="ssn_factor")(upsample_out)
                )
            result["ssn"] = [jnp.transpose(h, (0, 3, 1, 2)) for h in ssn_heads]

        if self.bottleneck_out:
            result["bottleneck"] = bottleneck.astype(jnp.float32)
        return result
