"""Space-to-depth (s2d) convolution algebra for the fused TPU serving engine.

Why: the flagship UNet's high-resolution stages have 32/64 channels, so a
direct NHWC conv pads the MXU's N (output-channel) dimension 2-4x and its
activations dominate HBM traffic (measured: encoder s0 + decoder U7 + head
~170 of 320 us/frame). Packing 2x2 output pixels into lanes makes every
matmul dimension a multiple of 128 for C in {32, 64}:

    layout: image (H, W, C) -> sp grid (H/2 * W/2, 4C), lane = (2dy+dx)*C + c

A 3x3 stride-1 SAME conv then consumes a 2x2 super-pixel window (16C lanes,
vs 9C useful -> 1.78x MACs) and produces one 4C-lane super-pixel, i.e. ONE
dense (M, 16C) x (16C, 4C_out) matmul. Chaining two convs alternates the
grid *phase* (see below) so a double-conv block never leaves VMEM.

Phases: a 3x3 conv consuming phase-p super-pixels produces phase-(p-1) ones,
where phase-0 sp (i,j) covers pixels (2i..2i+1, 2j..2j+1) and phase-1 sp
(i,j) covers (2i-1..2i, 2j-1..2j) on a (H/2+1, W/2+1) grid whose border rows
hold non-existent (zero-pad) pixels. Both conv directions gather the same
2x2-sp window with the SAME weight index map ky = 2*sy + ty - dy (derivation
in the builder docstring); only the gather base differs (phase0->1 gathers
sps (i-1+sy, j-1+sx); phase1->0 gathers (i+sy, j+sx)).

This module holds the pure-XLA pieces: layout transforms, weight
transformers, and a reference conv implementation used to validate the
Pallas kernel's gather semantics. Replaces the hot chain of the reference's
nnU-Net (contour_uncertainty/models/nnUnet/unet2.py:109-208) on the serving
path; trained flax parameters are consumed unchanged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def to_s2d(x: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, C) -> (N, H/2*W/2, 4C) phase-0 s2d, lane = (2dy+dx)*C + c."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))  # (n, gh, gw, dy, dx, c)
    return x.reshape(n, (h // 2) * (w // 2), 4 * c)


def from_s2d(x: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """(N, H/2*W/2, 4C) phase-0 s2d -> (N, H, W, C)."""
    n, _, c4 = x.shape
    c = c4 // 4
    x = x.reshape(n, height // 2, width // 2, 2, 2, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(n, height, width, c)


def conv3x3_weight_to_s2d(w: jnp.ndarray, groups=None) -> jnp.ndarray:
    """(3, 3, Cin, Cout) conv kernel -> (16*Cin, 4*Cout) s2d matmul weights.

    Row order matches the kernel's patch gather:
        row = ((2*sy + sx) * n_groups + g) * 4*Cg  +  (2*ty + tx) * Cg + cg
    i.e. super-pixel-major, then input-tensor group (for fused concats),
    then tap-major lanes. Column = (2*dy + dx) * Cout + co.

    Index map: output sub-pixel (dy, dx) at kernel tap (ky, kx) reads the
    input pixel whose containing gathered sp is (sy, sx) with sub-position
    (ty, tx), where ky = 2*sy + ty - dy (and same in x). Both the
    phase0->phase1 and phase1->phase0 convs satisfy this with their
    respective gather bases.

    `groups`: split of Cin for concatenated inputs gathered as separate
    s2d tensors (e.g. [32, 32] for upsample||skip). Default: single group.
    """
    kh, kw, cin, cout = w.shape
    assert (kh, kw) == (3, 3)
    groups = list(groups or [cin])
    assert sum(groups) == cin
    n_g = len(groups)
    w_eff = jnp.zeros((2, 2, n_g, 2, 2, max(groups), 2, 2, cout), w.dtype)
    # indices: [sy, sx, g, ty, tx, cg, dy, dx, co]
    g_off = np.cumsum([0] + groups)
    for dy in range(2):
        for dx in range(2):
            for ky in range(3):
                for kx in range(3):
                    sy, ty = divmod(ky + dy, 2)
                    sx, tx = divmod(kx + dx, 2)
                    for g, cg in enumerate(groups):
                        w_eff = w_eff.at[sy, sx, g, ty, tx, :cg, dy, dx, :].set(
                            w[ky, kx, g_off[g]:g_off[g] + cg, :]
                        )
    if len(set(groups)) == 1:
        return w_eff.reshape(16 * cin, 4 * cout)
    # ragged groups: drop the padded channel tail per group
    parts = []
    flat = w_eff.reshape(4 * n_g, 4, max(groups), 4 * cout)
    for blk in range(4 * n_g):
        cg = groups[blk % n_g]
        parts.append(flat[blk, :, :cg, :].reshape(4 * cg, 4 * cout))
    return jnp.concatenate(parts, axis=0)


def convT2x2_weight_to_s2d(w: jnp.ndarray) -> jnp.ndarray:
    """(2, 2, Cin, Cout) stride-2 VALID transposed-conv kernel ->
    (Cin, 4*Cout): in s2d each output phase-0 super-pixel is produced from
    exactly one input pixel, so the upsample is a pointwise matmul.

    lax.conv_transpose (and flax ConvTranspose) mirror the kernel spatially:
    output sub-pixel (dy, dx) receives w[1-dy, 1-dx] (probed empirically)."""
    kh, kw, cin, cout = w.shape
    assert (kh, kw) == (2, 2)
    return jnp.transpose(w[::-1, ::-1], (2, 0, 1, 3)).reshape(cin, 4 * cout)


def conv1x1_weight_to_s2d(w: jnp.ndarray) -> jnp.ndarray:
    """(Cin, Cout) 1x1 conv -> (4*Cin, 4*Cout) block-diagonal s2d matmul."""
    cin, cout = w.shape
    eye = jnp.eye(4, dtype=w.dtype)
    return jnp.einsum("td,io->tido", eye, w).reshape(4 * cin, 4 * cout)


def conv3x3s2_weight_to_s2d(w: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, Cin, Cout) stride-2 SAME conv -> (2, 2, 4*Cin, Cout) kernel for
    an XLA conv applied directly on the phase-0 s2d tensor viewed as an
    (H/2, W/2, 4Cin) image with stride 1 and padding ((0,1),(0,1)).

    XLA's SAME padding for stride 2 / window 3 on even sizes is (0, 1)
    (probed with a delta input), so output pixel (o,p) reads input pixels
    (2o..2o+2, 2p..2p+2) = s2d sps (o..o+1, p..p+1); input tap (sy, ty)
    maps to kernel row ky = 2*sy + ty (invalid (sy,ty)=(1,1) -> zero).
    """
    kh, kw, cin, cout = w.shape
    assert (kh, kw) == (3, 3)
    w_eff = jnp.zeros((2, 2, 2, 2, cin, cout), w.dtype)  # [sy, sx, ty, tx, ...]
    for ky in range(3):
        for kx in range(3):
            sy, ty = divmod(ky, 2)
            sx, tx = divmod(kx, 2)
            w_eff = w_eff.at[sy, sx, ty, tx].set(w[ky, kx])
    # lane order within an sp is (2ty+tx)*C + c
    return w_eff.reshape(2, 2, 4 * cin, cout)


def s2d_conv_reference(
    x_s2d: jnp.ndarray,
    w_eff: jnp.ndarray,
    in_grid: tuple,
    to_phase1: bool,
    bias: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Pure-XLA reference of the fused kernel's gather + matmul semantics.

    x_s2d: (N, Gh*Gw, 4C) at phase 0 (to_phase1=True) or the (N, (Gh+1)^2-
    style grid, 4C) phase-1 tensor (to_phase1=False). Returns the s2d conv
    output at the opposite phase. Used only by tests to pin down the
    conventions the Pallas kernel must reproduce.
    """
    n, _, c4 = x_s2d.shape
    gh, gw = in_grid
    x = x_s2d.reshape(n, gh, gw, c4)
    if to_phase1:
        # out grid (gh+1, gw+1); gather base (i-1, j-1)
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        oh, ow = gh + 1, gw + 1
        base = 0
    else:
        # phase1 -> phase0: out grid (gh-1, gw-1); gather base (i, j)
        xp = x
        oh, ow = gh - 1, gw - 1
        base = 0
    blocks = []
    for sy in range(2):
        for sx in range(2):
            blocks.append(
                jax.lax.dynamic_slice(
                    xp, (0, base + sy, base + sx, 0), (n, oh, ow, c4)
                )
            )
    patches = jnp.concatenate(blocks, axis=-1)  # (n, oh, ow, 16C)
    out = jnp.einsum("nhwk,ko->nhwo", patches, w_eff)
    if bias is not None:
        out = out + jnp.tile(bias, 4)[None, None, None, :]
    return out.reshape(n, oh * ow, w_eff.shape[1])


def phase1_valid_mask(gh: int, gw: int, c_out: int) -> jnp.ndarray:
    """((Gh+1)*(Gw+1), 4*C) float mask: 1 where the phase-1 position is a
    real image pixel, 0 on non-existent border pixels (row -1 / H, col -1 /
    W). Applied to the phase-1 conv output before it is stored: those
    positions are the zero padding of the next conv AND must not pollute
    instance-norm statistics."""
    oh, ow = gh + 1, gw + 1
    i = np.arange(oh)[:, None, None, None]
    j = np.arange(ow)[None, :, None, None]
    dy = np.array([0, 0, 1, 1])[None, None, :, None]
    dx = np.array([0, 1, 0, 1])[None, None, :, None]
    py = 2 * i - 1 + dy
    px = 2 * j - 1 + dx
    ok = (py >= 0) & (py < 2 * gh) & (px >= 0) & (px < 2 * gw)
    ok = np.broadcast_to(ok, (oh, ow, 4, c_out))
    return jnp.asarray(ok.reshape(oh * ow, 4 * c_out), jnp.float32)


def phase0_to_phase1(x: jnp.ndarray, gh: int, gw: int) -> jnp.ndarray:
    """Re-slice a phase-0 (N, Gh*Gw, 4C) tensor into phase-1
    (N, (Gh+1)*(Gw+1), 4C) with zeros at non-existent pixels (test helper)."""
    n, _, c4 = x.shape
    c = c4 // 4
    img = from_s2d(x, 2 * gh, 2 * gw)
    imgp = jnp.pad(img, ((0, 0), (1, 1), (1, 1), (0, 0)))
    xs = imgp.reshape(n, gh + 1, 2, gw + 1, 2, c)
    xs = jnp.transpose(xs, (0, 1, 3, 2, 4, 5))
    return xs.reshape(n, (gh + 1) * (gw + 1), 4 * c)
