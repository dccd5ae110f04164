"""Fused DSNT Pallas kernel: online softmax + all spatial moments, ONE pass.

The XLA path (ops/dsnt.py) lowers to several HBM passes over the (B, K, H, W)
heatmap tensor (max, exp/sum, normalize, moment matmul) — measured 22.3
us/frame at batch 128 on v5e for the flagship 21x256^2 head. This kernel
streams the flat (B*K, H*W) logits through VMEM exactly once: per grid step a
(ROWS, LANE_CHUNK) tile is softmaxed *online* (flash-attention-style running
max/rescale) and its eight monomial moment partials are accumulated in a VMEM
scratch, so the heatmaps are read once and nothing else touches HBM.
Measured 19.5 us/frame (round 3, full-f32 moment matmul — a bf16-term matmul
is ~11.5 us/frame but corrupts small sigmas at 256^2; see _dsnt_kernel).

Layout notes (the round-1 3-D kernel took ~6 min of Mosaic compile and is
replaced by this): blocks are strictly 2-D (sublanes = heatmap rows,
lanes = pixel chunk), all reductions are single-axis, and the monomial basis
arrives as a precomputed (HW, 8) operand streamed chunk-by-chunk alongside the
logits (its traffic is 8/K of the logits' — negligible).

Capability parity: contour_uncertainty/task/regression/dsnt/utils.py:7-47
(dsnt moments incl. third central moments for the skew head).

Backward recomputes the softmax in plain XLA — the custom VJP keeps the op
differentiable with the standard softmax-moment adjoint.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_N_MOM = 8  # [1, x, y, x^2, y^2, xy, x^3, y^3]
_ROWS = 256  # heatmap rows (B*K) per grid step
_LANES = 4096  # pixels per grid step (f32 block 4 MB; 2x-buffered < 16 MB VMEM)


def _basis_cols(height: int, width: int, dtype):
    """(1, HW) normalized cell-center coordinate rows."""
    hw = height * width
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, hw), 1)
    xs = ((2.0 * (idx % width).astype(dtype) + 1.0) / width) - 1.0
    ys = ((2.0 * (idx // width).astype(dtype) + 1.0) / height) - 1.0
    return xs, ys


def _basis_matrix(height: int, width: int) -> jnp.ndarray:
    """(HW, 8) static monomial basis [1, x, y, x^2, y^2, xy, x^3, y^3]."""
    xs, ys = _basis_cols(height, width, jnp.float32)
    cols = jnp.concatenate(
        [jnp.ones_like(xs), xs, ys, xs * xs, ys * ys, xs * ys, xs**3, ys**3],
        axis=0,
    )  # (8, HW)
    return cols.T


def _dsnt_kernel(x_ref, b_ref, out_ref, m_scr, t_scr):
    """Online softmax-moment accumulation over lane chunks.

    x_ref: (ROWS, LANES) logits chunk; b_ref: (LANES, 8) f32 basis chunk.
    m_scr: (ROWS, 1) running max; t_scr: (ROWS, 8) running unnormalized
    moment sums (column 0 doubles as the softmax normalizer because basis
    column 0 is the constant 1).
    """
    c = pl.program_id(1)
    n_c = pl.num_programs(1)
    x = x_ref[:].astype(jnp.float32)
    bm = jnp.max(x, axis=1, keepdims=True)  # (ROWS, 1)

    @pl.when(c == 0)
    def _init():
        m_scr[:] = bm
        t_scr[:] = jnp.zeros_like(t_scr)

    m_old = m_scr[:]
    m_new = jnp.maximum(m_old, bm)
    alpha = jnp.exp(m_old - m_new)
    e = jnp.exp2((x - m_new) * 1.4426950408889634)  # f32

    b = b_ref[:]  # (LANES, 8) f32 basis
    # Moment partials as ONE MXU matmul: reads e from VMEM once. (The
    # 8-separate-lane-reduction VPU form re-reads e per moment and measured
    # ~8x slower despite the MXU N-padding here.) The matmul runs at FULL f32
    # precision: the variance later derives as E[x^2] - E[x]^2, and at 256^2
    # that cancellation leaves only ~(sigma_px/128)^2 ~ 1e-3 of the raw
    # moments' magnitude — bf16 terms (tried first: split-basis hi/lo limbs
    # with a bf16 exp) corrupt small sigmas by up to ~100% for off-center
    # landmarks (caught by bench.py's on-chip parity check, round 3). The
    # f32 multi-pass matmul costs ~1 us/frame extra on a ~22 MFLOP/frame op.
    part = jnp.dot(e, b, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)  # (ROWS, 8)

    t_scr[:] = t_scr[:] * alpha + part
    m_scr[:] = m_new

    @pl.when(c == n_c - 1)
    def _finalize():
        t = t_scr[:]
        out_ref[:] = t / t[:, 0:1]


def _raw_moments_pallas(
    flat_logits: jnp.ndarray, height: int, width: int, interpret: bool = False
) -> jnp.ndarray:
    """(Rows, HW) logits -> (Rows, 8) normalized raw moments, one HBM pass."""
    rows, hw = flat_logits.shape
    block_rows = min(_ROWS, rows) if interpret else _ROWS
    rows_p = -(-rows // block_rows) * block_rows
    if rows_p != rows:
        flat_logits = jnp.pad(flat_logits, ((0, rows_p - rows), (0, 0)))
    lanes = min(_LANES, hw)
    while hw % lanes:
        lanes //= 2
    assert hw % lanes == 0, (hw, lanes)
    basis = _basis_matrix(height, width)
    grid = (rows_p // block_rows, hw // lanes)
    out = pl.pallas_call(
        _dsnt_kernel,
        out_shape=jax.ShapeDtypeStruct((rows_p, _N_MOM), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, lanes), lambda r, c: (r, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lanes, _N_MOM), lambda r, c: (c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_rows, _N_MOM), lambda r, c: (r, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((block_rows, 1), jnp.float32),
            pltpu.VMEM((block_rows, _N_MOM), jnp.float32),
        ],
        interpret=interpret,
    )(flat_logits, basis)
    return out[:rows]


def _dsnt_kernel_cols(x_ref, b_ref, out_ref, m_scr, t_scr):
    """Column-layout online softmax-moment accumulation over sublane chunks.

    x_ref: (HW_BLOCK, N_BLOCK) logits chunk — heatmaps are COLUMNS (one per
    (landmark, frame) pair), pixels run down the sublanes. b_ref:
    (HW_BLOCK, 8) f32 basis chunk. m_scr: (1, N_BLOCK) running max; t_scr:
    (8, N_BLOCK) running unnormalized moment sums (row 0 is the normalizer).

    Why a second kernel with transposed orientation: the flagship head's
    1x1 output conv (21 channels) naturally emits a batch-in-lanes layout —
    physically [h][w][k][b] — and the row kernel's (B*K, HW) operand forces
    XLA to relayout the whole 704 MB heatmap tensor twice (measured 28.9
    us/frame of `copy` at batch 512, trace r3). This kernel consumes
    (HW, K*B), whose default layout IS [h][w][k][b], so the transpose+reshape
    feeding it are pure bitcasts and the copies vanish. All reductions are
    single-axis over sublanes; the moment contraction is one MXU dot_general
    over the sublane axis at full f32 precision (same sigma-cancellation
    argument as _dsnt_kernel).
    """
    j = pl.program_id(1)
    n_j = pl.num_programs(1)
    x = x_ref[:].astype(jnp.float32)
    bm = jnp.max(x, axis=0, keepdims=True)  # (1, N_BLOCK)

    @pl.when(j == 0)
    def _init():
        m_scr[:] = bm
        t_scr[:] = jnp.zeros_like(t_scr)

    m_old = m_scr[:]
    m_new = jnp.maximum(m_old, bm)
    alpha = jnp.exp(m_old - m_new)
    e = jnp.exp2((x - m_new) * 1.4426950408889634)  # f32 (HW_BLOCK, N_BLOCK)

    b = b_ref[:]  # (HW_BLOCK, 8) f32 basis
    # part[m, n] = sum_r b[r, m] * e[r, n]: contract the sublane axis on the
    # MXU; f32 throughout (see _dsnt_kernel's precision note).
    part = jax.lax.dot_general(
        b, e, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (8, N_BLOCK)

    t_scr[:] = t_scr[:] * alpha + part
    m_scr[:] = m_new

    @pl.when(j == n_j - 1)
    def _finalize():
        t = t_scr[:]
        out_ref[:] = t / t[0:1, :]


_HW_BLOCK = 2048  # sublane rows per grid step (bf16 block 2 MB at N_BLOCK=512)
_N_BLOCK = 512  # heatmap columns per grid step (flagship 512*21 = 21 blocks)


def _raw_moments_pallas_cols(
    flat_t: jnp.ndarray, height: int, width: int, interpret: bool = False
) -> jnp.ndarray:
    """(HW, N) logits columns -> (N, 8) normalized raw moments, one HBM pass."""
    hw, n = flat_t.shape
    # Block = min(512, n rounded up to the 128-lane tile): small-N callers
    # (e.g. one view's 21 landmarks in the sharded-serving dryrun) pad to one
    # 128-lane tile instead of a full 512 block (4x waste, not 24x).
    n_block = min(_N_BLOCK, n if interpret else -(-n // 128) * 128)
    n_p = -(-n // n_block) * n_block
    if n_p != n:
        # Zero-pad columns: softmax of a zero column is uniform — harmless,
        # sliced off below. (Flagship N = 512*21 divides exactly; pads only
        # cost on odd shapes.)
        flat_t = jnp.pad(flat_t, ((0, 0), (0, n_p - n)))
    hw_block = min(_HW_BLOCK, hw)
    while hw % hw_block:
        hw_block //= 2
    assert hw % hw_block == 0, (hw, hw_block)
    basis = _basis_matrix(height, width)
    grid = (n_p // n_block, hw // hw_block)
    out = pl.pallas_call(
        _dsnt_kernel_cols,
        out_shape=jax.ShapeDtypeStruct((_N_MOM, n_p), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((hw_block, n_block), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hw_block, _N_MOM), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (_N_MOM, n_block), lambda i, j: (0, i), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((1, n_block), jnp.float32),
            pltpu.VMEM((_N_MOM, n_block), jnp.float32),
        ],
        interpret=interpret,
    )(flat_t, basis)
    return out[:, :n].T


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def dsnt_raw_moments_cols(flat_t: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Differentiable fused raw moments, column layout.

    flat_t (H*W, N) — one heatmap per COLUMN — -> (N, 8). Use this from
    NCHW model heads via jnp.transpose(logits, (2, 3, 1, 0)): that physical
    order matches the conv's preferred batch-in-lanes layout so the feed is
    a bitcast (see _dsnt_kernel_cols). Same engage conditions as
    dsnt_raw_moments.
    """
    if (
        jax.default_backend() != "cpu"
        and flat_t.dtype == jnp.bfloat16
        and flat_t.shape[0] % 128 == 0
    ):
        return _raw_moments_pallas_cols(flat_t, height, width)
    return _raw_moments_xla(flat_t.T, height, width)


def _fwd_cols(flat_t, height, width):
    return dsnt_raw_moments_cols(flat_t, height, width), flat_t


def _bwd_cols(height, width, flat_t, g):
    # Same softmax-moment adjoint as _bwd, transposed: columns are pmfs.
    p = jax.nn.softmax(flat_t.astype(jnp.float32), axis=0)  # (HW, N)
    bg = jnp.dot(_basis_matrix(height, width), g.T,
                 precision=jax.lax.Precision.HIGHEST)  # (HW, N)
    inner = jnp.sum(p * bg, axis=0, keepdims=True)
    return ((p * (bg - inner)).astype(flat_t.dtype),)


dsnt_raw_moments_cols.defvjp(_fwd_cols, _bwd_cols)


def _raw_moments_xla(flat_logits: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Reference XLA path (identical math): backward recompute + CPU fallback."""
    p = jax.nn.softmax(flat_logits.astype(jnp.float32), axis=-1)
    return jnp.dot(p, _basis_matrix(height, width),
                   precision=jax.lax.Precision.HIGHEST)


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def dsnt_raw_moments(flat_logits: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Differentiable fused raw moments. flat_logits (Rows, H*W) -> (Rows, 8).

    The kernel engages only for bf16 inputs on TPU. Its moment matmul runs
    at FULL f32 HIGHEST precision regardless of input dtype (bf16 terms
    corrupt small sigmas at 256^2 — the E[x^2]-E[x]^2 cancellation leaves
    ~1e-3 of the raw moments' magnitude; caught by bench.py's on-chip
    parity gate, round 3). The bf16-only gate is a BANDWIDTH policy: f32
    callers keep the Precision.HIGHEST XLA path because the f32 DMA erases
    the kernel's one-HBM-pass gain (same policy as
    ops/dsnt.logits_to_pixel_gaussians)."""
    if (
        jax.default_backend() != "cpu"
        and flat_logits.dtype == jnp.bfloat16
        and flat_logits.shape[1] % 128 == 0
    ):
        return _raw_moments_pallas(flat_logits, height, width)
    return _raw_moments_xla(flat_logits, height, width)


def _fwd(flat_logits, height, width):
    return dsnt_raw_moments(flat_logits, height, width), flat_logits


def _bwd(height, width, flat_logits, g):
    # d/dlogits of m_j = sum_i p_i b_ij:  dx = p * (B g - sum_j(m_j g_j)).
    p = jax.nn.softmax(flat_logits.astype(jnp.float32), axis=-1)
    bg = jnp.dot(g, _basis_matrix(height, width).T,
                 precision=jax.lax.Precision.HIGHEST)  # (Rows, HW)
    inner = jnp.sum(p * bg, axis=-1, keepdims=True)
    return ((p * (bg - inner)).astype(flat_logits.dtype),)


dsnt_raw_moments.defvjp(_fwd, _bwd)


@partial(jax.jit, static_argnames=("use_covar",))
def heatmaps_to_pixel_gaussians_fused(logits: jnp.ndarray, use_covar: bool = True):
    """Drop-in fused variant of ops.dsnt.logits_to_pixel_gaussians that never
    materializes the softmax to HBM. Returns (mu, sigma) only."""
    from contouring_uncertainty_tpu.ops.dsnt import raw6_to_pixel_gaussians

    *lead, height, width = logits.shape
    flat = logits.reshape(-1, height * width)
    raw = dsnt_raw_moments(flat, height, width).reshape(*lead, _N_MOM)
    return raw6_to_pixel_gaussians(raw[..., :6], height, width, use_covar)
