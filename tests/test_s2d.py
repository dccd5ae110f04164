"""Space-to-depth conv algebra vs jax.lax conv oracles.

These tests pin down the exact layout/weight conventions the fused Pallas
serving kernels must reproduce (ops/s2d.py docstring)."""

import jax
import jax.numpy as jnp
import numpy as np

from contouring_uncertainty_tpu.ops import s2d as S


def _conv(x, w, strides=(1, 1), padding="SAME"):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=strides, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def test_s2d_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 8, 12, 5)).astype(np.float32))
    y = S.from_s2d(S.to_s2d(x), 8, 12)
    np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_conv3x3_phase0_to_phase1_matches_lax():
    rng = np.random.default_rng(1)
    n, h, w_, cin, cout = 2, 16, 24, 6, 5
    x = jnp.asarray(rng.normal(size=(n, h, w_, cin)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, cin, cout)).astype(np.float32))
    ref = _conv(x, w)  # SAME stride 1

    w_eff = S.conv3x3_weight_to_s2d(w)
    out = S.s2d_conv_reference(S.to_s2d(x), w_eff, (h // 2, w_ // 2), True)
    out = out * S.phase1_valid_mask(h // 2, w_ // 2, cout)[None]

    expected = S.phase0_to_phase1(S.to_s2d(ref), h // 2, w_ // 2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               rtol=1e-5, atol=1e-5)


def test_conv3x3_phase1_to_phase0_matches_lax():
    rng = np.random.default_rng(2)
    n, h, w_, cin, cout = 2, 16, 16, 5, 7
    y = jnp.asarray(rng.normal(size=(n, h, w_, cin)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, cin, cout)).astype(np.float32))
    ref = _conv(y, w)

    gh, gw = h // 2, w_ // 2
    y_p1 = S.phase0_to_phase1(S.to_s2d(y), gh, gw)  # (n, (gh+1)(gw+1), 4cin)
    w_eff = S.conv3x3_weight_to_s2d(w)
    out = S.s2d_conv_reference(y_p1, w_eff, (gh + 1, gw + 1), False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(S.to_s2d(ref)),
                               rtol=1e-5, atol=1e-5)


def test_conv3x3_grouped_concat_inputs():
    """Conv over a channel-concat [a, b] where a and b are gathered as
    separate s2d tensors (the upsample||skip fusion)."""
    rng = np.random.default_rng(3)
    n, h, w_, ca, cb, cout = 2, 8, 8, 3, 4, 6
    a = jnp.asarray(rng.normal(size=(n, h, w_, ca)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(n, h, w_, cb)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, ca + cb, cout)).astype(np.float32))
    ref = _conv(jnp.concatenate([a, b], axis=-1), w)

    x_s2d = jnp.concatenate([S.to_s2d(a), S.to_s2d(b)], axis=-1)
    w_eff = S.conv3x3_weight_to_s2d(w, groups=[ca, cb])
    out = S.s2d_conv_reference(x_s2d, w_eff, (h // 2, w_ // 2), True)
    out = out * S.phase1_valid_mask(h // 2, w_ // 2, cout)[None]
    expected = S.phase0_to_phase1(S.to_s2d(ref), h // 2, w_ // 2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               rtol=1e-5, atol=1e-5)


def test_convT_2x2_is_pointwise_matmul():
    rng = np.random.default_rng(4)
    n, h, w_, cin, cout = 2, 8, 8, 6, 4
    x = jnp.asarray(rng.normal(size=(n, h, w_, cin)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(2, 2, cin, cout)).astype(np.float32))
    # flax ConvTranspose(features, (2,2), strides=(2,2), padding="VALID")
    ref = jax.lax.conv_transpose(
        x, w, strides=(2, 2), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # (n, 2h, 2w, cout)
    wt = S.convT2x2_weight_to_s2d(w)
    out = jnp.einsum("npi,io->npo", x.reshape(n, h * w_, cin), wt)
    np.testing.assert_allclose(np.asarray(out), np.asarray(S.to_s2d(ref)),
                               rtol=1e-5, atol=1e-5)


def test_conv1x1_s2d_blockdiag():
    rng = np.random.default_rng(5)
    n, h, w_, cin, cout = 2, 8, 8, 5, 3
    x = jnp.asarray(rng.normal(size=(n, h, w_, cin)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(cin, cout)).astype(np.float32))
    ref = jnp.einsum("nhwc,co->nhwo", x, w)
    wk = S.conv1x1_weight_to_s2d(w)
    out = jnp.einsum("npi,io->npo", S.to_s2d(x), wk)
    np.testing.assert_allclose(np.asarray(out), np.asarray(S.to_s2d(ref)),
                               rtol=1e-5, atol=1e-5)


def test_conv3x3_stride2_on_s2d_input():
    """Stride-2 SAME conv consuming a phase-0 s2d tensor as an (H/2, W/2, 4C)
    image with a (2,2) kernel and padding ((0,1),(0,1))."""
    rng = np.random.default_rng(6)
    n, h, w_, cin, cout = 2, 16, 16, 4, 9
    x = jnp.asarray(rng.normal(size=(n, h, w_, cin)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, cin, cout)).astype(np.float32))
    ref = _conv(x, w, strides=(2, 2))  # (n, h/2, w/2, cout)

    xs = S.to_s2d(x).reshape(n, h // 2, w_ // 2, 4 * cin)
    w2 = S.conv3x3s2_weight_to_s2d(w)
    out = jax.lax.conv_general_dilated(
        xs, w2, window_strides=(1, 1), padding=((0, 1), (0, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
