"""UNet shape/flag coverage (reference model checks were torchinfo __main__
blocks, unet2.py:380-406; here they are real tests)."""

import numpy as np
import jax
import jax.numpy as jnp

from contouring_uncertainty_tpu.models import ConfidenceNet, UNet

SMALL = dict(
    kernels=((3, 3),) * 5,
    strides=((1, 1),) + ((2, 2),) * 4,
)


def _init_apply(model, shape=(2, 1, 64, 64), **apply_kwargs):
    x = jnp.zeros(shape, jnp.float32)
    variables = model.init(jax.random.key(0), x)
    rngs = apply_kwargs.pop("rngs", None)
    out = model.apply(variables, x, rngs=rngs, **apply_kwargs)
    return variables, out


def test_unet_output_shape():
    model = UNet(input_shape=(1, 64, 64), output_shape=(21, 64, 64), **SMALL)
    _, out = _init_apply(model)
    assert out["out"].shape == (2, 21, 64, 64)


def test_unet_filters_match_reference_rule():
    model = UNet(input_shape=(1, 256, 256), output_shape=(21, 256, 256))
    assert model.filters == [32, 64, 128, 256, 480, 480, 480, 480]


def test_unet_bottleneck_out():
    model = UNet(input_shape=(1, 64, 64), output_shape=(21, 64, 64),
                 bottleneck_out=True, **SMALL)
    _, out = _init_apply(model)
    # 5 stages on 64x64 -> bottleneck 4x4 at filters[-1]=480.
    assert out["bottleneck"].shape == (2, 4, 4, 480)


def test_unet_ssn_heads():
    model = UNet(input_shape=(1, 64, 64), output_shape=(4, 64, 64),
                 ssn_rank=2, **SMALL)
    _, out = _init_apply(model)
    assert len(out["ssn"]) == 2
    assert out["ssn"][0].shape == (2, 4, 64, 64)
    assert out["ssn"][1].shape == (2, 8, 64, 64)  # rank * classes


def test_unet_deep_supervision_train_only():
    model = UNet(input_shape=(1, 64, 64), output_shape=(4, 64, 64),
                 deep_supervision=True, **SMALL)
    x = jnp.zeros((2, 1, 64, 64))
    variables = model.init(jax.random.key(0), x, train=True)
    out_train = model.apply(variables, x, train=True)
    out_eval = model.apply(variables, x, train=False)
    assert "deep_supervision" in out_train and len(out_train["deep_supervision"]) > 0
    assert "deep_supervision" not in out_eval


def test_unet_mc_dropout_is_stochastic():
    model = UNet(input_shape=(1, 64, 64), output_shape=(4, 64, 64),
                 drop_block=True, **SMALL)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 1, 64, 64)), jnp.float32)
    variables = model.init(jax.random.key(0), x)
    o1 = model.apply(variables, x, deterministic=False, rngs={"dropout": jax.random.key(1)})
    o2 = model.apply(variables, x, deterministic=False, rngs={"dropout": jax.random.key(2)})
    od = model.apply(variables, x, deterministic=True)
    assert not np.allclose(np.asarray(o1["out"]), np.asarray(o2["out"]))
    assert np.isfinite(np.asarray(od["out"])).all()


def test_unet_residual_and_attention_compile():
    model = UNet(input_shape=(1, 32, 32), output_shape=(4, 32, 32),
                 residual=True, attention=True,
                 kernels=((3, 3),) * 4, strides=((1, 1),) + ((2, 2),) * 3)
    _, out = _init_apply(model, shape=(1, 1, 32, 32))
    assert out["out"].shape == (1, 4, 32, 32)


def test_confidence_net_shape():
    model = ConfidenceNet(output_size=42)
    x = jnp.zeros((3, 2, 2, 480))
    variables = model.init(jax.random.key(0), x)
    out = model.apply(variables, x)
    assert out.shape == (3, 42)


def test_unet_bf16_compute_f32_out():
    model = UNet(input_shape=(1, 64, 64), output_shape=(4, 64, 64),
                 dtype=jnp.bfloat16, **SMALL)
    _, out = _init_apply(model)
    assert out["out"].dtype == jnp.float32


def test_enet_output_and_heads():
    from contouring_uncertainty_tpu.models.enet import Enet

    model = Enet(input_shape=(1, 64, 64), output_shape=(4, 64, 64))
    x = jnp.zeros((2, 1, 64, 64))
    variables = model.init(jax.random.key(0), x)
    out = model.apply(variables, x)
    assert out["out"].shape == (2, 4, 64, 64)

    ssn_model = Enet(input_shape=(1, 64, 64), output_shape=(4, 64, 64), ssn_rank=2)
    v2 = ssn_model.init(jax.random.key(0), x)
    out2 = ssn_model.apply(v2, x)
    assert out2["ssn"][0].shape == (2, 4, 64, 64)
    assert out2["ssn"][1].shape == (2, 8, 64, 64)

    bo = Enet(input_shape=(1, 64, 64), output_shape=(4, 64, 64), bottleneck_out=True)
    v3 = bo.init(jax.random.key(0), x)
    out3 = bo.apply(v3, x)
    assert out3["bottleneck"].shape[1:3] == (8, 8)  # 64 / 8


def test_enet_dropout_stochastic():
    from contouring_uncertainty_tpu.models.enet import Enet

    model = Enet(input_shape=(1, 32, 32), output_shape=(2, 32, 32), dropout=0.5)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 1, 32, 32)), jnp.float32)
    variables = model.init(jax.random.key(0), x)
    o1 = model.apply(variables, x, deterministic=False, rngs={"dropout": jax.random.key(1)})
    o2 = model.apply(variables, x, deterministic=False, rngs={"dropout": jax.random.key(2)})
    assert not np.allclose(np.asarray(o1["out"]), np.asarray(o2["out"]))


def test_deeplabv3_output_and_heads():
    from contouring_uncertainty_tpu.models.deeplabv3 import DeepLabV3

    model = DeepLabV3(input_shape=(1, 64, 64), output_shape=(4, 64, 64),
                      layers=(1, 1, 1, 1), base=16)
    # Random input: with a constant input, instance norm maps every channel to
    # its bias and channel dropout becomes invisible.
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 1, 64, 64)), jnp.float32)
    variables = model.init(jax.random.key(0), x)
    out = model.apply(variables, x)
    assert out["out"].shape == (1, 4, 64, 64)

    ssn = DeepLabV3(input_shape=(1, 64, 64), output_shape=(4, 64, 64),
                    layers=(1, 1, 1, 1), base=16, ssn_rank=2, dropout=0.3,
                    bottleneck_out=True)
    v2 = ssn.init(jax.random.key(0), x)
    out2 = ssn.apply(v2, x)
    assert out2["ssn"][1].shape == (1, 8, 64, 64)
    assert out2["bottleneck"].shape[1:3] == (4, 4)  # 64/16
    # Dropout is stochastic.
    o1 = ssn.apply(v2, x, deterministic=False, rngs={"dropout": jax.random.key(1)})
    o2 = ssn.apply(v2, x, deterministic=False, rngs={"dropout": jax.random.key(2)})
    assert not np.allclose(np.asarray(o1["out"]), np.asarray(o2["out"]))


def test_enet_prelu_mode():
    from contouring_uncertainty_tpu.models.enet import Enet

    model = Enet(input_shape=(1, 32, 32), output_shape=(2, 32, 32),
                 encoder_relu=False, decoder_relu=False)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 1, 32, 32)), jnp.float32)
    variables = model.init(jax.random.key(0), x)
    out = model.apply(variables, x)
    assert out["out"].shape == (1, 2, 32, 32)
    assert np.isfinite(np.asarray(out["out"])).all()
