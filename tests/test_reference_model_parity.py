"""Architecture parity: OUR flax UNet vs the REFERENCE'S torch UNet, same
weights, same input, compared at the logits.

This is the strongest model-parity gate available in this environment (the
reference's training stack needs lightning/hydra, absent here, but its model
code imports with torch+einops alone): every conv shape/padding, instance-
norm epsilon/affine placement, LeakyReLU slope, transposed-conv semantics,
skip-concat order and output-head wiring must line up for the outputs to
match.

Weight mapping:
    ConvBlock_0                 -> input_block
    ConvBlock_{1..n-2}          -> downsamples.{i-1}
    ConvBlock_{n-1}             -> bottleneck
    UpsampleBlock_{j}           -> upsamples.{j}
    OutputBlock_0               -> output_block
    conv kernels (kh,kw,ci,co)  -> torch (co,ci,kh,kw)
    flax ConvTranspose kernels are spatially MIRRORED relative to torch's
    ConvTranspose2d (lax.conv_transpose flips the kernel; probed in
    ops/s2d.py) -> flip both spatial dims when porting.
"""

import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

ref_unet_mod = pytest.importorskip("contour_uncertainty.models.nnUnet.unet2")

from contouring_uncertainty_tpu.models import UNet

N_STAGES = 4
SHAPES = dict(input_shape=(1, 64, 64), output_shape=(5, 64, 64))
KW = dict(kernels=((3, 3),) * N_STAGES,
          strides=((1, 1),) + ((2, 2),) * (N_STAGES - 1))


def _t(a):
    return torch.tensor(np.asarray(a))


def _conv(dst, prefix, p):
    dst[f"{prefix}.weight"] = _t(p["kernel"]).permute(3, 2, 0, 1)
    if "bias" in p:
        dst[f"{prefix}.bias"] = _t(p["bias"])


def _conv_layer(dst, prefix, p):
    _conv(dst, f"{prefix}.conv", p["Conv_0"])
    dst[f"{prefix}.norm.weight"] = _t(p["InstanceNorm_0"]["scale"])
    dst[f"{prefix}.norm.bias"] = _t(p["InstanceNorm_0"]["bias"])


def _conv_block(dst, prefix, p):
    _conv_layer(dst, f"{prefix}.conv1", p["ConvLayer_0"])
    _conv_layer(dst, f"{prefix}.conv2", p["ConvLayer_1"])


def flax_to_torch_state(params, n_stages):
    state = {}
    _conv_block(state, "input_block", params["ConvBlock_0"])
    for i in range(1, n_stages - 1):
        _conv_block(state, f"downsamples.{i - 1}", params[f"ConvBlock_{i}"])
    _conv_block(state, "bottleneck", params[f"ConvBlock_{n_stages - 1}"])
    for j in range(n_stages - 1):
        up = params[f"UpsampleBlock_{j}"]
        k = _t(up["ConvTranspose_0"]["kernel"])
        state[f"upsamples.{j}.transp_conv.weight"] = (
            k.flip(0).flip(1).permute(2, 3, 0, 1)
        )
        _conv_block(state, f"upsamples.{j}.conv_block", up["ConvBlock_0"])
    _conv(state, "output_block.conv", params["OutputBlock_0"]["Conv_0"])
    return state


def test_flax_unet_matches_reference_torch_unet():
    ours = UNet(**SHAPES, **KW)
    rng = np.random.default_rng(0)
    img = rng.normal(size=(2, 1, 64, 64)).astype(np.float32)
    variables = ours.init(jax.random.key(3), jnp.asarray(img))
    out_flax = np.asarray(ours.apply(variables, jnp.asarray(img))["out"])

    ref = ref_unet_mod.UNet(
        input_shape=(1, 64, 64), output_shape=(5, 64, 64), patch_size=[64, 64],
        kernels=[list(k) for k in KW["kernels"]],
        strides=[list(s) for s in KW["strides"]],
    )
    state = flax_to_torch_state(variables["params"], N_STAGES)
    # The reference always instantiates deep-supervision heads; they are
    # unused at inference when deep_supervision=False.
    result = ref.load_state_dict(state, strict=False)
    assert all("deep_supervision" in k for k in result.missing_keys), result
    assert not result.unexpected_keys, result
    ref.eval()
    with torch.no_grad():
        out_ref = ref(torch.tensor(img)).numpy()

    assert out_flax.shape == out_ref.shape
    np.testing.assert_allclose(out_flax, out_ref, atol=2e-4, rtol=1e-4)


def test_flax_unet_matches_reference_torch_unet_residual():
    """Same gate for the residual-block variant."""
    ours = UNet(**SHAPES, **KW, residual=True)
    rng = np.random.default_rng(1)
    img = rng.normal(size=(1, 1, 64, 64)).astype(np.float32)
    variables = ours.init(jax.random.key(5), jnp.asarray(img))
    out_flax = np.asarray(ours.apply(variables, jnp.asarray(img))["out"])

    ref = ref_unet_mod.UNet(
        input_shape=(1, 64, 64), output_shape=(5, 64, 64), patch_size=[64, 64],
        kernels=[list(k) for k in KW["kernels"]],
        strides=[list(s) for s in KW["strides"]],
        residual=True,
    )
    state = _residual_state(variables["params"])
    result = ref.load_state_dict(state, strict=False)
    assert all("deep_supervision" in k for k in result.missing_keys), result
    assert not result.unexpected_keys, result
    ref.eval()
    with torch.no_grad():
        out_ref = ref(torch.tensor(img)).numpy()
    np.testing.assert_allclose(out_flax, out_ref, atol=2e-4, rtol=1e-4)


def _resid_block(dst, prefix, p):
    """Reference ResidBlock params: conv1 (ConvLayer) / conv2 (bare conv) /
    norm / downsample (projection conv) / norm_res."""
    _conv_layer(dst, f"{prefix}.conv1", p["ConvLayer_0"])
    _conv(dst, f"{prefix}.conv2", p["Conv_0"])
    dst[f"{prefix}.norm.weight"] = _t(p["InstanceNorm_0"]["scale"])
    dst[f"{prefix}.norm.bias"] = _t(p["InstanceNorm_0"]["bias"])
    _conv(dst, f"{prefix}.downsample", p["Conv_1"])
    dst[f"{prefix}.norm_res.weight"] = _t(p["InstanceNorm_1"]["scale"])
    dst[f"{prefix}.norm_res.bias"] = _t(p["InstanceNorm_1"]["bias"])


def _residual_state(params):
    state = {}
    _resid_block(state, "input_block", params["ResidBlock_0"])
    for i in range(1, N_STAGES - 1):
        _resid_block(state, f"downsamples.{i - 1}", params[f"ResidBlock_{i}"])
    _resid_block(state, "bottleneck", params[f"ResidBlock_{N_STAGES - 1}"])
    for j in range(N_STAGES - 1):
        up = params[f"UpsampleBlock_{j}"]
        k = _t(up["ConvTranspose_0"]["kernel"])
        state[f"upsamples.{j}.transp_conv.weight"] = (
            k.flip(0).flip(1).permute(2, 3, 0, 1)
        )
        _conv_block(state, f"upsamples.{j}.conv_block", up["ConvBlock_0"])
    _conv(state, "output_block.conv", params["OutputBlock_0"]["Conv_0"])
    return state


def test_trained_model_end_to_end_parity_with_torch_reference():
    """BASELINE.md parity protocol, executable form: train OUR flagship-
    architecture model briefly, port the TRAINED weights into the
    reference's torch UNet, run the reference's own DSNT math
    (task/regression/dsnt/utils.py) on the torch side, and compare
    against our pipeline on the same batch.

    Gate: per-point NLL within 1% and landmark coordinates within 0.1 px —
    any framework-level numerical divergence (conv/norm/softmax/moments)
    would show up here on real trained heatmaps."""
    from contouring_uncertainty_tpu.data.config import DataParams, Label, Tags
    from contouring_uncertainty_tpu.data.synthetic import make_arrays
    from contouring_uncertainty_tpu.ops import dsnt as D
    from contouring_uncertainty_tpu.tasks import DSNTAleatoric
    from contouring_uncertainty_tpu.train.trainer import Trainer, TrainerConfig

    size, k = 96, 21
    imgs, gts, contours = make_arrays(16, k=k, size=size, seed=9)
    arrays = {Tags.img: imgs.astype(np.float32),
              Tags.gt: gts.astype(np.int32),
              Tags.contour: contours.astype(np.float32)}
    dp = DataParams(in_shape=(1, size, size), out_shape=(k, 2),
                    labels=(Label.BG, Label.LV))
    task = DSNTAleatoric(data_params=dp, model_kwargs=dict(
        kernels=((3, 3),) * 4, strides=((1, 1),) + ((2, 2),) * 3))
    cfg = TrainerConfig(batch_size=8, max_epochs=10, patience=100, lr=1e-3,
                        seed=2, save_path="/tmp/cutpu_parity_run",
                        name="parity", augment=False, log_figures=False)
    trainer = Trainer(task, cfg)
    variables, _ = trainer.fit(arrays, arrays)

    batch = jnp.asarray(arrays[Tags.img][:8])
    y = jnp.asarray(arrays[Tags.contour][:8])

    # ---- ours --------------------------------------------------------------
    model = trainer.model
    logits_ours = np.asarray(model.apply(variables, batch)["out"])
    mu_ours, sig_ours = D.logits_to_pixel_gaussians(jnp.asarray(logits_ours))
    nll_ours = D.gaussian_nll(mu_ours, sig_ours, y)[0]

    # ---- reference (torch), same trained weights ---------------------------
    ref_dsnt = pytest.importorskip(
        "contour_uncertainty.task.regression.dsnt.utils")
    n_st = 4
    global N_STAGES
    old = N_STAGES
    N_STAGES = n_st
    try:
        state = flax_to_torch_state(variables["params"], n_st)
    finally:
        N_STAGES = old
    ref = ref_unet_mod.UNet(
        input_shape=(1, size, size), output_shape=(k, size, size),
        patch_size=[size, size], kernels=[[3, 3]] * n_st,
        strides=[[1, 1]] + [[2, 2]] * (n_st - 1))
    result = ref.load_state_dict(state, strict=False)
    assert all("deep_supervision" in kk for kk in result.missing_keys)
    ref.eval()
    with torch.no_grad():
        logits_ref = ref(torch.tensor(np.asarray(batch)))
        # reference DSNT-AL predict math (dsnt_al.py:45-71)
        probs = ref_dsnt.flat_softmax(logits_ref)
        coords, var, covar = ref_dsnt.dsnt(probs)
        mu_ref = ref_dsnt.normalized_to_pixel_coordinates(
            coords, (size, size)).numpy()

    # logits from identical weights agree to f32 conv tolerance
    np.testing.assert_allclose(logits_ours, logits_ref.numpy(),
                               atol=5e-3, rtol=1e-3)
    # landmark coordinates within 0.1 px
    assert np.abs(np.asarray(mu_ours) - mu_ref).max() < 0.1
    # per-point NLL via the reference's variances within 1%
    scale = (size / 2.0) ** 2
    var_px = np.maximum(var.numpy() * scale, 1e-2)
    cov_px = covar.numpy() * scale
    mc = 0.999 * np.sqrt(var_px[..., 0] * var_px[..., 1])
    cov_px = np.clip(cov_px, -mc, mc)
    sig_ref = np.stack([
        np.stack([var_px[..., 0], cov_px], -1),
        np.stack([cov_px, var_px[..., 1]], -1)], -2)
    nll_ref = D.gaussian_nll(jnp.asarray(mu_ref), jnp.asarray(sig_ref), y)[0]
    rel = abs(float(nll_ours.mean()) - float(nll_ref.mean())) / abs(float(nll_ref.mean()))
    assert rel < 0.01, (float(nll_ours.mean()), float(nll_ref.mean()))
