"""Task family coverage: skew + all segmentation baselines train one step,
have finite losses/grads, and predict with the right shapes."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from contouring_uncertainty_tpu.data.config import DataParams, Label, Tags
from contouring_uncertainty_tpu.tasks.dsnt_skew import DSNTSkew
from contouring_uncertainty_tpu.tasks.segmentation import (
    AleatoricUncertainty,
    McDropoutUncertainty,
    SegmentationUncertaintyTask,
    StochasticSegmentationNetwork,
    TTAUncertainty,
)

SMALL_MODEL = dict(kernels=((3, 3),) * 4, strides=((1, 1),) + ((2, 2),) * 3)
DP_CONTOUR = DataParams(in_shape=(1, 32, 32), out_shape=(21, 2), labels=(Label.BG, Label.LV))
DP_SEG = DataParams(in_shape=(1, 32, 32), out_shape=(1, 32, 32), labels=(Label.BG, Label.LV))


def _batch(rng, n=4, k=21, size=32):
    return {
        Tags.img: jnp.asarray(rng.normal(size=(n, 1, size, size)).astype(np.float32)),
        Tags.gt: jnp.asarray((rng.random((n, size, size)) > 0.7).astype(np.int32)),
        Tags.contour: jnp.asarray(rng.uniform(4, 28, size=(n, k, 2)).astype(np.float32)),
    }


def _check_task_trains(task, batch, needs_contour=False):
    model = task.build_model()
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.key(0), batch[Tags.img], train=True
    )

    def loss_fn(params):
        loss, logs = task.loss(model, {"params": params["params"]}, batch,
                               jax.random.key(1), train=True)
        return loss, logs

    (loss, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(variables)
    assert np.isfinite(float(loss)), logs
    gmax = max(float(jnp.abs(g).max()) for g in jax.tree.leaves(grads))
    assert np.isfinite(gmax) and gmax > 0
    return model, variables, logs


def test_dsnt_skew_trains_and_predicts():
    rng = np.random.default_rng(0)
    task = DSNTSkew(data_params=DP_CONTOUR, model_kwargs=SMALL_MODEL, t_a=2)
    batch = _batch(rng)
    model, variables, logs = _check_task_trains(task, batch)
    assert "loss_term3" in logs and "alpha_norm" in logs

    mu, cov, alpha = task.predict(model, variables, batch[Tags.img], rng=jax.random.key(2))
    assert mu.shape == (4, 1, 21, 2)
    assert cov.shape == (4, 1, 21, 2, 2)
    assert alpha.shape == (4, 1, 21, 2)


def test_dsnt_skew_sparse_indices():
    rng = np.random.default_rng(1)
    task = DSNTSkew(data_params=DP_CONTOUR, model_kwargs=SMALL_MODEL,
                    skew_indices=(0, 5, 10, 15, 20))
    batch = _batch(rng)
    model, variables, _ = _check_task_trains(task, batch)
    _, _, alpha = task.predict(model, variables, batch[Tags.img])
    a = np.asarray(alpha)[:, 0]
    # Non-skew indices must have exactly zero alpha.
    assert np.abs(a[:, 1]).max() == 0.0
    assert np.abs(a[:, [0, 5, 10, 15, 20]]).max() > 0.0


@pytest.mark.parametrize("task_cls,kwargs", [
    (SegmentationUncertaintyTask, {}),
    (McDropoutUncertainty, {"t_e": 3}),
    (AleatoricUncertainty, {"iterations": 4, "t_a": 3}),
    (TTAUncertainty, {"t_a": 3}),
    (StochasticSegmentationNetwork, {"rank": 3, "mc_samples": 4, "t_a": 3}),
])
def test_segmentation_tasks_train_and_predict(task_cls, kwargs):
    rng = np.random.default_rng(2)
    task = task_cls(data_params=DP_SEG, model_kwargs=dict(SMALL_MODEL), **kwargs)
    batch = _batch(rng)
    model, variables, logs = _check_task_trains(task, batch)
    assert "dice" in logs

    probs = task.predict_probs(model, variables, batch[Tags.img], jax.random.key(3))
    assert probs.ndim == 6 and probs.shape[0] == 4 and probs.shape[3] == 1
    assert np.isfinite(np.asarray(probs)).all()
    assert 0.0 <= float(probs.min()) and float(probs.max()) <= 1.0
    t_e, t_a = probs.shape[1], probs.shape[2]
    if task_cls is McDropoutUncertainty:
        assert t_e == 3
        # Stochastic passes must differ.
        assert float(jnp.abs(probs[:, 0] - probs[:, 1]).max()) > 0
    if task_cls in (AleatoricUncertainty, TTAUncertainty, StochasticSegmentationNetwork):
        assert t_a == 3


def test_mc_prefix_sharing_matches_tiled_forward():
    """The shared-deterministic-prefix MC forward (mc_dropout_apply) must
    match tiling the input through the full network with the same dropout
    key: the prefix has no dropout, instance norm is per-sample, and rng
    folding is by module path so the tail's dropout masks are identical.
    Exact up to conv reduction order (1e-5 here on CPU; see the
    mc_dropout_apply docstring for the measured TPU default-precision
    contract)."""
    from contouring_uncertainty_tpu.tasks.dsnt_al import DSNTAleatoric, mc_dropout_apply

    rng = np.random.default_rng(7)
    task = DSNTAleatoric(data_params=DP_CONTOUR,
                         model_kwargs={**SMALL_MODEL, "drop_block": True}, t_e=3)
    model = task.build_model()
    assert model.drop_block
    img = jnp.asarray(rng.normal(size=(2, 1, 32, 32)).astype(np.float32))
    variables = jax.jit(model.init)(jax.random.key(0), img)

    key = jax.random.key(5)
    shared = mc_dropout_apply(model, variables, img, 3, key)["out"]
    tiled = model.apply(variables, jnp.tile(img, (3, 1, 1, 1)),
                        deterministic=False, rngs={"dropout": key})["out"]
    np.testing.assert_allclose(np.asarray(shared), np.asarray(tiled), rtol=0, atol=1e-5)
    # Different epistemic samples must still differ (dropout active in tail).
    assert float(jnp.abs(shared[:2] - shared[2:4]).max()) > 0

    # Skew task: the wrapped SkewUNet threads the prefix modes through.
    skew = DSNTSkew(data_params=DP_CONTOUR,
                    model_kwargs={**SMALL_MODEL, "drop_block": True}, t_e=3)
    smodel = skew.build_model()
    svars = jax.jit(smodel.init)(jax.random.key(1), img)
    out_shared = mc_dropout_apply(smodel, svars, img, 3, key)
    out_tiled = smodel.apply(svars, jnp.tile(img, (3, 1, 1, 1)),
                             deterministic=False, rngs={"dropout": key})
    np.testing.assert_allclose(np.asarray(out_shared["out"]),
                               np.asarray(out_tiled["out"]), rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_shared["alpha_raw"]),
                               np.asarray(out_tiled["alpha_raw"]), rtol=0, atol=1e-4)


def test_seg_deep_supervision_ladder():
    rng = np.random.default_rng(3)
    task = SegmentationUncertaintyTask(
        data_params=DP_SEG, model_kwargs={**SMALL_MODEL, "deep_supervision": True}
    )
    batch = _batch(rng)
    _check_task_trains(task, batch)


def test_seg_predictor_end_to_end():
    from contouring_uncertainty_tpu.predict import SegPredictor

    rng = np.random.default_rng(4)
    task = McDropoutUncertainty(data_params=DP_SEG, model_kwargs=dict(SMALL_MODEL), t_e=2, t_a=1)
    model = task.build_model()
    img = jnp.asarray(rng.normal(size=(2, 1, 32, 32)).astype(np.float32))
    variables = jax.jit(model.init)(jax.random.key(0), img)
    out = SegPredictor(task, model)(variables, img, jax.random.key(1))
    assert out["pred"].shape == (2, 32, 32)
    assert out["entropy_map"].shape == (2, 32, 32)
    # Border-zeroed entropy.
    assert float(out["entropy_map"][:, :10].max()) == 0.0
    assert np.isfinite(np.asarray(out["instant_uncertainty"]["entropy_mean"])).all()


def test_dsnt_skew_freeze_seg_trains_only_confidence_net():
    """freeze_seg fine-tune mode (reference dsnt_skew.py:39-44): a Trainer
    train step must leave the UNet backbone untouched and update only the
    ConfidenceNet head."""
    from contouring_uncertainty_tpu.train.trainer import Trainer, TrainerConfig

    rng = np.random.default_rng(1)
    task = DSNTSkew(data_params=DP_CONTOUR, model_kwargs=SMALL_MODEL,
                    freeze_seg=True)
    trainer = Trainer(task, TrainerConfig(batch_size=4, lr=1e-2))
    trainer._build_steps()
    state = trainer.init_state(jax.random.key(0))
    batch = _batch(rng)
    before = jax.tree.map(np.asarray, state.params)
    state, logs = trainer._train_step(state, batch, jax.random.key(1), np.uint32(0))
    after = jax.tree.map(np.asarray, state.params)

    unet_deltas = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(np.abs(a - b).max()), before["unet"], after["unet"]))
    head_deltas = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(np.abs(a - b).max()),
        before["confidence_net"], after["confidence_net"]))
    assert max(unet_deltas) == 0.0
    assert max(head_deltas) > 0.0

    # default mode sanity: without freeze_seg the backbone does move
    task2 = DSNTSkew(data_params=DP_CONTOUR, model_kwargs=SMALL_MODEL)
    trainer2 = Trainer(task2, TrainerConfig(batch_size=4, lr=1e-2))
    trainer2._build_steps()
    state2 = trainer2.init_state(jax.random.key(0))
    before2 = jax.tree.map(np.asarray, state2.params)
    state2, _ = trainer2._train_step(state2, batch, jax.random.key(1), np.uint32(0))
    after2 = jax.tree.map(np.asarray, state2.params)
    deltas2 = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(np.abs(a - b).max()), before2["unet"], after2["unet"]))
    assert max(deltas2) > 0.0


def test_resnet_regression_trains_and_predicts():
    """Standalone Resnet backbone (reference models/resnet.py:196-225):
    direct (K, 2) output + sigma branch through the DSNT-AL aleatoric task
    (task/model=resnet)."""
    from contouring_uncertainty_tpu.models.resnet import Resnet
    from contouring_uncertainty_tpu.tasks import DSNTAleatoric

    rng = np.random.default_rng(2)
    task = DSNTAleatoric(
        data_params=DP_CONTOUR, model_name="resnet", t_e=2,
        model_kwargs={"layers": (1, 1, 1, 1), "dropout": 0.1},
    )
    batch = _batch(rng)
    model, variables, logs = _check_task_trains(task, batch)
    assert isinstance(model, Resnet)
    assert model.sigma_out == 3  # full-covariance parameterization

    out = model.apply(variables, batch[Tags.img])
    assert out["out"].shape == (4, 21, 2)
    assert out["sigma"].shape == (4, 21, 3)

    # predict: MC-dropout epistemic axis + PSD covariances
    mu, cov = task.predict(model, variables, batch[Tags.img], rng=jax.random.key(3))
    assert mu.shape == (4, 2, 21, 2)
    assert cov.shape == (4, 2, 21, 2, 2)
    c = np.asarray(cov)
    assert np.all(np.linalg.eigvalsh(c) > 0)
    # Covariance symmetry by construction.
    np.testing.assert_allclose(c, np.swapaxes(c, -1, -2), rtol=0, atol=0)
