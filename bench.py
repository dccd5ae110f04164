#!/usr/bin/env python
"""Headline benchmark: U-Net+DSNT echo-frame inference throughput per chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "frames/s", "vs_baseline": N/10000}

Baseline: the driver-set north star of 10,000 frames/sec/chip for the
flagship 8-stage UNet + DSNT at 256x256 (BASELINE.md; the reference itself
publishes no numbers). Runs bf16 with a bf16 serving head (fused Pallas DSNT).

Timing protocol (docs/PERF_NOTES.md): a single dispatch+sync round-trip on
the tunneled axon platform costs ~30-45 ms, so short windows overestimate
per-call time badly. We enqueue a long window (>=32 calls), fetch ONE scalar
slice of the last output as the sync point (in-order execution guarantees
all prior calls finished), and take the best of several windows to shed the
chip's 2-3x run-to-run bandwidth variance.
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_FRAMES_PER_SEC = 10_000.0

# The axon tunnel goes down for hours at a time (observed >7 h); when it is
# down, the first backend touch hangs ~20 min inside PJRT init before raising
# UNAVAILABLE, which would leave the round with NO bench artifact at all.
# Probe in a timeout-bounded subprocess first (CLAUDE.md protocol), wait a
# bounded time for the tunnel to return, and otherwise fall back to CPU with
# the output line explicitly marked degraded.
TPU_PROBE_TIMEOUT_S = int(os.environ.get("BENCH_TPU_PROBE_TIMEOUT_S", "180"))
TPU_WAIT_BUDGET_S = int(os.environ.get("BENCH_TPU_WAIT_BUDGET_S", "1800"))

# Last successful on-TPU headline line, embedded in degraded fallback output
# so a tunnel outage at bench time doesn't erase the round's real measurement.
_CACHE_PATH = Path(__file__).parent / "BENCH_LAST_TPU.json"


def _ensure_backend() -> bool:
    from contouring_uncertainty_tpu.utils.backend import ensure_backend

    return ensure_backend(wait_budget_s=TPU_WAIT_BUDGET_S,
                          probe_timeout_s=TPU_PROBE_TIMEOUT_S, label="bench")


def _sync(out):
    np.asarray(jnp.ravel(out[0])[:1])


def main():
    from contouring_uncertainty_tpu.models import UNet
    from contouring_uncertainty_tpu.ops.dsnt import logits_to_pixel_gaussians

    on_tpu = _ensure_backend()

    model = UNet(input_shape=(1, 256, 256), output_shape=(21, 256, 256),
                 dtype=jnp.bfloat16, head_dtype=jnp.bfloat16)
    variables = jax.jit(model.init)(jax.random.key(0), jnp.zeros((2, 1, 256, 256)))

    @jax.jit
    def forward(variables, img):
        logits = model.apply(variables, img)["out"]
        return logits_to_pixel_gaussians(logits)

    best = 0.0
    best_batch = 0
    rng = np.random.default_rng(0)
    batches = (128, 256, 512) if on_tpu else (4,)
    iters, windows, warm = (32, 3, 4) if on_tpu else (2, 1, 1)
    for batch in batches:
        img = jnp.asarray(rng.normal(size=(batch, 1, 256, 256)), jnp.float32)
        try:
            _sync(forward(variables, img))  # compile + warm
        except Exception:
            break
        for _ in range(windows):  # best-of windows against run-to-run variance
            outs = [forward(variables, img) for _ in range(warm)]
            _sync(outs[-1])  # drain
            t0 = time.perf_counter()
            outs = [forward(variables, img) for _ in range(iters)]
            _sync(outs[-1])
            dt = (time.perf_counter() - t0) / iters
            fps = batch / dt
            if fps > best:
                best, best_batch = fps, batch

    line = {
        "metric": "unet_dsnt_inference_frames_per_sec_per_chip",
        "value": round(best, 1),
        "unit": "frames/s",
        "vs_baseline": round(best / BASELINE_FRAMES_PER_SEC, 3),
        "batch": best_batch,
        "device": str(jax.devices()[0]),
    }
    if not on_tpu:
        # CPU-fallback numbers are NOT comparable with the TPU baseline; the
        # driver still gets a well-formed artifact instead of a 20-min hang.
        # Secondary benches are skipped — flagship-shape training / TMI-budget
        # predict on host CPU would run for hours. Attach the last successful
        # on-TPU line (cached below) so the outage doesn't erase the round's
        # real measurement.
        line["degraded"] = "tpu_tunnel_unavailable_cpu_fallback"
        try:
            line["last_tpu"] = json.loads(_CACHE_PATH.read_text())
        except Exception:
            pass
        print(json.dumps(line))
        return
    try:
        line["predict_views_per_sec"] = round(_bench_predict_pipeline(), 2)
    except Exception as exc:  # secondary metric must not break the headline
        line["predict_views_per_sec_error"] = f"{type(exc).__name__}: {exc}"
    try:
        line["predict_views_per_sec_bf16"] = round(
            _bench_predict_pipeline(bf16=True), 2)
    except Exception as exc:
        line["predict_views_per_sec_bf16_error"] = f"{type(exc).__name__}: {exc}"
    try:
        line["predict_views_per_sec_skew"] = round(
            _bench_predict_pipeline(skew=True), 2)
    except Exception as exc:
        line["predict_views_per_sec_skew_error"] = f"{type(exc).__name__}: {exc}"
    try:
        line["predict_views_per_sec_batched4"] = round(
            _bench_predict_pipeline(batch_views=4), 2)
    except Exception as exc:
        line["predict_views_per_sec_batched4_error"] = f"{type(exc).__name__}: {exc}"
    try:
        # Max single-chip serving mode: bf16 forwards + fused Pallas head +
        # 4-view batching compose (measured 70.4 views/s vs 56.6 f32-batched
        # and 44.1 bf16-sequential) — the number a throughput-bound user gets
        # when they accept the bf16 accuracy contract (docs/PERF_NOTES.md).
        line["predict_views_per_sec_batched4_bf16"] = round(
            _bench_predict_pipeline(bf16=True, batch_views=4), 2)
    except Exception as exc:
        line["predict_views_per_sec_batched4_bf16_error"] = (
            f"{type(exc).__name__}: {exc}")
    try:
        line.update(_parity_checks())
    except Exception as exc:
        line["parity_error"] = f"{type(exc).__name__}: {exc}"
    try:
        line.update(_bench_aggregate_serving())
    except Exception as exc:
        line["aggregate_error"] = f"{type(exc).__name__}: {exc}"
    try:
        line["train_frames_per_sec"] = round(_bench_train_step(64), 1)
        line["train_frames_per_sec_b128"] = round(_bench_train_step(128), 1)
    except Exception as exc:
        line["train_error"] = f"{type(exc).__name__}: {exc}"
    try:  # cache the successful on-TPU line for outage fallbacks
        _CACHE_PATH.write_text(json.dumps(
            {**line, "measured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                                  time.gmtime())}))
    except OSError:
        pass
    print(json.dumps(line))


def _bench_train_step(batch_size: int = 64) -> float:
    """Flagship dsnt-al TRAINING throughput (bf16 model, adamw, donated
    state) so the driver tracks training perf alongside serving (VERDICT r2
    weak #2: training was absent from BENCH_r*.json). Mirrors
    Trainer._build_steps exactly (train/trainer.py:91-102). Batch 64 is the
    reference-parity config; batch 128 is the throughput-optimal point on
    this chip (round-3 sweep: 64 -> 581 f/s, 128 -> 923, 256 -> 899,
    512 fails to compile for HBM)."""
    import optax
    from flax.training.train_state import TrainState

    from contouring_uncertainty_tpu.data.config import DataParams, Label, Tags
    from contouring_uncertainty_tpu.tasks import DSNTAleatoric

    task = DSNTAleatoric(
        data_params=DataParams(in_shape=(1, 256, 256), out_shape=(21, 2),
                               labels=(Label.BG, Label.LV)),
        model_kwargs={"dtype": jnp.bfloat16},
    )
    model = task.build_model()
    variables = jax.jit(model.init)(jax.random.key(0), jnp.zeros((2, 1, 256, 256)))
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        tx=optax.adamw(1e-3, weight_decay=1e-3),
    )

    def train_step(state, batch, rng):
        def loss_fn(params):
            return task.loss(model, {"params": params}, batch, rng, train=True)

        (loss, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads=grads), logs

    step = jax.jit(train_step, donate_argnums=(0,))
    rng = np.random.default_rng(0)
    batch = {
        Tags.img: jnp.asarray(rng.normal(size=(batch_size, 1, 256, 256)),
                              jnp.float32),
        Tags.contour: jnp.asarray(
            rng.uniform(32, 224, size=(batch_size, 21, 2)), jnp.float32),
    }
    key = jax.random.key(1)
    state, logs = step(state, batch, key)  # compile + warm
    _sync((logs["loss"],))
    best = 0.0
    iters = 16
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(iters):
            state, logs = step(state, batch, jax.random.fold_in(key, i))
        _sync((logs["loss"],))
        best = max(best, batch_size * iters / (time.perf_counter() - t0))
    return best


def _bench_aggregate_serving() -> dict:
    """Multi-chip DP serving (parallel/serving.py): the flagship forward jitted
    with the batch sharded over a mesh of ALL visible chips and params
    replicated. On n chips this is the n-scaled aggregate serving throughput
    PERF_NOTES.md names as the route past the single-chip ceiling; under the
    driver (1 real chip) it degenerates to mesh(1) and validates that the
    sharded serving program itself compiles and runs on TPU."""
    from contouring_uncertainty_tpu.models import UNet
    from contouring_uncertainty_tpu.ops.dsnt import logits_to_pixel_gaussians
    from contouring_uncertainty_tpu.parallel import make_mesh, sharded_forward

    n = len(jax.devices())
    mesh = make_mesh(n)
    model = UNet(input_shape=(1, 256, 256), output_shape=(21, 256, 256),
                 dtype=jnp.bfloat16, head_dtype=jnp.bfloat16)
    variables = jax.jit(model.init)(jax.random.key(0), jnp.zeros((2, 1, 256, 256)))

    def fwd(v, x):
        return logits_to_pixel_gaussians(model.apply(v, x)["out"])

    jitted, repl_vars = sharded_forward(fwd, variables, mesh)
    batch = 256 * n
    img = jnp.asarray(np.random.default_rng(0).normal(size=(batch, 1, 256, 256)),
                      jnp.float32)
    _sync(jitted(repl_vars, img))  # compile + warm
    best = 0.0
    iters = 32
    for _ in range(3):
        outs = [jitted(repl_vars, img) for _ in range(4)]
        _sync(outs[-1])
        t0 = time.perf_counter()
        outs = [jitted(repl_vars, img) for _ in range(iters)]
        _sync(outs[-1])
        best = max(best, batch * iters / (time.perf_counter() - t0))
    return {"aggregate_frames_per_sec": round(best, 1), "n_devices": n}


def _parity_checks() -> dict:
    """On-chip parity of the custom compute paths (VERDICT r2 weak #5 /
    ADVICE r2): compiled Pallas DSNT vs the XLA path, and the Pallas min-k
    scanline selection vs exact XLA top_k. Runs on whatever backend
    bench runs on (the real TPU under the driver), so compiled-kernel
    regressions land in BENCH_r*.json instead of hiding behind CPU
    interpret mode."""
    from contouring_uncertainty_tpu.ops.dsnt import raw6_to_pixel_gaussians
    from contouring_uncertainty_tpu.ops.pallas_dsnt import (
        _raw_moments_pallas,
        _raw_moments_pallas_cols,
        _raw_moments_xla,
    )
    from contouring_uncertainty_tpu.ops.rasterize import approx_parity_check

    out = {}
    rng = np.random.default_rng(7)
    # Gaussian-blob logits with 2-8 px spreads — the operating regime of a
    # trained DSNT head (random noise collapses the softmax to a delta and
    # the sigma comparison degenerates to the 1e-2 px^2 floor).
    n = 4 * 21
    ys, xs = np.mgrid[0:256, 0:256].astype(np.float32)
    cx = rng.uniform(40, 216, n)[:, None, None]
    cy = rng.uniform(40, 216, n)[:, None, None]
    s = rng.uniform(2.0, 8.0, n)[:, None, None]
    blobs = -((xs - cx) ** 2 + (ys - cy) ** 2) / (2.0 * s * s)
    logits = jnp.asarray(blobs.reshape(n, 256 * 256), jnp.bfloat16)
    if jax.default_backend() != "cpu":
        raw_k = jax.jit(lambda x: _raw_moments_pallas(x, 256, 256))(logits)
        raw_x = jax.jit(lambda x: _raw_moments_xla(x, 256, 256))(logits)
        mu_k, sig_k = raw6_to_pixel_gaussians(raw_k[:, :6], 256, 256)
        mu_x, sig_x = raw6_to_pixel_gaussians(raw_x[:, :6], 256, 256)
        out["dsnt_pallas_max_mu_err_px"] = float(
            jnp.max(jnp.abs(mu_k - mu_x))
        )
        # Sigma error normalized by each point's covariance SCALE (mean of
        # the diagonal), not element-wise: off-diagonals are legitimately
        # ~0 for axis-aligned blobs and an element-wise ratio there measures
        # noise/noise, not kernel accuracy.
        scale = (sig_x[..., 0, 0] + sig_x[..., 1, 1])[..., None, None] / 2.0
        out["dsnt_pallas_max_sigma_rel_err"] = float(
            jnp.max(jnp.abs(sig_k - sig_x) / scale)
        )
        # Column-layout kernel — the one the flagship serving path actually
        # routes through since round 3 (ops/dsnt.py:158-176).
        raw_c = jax.jit(lambda x: _raw_moments_pallas_cols(x, 256, 256))(
            logits.T)
        mu_c, sig_c = raw6_to_pixel_gaussians(raw_c[:, :6], 256, 256)
        out["dsnt_pallas_cols_max_mu_err_px"] = float(
            jnp.max(jnp.abs(mu_c - mu_x))
        )
        out["dsnt_pallas_cols_max_sigma_rel_err"] = float(
            jnp.max(jnp.abs(sig_c - sig_x) / scale)
        )
    out["rasterize_approx_mismatch_px"] = approx_parity_check(n_contours=64)
    return out


def _bench_predict_pipeline(bf16: bool = False, skew: bool = False,
                            batch_views: int = 1) -> float:
    """Secondary metric: full uncertainty-propagation throughput (views/s) at
    the TMI evaluation budget (t_e=10 epistemic forwards x t_a=25 PSM contour
    samples, 21 landmarks @ 256^2) — the reference's Stack-2 hot path runs
    this as host-side Python (~minutes/view); ours is one jit per view.

    `bf16=True` measures the opt-in fast serving mode
    (task.model.dtype=bf16 head_dtype=bf16: bf16 T_e forwards + the fused
    Pallas DSNT head; f32 stays the reference-parity default) — the predict
    step is forward-dominated after the round-3 sampler campaign, so this is
    the remaining big lever (docs/PERF_NOTES.md).

    `skew=True` measures the MICCAI-headline skew pipeline instead (DSNTSkew
    + closed-form ESN skew sampling + skew umaps).

    `batch_views=V > 1` measures the single-chip throughput mode
    (cfg predict_batch_views: V views vmapped per dispatch — the view step
    only feeds batch-20 forwards, so stacking views recovers the large-batch
    serving rate; V=4 measured as the throughput point on v5e)."""
    import tempfile

    from contouring_uncertainty_tpu.data.camus import CamusContourData
    from contouring_uncertainty_tpu.data.synthetic import write_camus_hdf5
    from contouring_uncertainty_tpu.predict import AleatoricPredictor, get_or_fit_prior
    from contouring_uncertainty_tpu.sampler import PosteriorShapeModelSampler
    from contouring_uncertainty_tpu.sampler.psm_skew import (
        SkewPosteriorShapeModelSampler)
    from contouring_uncertainty_tpu.tasks import DSNTAleatoric
    from contouring_uncertainty_tpu.tasks.dsnt_skew import DSNTSkew

    with tempfile.TemporaryDirectory() as tmp:
        h5 = write_camus_hdf5(f"{tmp}/synth.h5", n_patients=4, size=256, seed=3)
        data = CamusContourData(h5, fold=5)
        model_kwargs = {"drop_block": True}
        if bf16:
            model_kwargs.update(dtype=jnp.bfloat16, head_dtype=jnp.bfloat16)
        cls = DSNTSkew if skew else DSNTAleatoric
        task = cls(data_params=data.data_params, t_a=25, t_e=10,
                   model_kwargs=model_kwargs)
        model = task.build_model()
        variables = jax.jit(model.init)(
            jax.random.key(0), jnp.zeros((2, 1, 256, 256)))
        prior = get_or_fit_prior(data, None)
        if skew:
            sampler = SkewPosteriorShapeModelSampler(
                prior, skew_indices=task.skew_indices, image_extent=255.0)
        else:
            sampler = PosteriorShapeModelSampler(prior)
        predictor = AleatoricPredictor(task, model, sampler)

        views = [jnp.asarray(v["img"]) for v in data.predict_views("test")]
        key = jax.random.key(0)
        # Pre-stage per-iteration keys OUTSIDE the timed window: each
        # fold_in is its own tiny dispatch, and on the tunneled platform
        # every enqueue costs 10s of ms of host time — with 8 iterations
        # that diluted the metric ~3x vs the device envelope
        # (tools/trace_breakdown.py measures the same predictor call at the
        # true step wall).
        # Timing protocol (CLAUDE.md): enqueue >=32 calls per window so the
        # single ~30-45 ms dispatch+sync round-trip amortizes below ~1.5%,
        # and take best-of-3 windows against the chip's run-to-run variance.
        if batch_views > 1:
            n_steps = 32
            imgs = jnp.stack([views[i % len(views)] for i in range(batch_views)])
            bkeys = jnp.stack([jax.random.fold_in(key, i)
                               for i in range(batch_views)])
            np.asarray(jax.random.key_data(bkeys[-1]))  # host sync: staged
            out = predictor.batched(variables, imgs, bkeys)  # compile + warm
            _sync((out["pred"],))
            best = 0.0
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(n_steps):
                    out = predictor.batched(variables, imgs, bkeys)
                _sync((out["pred"],))
                best = max(best,
                           batch_views * n_steps / (time.perf_counter() - t0))
            return best
        n_iters = 32
        keys = [jax.random.fold_in(key, i) for i in range(n_iters)]
        np.asarray(jax.random.key_data(keys[-1]))  # host sync: keys staged
        outs = [predictor(variables, views[0], key)]  # compile + warm
        _sync((outs[-1]["pred"],))
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [
                predictor(variables, views[i % len(views)], keys[i])
                for i in range(n_iters)
            ]
            _sync((outs[-1]["pred"],))
            best = max(best, n_iters / (time.perf_counter() - t0))
        return best


if __name__ == "__main__":
    main()
