#!/usr/bin/env python
"""Headline benchmark: U-Net+DSNT echo-frame inference throughput per chip.

Prints the headline JSON line as soon as the headline sweep finishes, then
RE-PRINTS the enriched line after every secondary bench stage:

    {"metric": ..., "value": N, "unit": "frames/s", "vs_baseline": N/10000, ...}

Every printed line is complete and self-contained, so whether the driver
parses the first or the last JSON line of stdout — or kills the process
mid-stage — it always captures a well-formed artifact (round-3 lesson:
BENCH_r03.json was rc=124/null because the one print lived at the very end
of an unbounded run).

Wall-clock discipline (BENCH_TOTAL_BUDGET_S, default 1500 s — comfortably
under the driver's ~30 min window):
- the TPU-outage probe wait is capped so probes + headline always fit;
- each secondary stage runs only if the remaining budget covers its cost
  estimate (adaptive: a measured slow stage raises its family's estimate);
  stages that don't fit are listed under "skipped_benches".

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
TPU_WAIT_BUDGET_S = int(os.environ.get("BENCH_TPU_WAIT_BUDGET_S", "420"))

# Hard wall budget for the WHOLE bench run. Secondary stages are skipped once
# the remaining budget no longer covers their estimated cost; whatever was
# measured so far has already been printed.
TOTAL_BUDGET_S = int(os.environ.get("BENCH_TOTAL_BUDGET_S", "1500"))
# Reserved for the headline sweep itself when capping the probe wait.
HEADLINE_RESERVE_S = int(os.environ.get("BENCH_HEADLINE_RESERVE_S", "420"))

# Last successful on-TPU headline line, embedded in degraded fallback output
# so a tunnel outage at bench time doesn't erase the round's real measurement.
_CACHE_PATH = Path(__file__).parent / "BENCH_LAST_TPU.json"

_T0 = time.monotonic()
_DEADLINE = _T0 + TOTAL_BUDGET_S


def _remaining() -> float:
    return _DEADLINE - time.monotonic()


def _emit(line: dict) -> None:
    print(json.dumps(line), flush=True)


def _write_cache(line: dict) -> None:
    try:
        _CACHE_PATH.write_text(json.dumps(
            {**line, "measured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                                  time.gmtime())}))
    except OSError:
        pass


def _ensure_backend(wait_budget_s: int) -> bool:
    from contouring_uncertainty_tpu.utils.backend import ensure_backend

    return ensure_backend(wait_budget_s=wait_budget_s,
                          probe_timeout_s=TPU_PROBE_TIMEOUT_S, label="bench")


def _sync(out):
    np.asarray(jnp.ravel(out[0])[:1])


def _run_stages(line: dict, stages, emit=_emit, write_cache=_write_cache,
                remaining=_remaining) -> list:
    """Run secondary bench stages under the wall budget.

    `stages` is a list of (name, family, est_s, fn) where fn() mutates
    `line` in place. A stage runs only if `remaining()` covers max(est_s,
    slowest observed stage of the same family); otherwise its name lands in
    the returned skip list. After every stage the enriched line is re-emitted
    and the on-TPU cache rewritten, so a driver timeout can never erase more
    than the stage in flight. Exceptions are recorded as '{name}_error' keys
    and never abort the remaining stages.
    """
    skipped = []
    family_cost: dict = {}
    for name, family, est_s, fn in stages:
        est = max(est_s, family_cost.get(family, 0.0))
        if remaining() < est:
            skipped.append(name)
            continue
        t0 = time.monotonic()
        try:
            fn()
        except Exception as exc:  # a stage must not break the artifact
            line[f"{name}_error"] = f"{type(exc).__name__}: {exc}"
        elapsed = time.monotonic() - t0
        family_cost[family] = max(family_cost.get(family, 0.0), elapsed)
        line["elapsed_s"] = round(time.monotonic() - _T0, 1)
        emit(line)
        write_cache(line)
    if skipped:
        line["skipped_benches"] = skipped
        emit(line)
        write_cache(line)
    return skipped


def main():
    # Cap the outage wait so probes + headline always fit the wall budget
    # (round 3: a 1800 s probe wait plus the full bench overran the driver).
    wait_budget = int(max(0, min(TPU_WAIT_BUDGET_S,
                                 _remaining() - HEADLINE_RESERVE_S)))
    on_tpu = _ensure_backend(wait_budget)

    from contouring_uncertainty_tpu.models import UNet
    from contouring_uncertainty_tpu.ops.dsnt import logits_to_pixel_gaussians

    if on_tpu:
        model = UNet(input_shape=(1, 256, 256), output_shape=(21, 256, 256),
                     dtype=jnp.bfloat16, head_dtype=jnp.bfloat16)
        batches, iters, windows, warm = (128, 256, 512), 32, 3, 4
    else:
        # CPU fallback: the number is NOT comparable with the TPU baseline
        # (explicit `degraded` key below) — it only proves the harness runs,
        # so use a small model that compiles in seconds on host CPU.
        model = UNet(input_shape=(1, 64, 64), output_shape=(21, 64, 64),
                     kernels=((3, 3),) * 4,
                     strides=((1, 1),) + ((2, 2),) * 3)
        batches, iters, windows, warm = (4,), 2, 1, 1
    size = model.input_shape[-1]
    variables = jax.jit(model.init)(jax.random.key(0),
                                    jnp.zeros((2, 1, size, size)))

    @jax.jit
    def forward(variables, img):
        logits = model.apply(variables, img)["out"]
        return logits_to_pixel_gaussians(logits)

    best = 0.0
    best_batch = 0
    rng = np.random.default_rng(0)
    for batch in batches:
        if best and _remaining() < 60:
            break  # keep whatever the sweep already measured
        img = jnp.asarray(rng.normal(size=(batch, 1, size, size)), jnp.float32)
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
        # on-TPU line (cached on every on-TPU stage) so the outage doesn't
        # erase the round's real measurement.
        line["degraded"] = "tpu_tunnel_unavailable_cpu_fallback"
        try:
            line["last_tpu"] = json.loads(_CACHE_PATH.read_text())
        except Exception:
            pass
        _emit(line)
        return

    # First parseable artifact lands NOW; every stage below re-emits.
    line["elapsed_s"] = round(time.monotonic() - _T0, 1)
    _emit(line)
    _write_cache(line)

    def _set(key, fn, round_to=2):
        def run():
            line[key] = round(fn(), round_to)
        return run

    # Priority order: correctness parity first (cheap), then the metrics a
    # round is judged on (reference-parity predict, new serving/train
    # surface), then the opt-in fast modes. The wall budget cuts from the
    # tail, never the head.
    stages = [
        ("parity", "parity", 120, lambda: line.update(_parity_checks())),
        ("predict_views_per_sec", "predict", 240,
         _set("predict_views_per_sec", _bench_predict_pipeline)),
        ("predict_views_per_sec_seq", "predict", 240,
         _set("predict_views_per_sec_seq",
              lambda: _bench_predict_pipeline(sequence=True))),
        ("aggregate_views", "predict", 300,
         lambda: line.update(_bench_aggregate_predict())),
        ("train_frames_per_sec_b128", "train", 300,
         _set("train_frames_per_sec_b128", lambda: _bench_train_step(128), 1)),
        ("train_frames_per_sec_e2e", "train", 300,
         lambda: line.update(_bench_train_e2e())),
        # uint8 wire format (TrainerConfig.feed_uint8): quantifies how much
        # of the e2e feed gap the 4x-smaller host->device transfer recovers.
        ("train_frames_per_sec_e2e_u8", "train", 300,
         lambda: line.update(_bench_train_e2e(feed_uint8=True))),
        ("predict_views_per_sec_bf16", "predict", 240,
         _set("predict_views_per_sec_bf16",
              lambda: _bench_predict_pipeline(bf16=True))),
        ("predict_views_per_sec_batched4", "predict", 240,
         _set("predict_views_per_sec_batched4",
              lambda: _bench_predict_pipeline(batch_views=4))),
        # Max single-chip serving mode: bf16 forwards + fused Pallas head +
        # 4-view batching compose — the number a throughput-bound user gets
        # when they accept the bf16 accuracy contract (docs/PERF_NOTES.md).
        ("predict_views_per_sec_batched4_bf16", "predict", 240,
         _set("predict_views_per_sec_batched4_bf16",
              lambda: _bench_predict_pipeline(bf16=True, batch_views=4))),
        ("predict_views_per_sec_skew", "predict", 240,
         _set("predict_views_per_sec_skew",
              lambda: _bench_predict_pipeline(skew=True))),
        ("aggregate_frames_per_sec", "aggregate", 180,
         lambda: line.update(_bench_aggregate_serving())),
        ("train_frames_per_sec", "train", 240,
         _set("train_frames_per_sec", lambda: _bench_train_step(64), 1)),
    ]
    _run_stages(line, stages)


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


def _bench_train_e2e(batch_size: int = 128, n_frames: int = 384,
                     size: int = 256, model_kwargs: dict = None,
                     windows: int = 2, epochs_per_window: int = 2,
                     feed_uint8: bool = False) -> dict:
    """Input-feed-INCLUSIVE training throughput (VERDICT r3 weak #5): the
    steady-state epoch loop exactly as Trainer.fit runs it — C++ prefetcher
    batches (data/native_loader.py), host->device transfer, on-device
    augmentation, jitted donated train step — at the flagship shape and the
    batch-128 throughput point, over in-memory synthetic frames. The gap to
    `train_frames_per_sec_b128` (pre-staged batch, no feed) is the feed cost."""
    import optax
    from flax.training.train_state import TrainState

    from contouring_uncertainty_tpu.data import augment as aug
    from contouring_uncertainty_tpu.data.config import DataParams, Label, Tags
    from contouring_uncertainty_tpu.data.native_loader import NativePrefetcher
    from contouring_uncertainty_tpu.data.synthetic import make_arrays
    from contouring_uncertainty_tpu.parallel import make_mesh, shard_batch
    from contouring_uncertainty_tpu.tasks import DSNTAleatoric

    # Guard (ADVICE r4): with n_frames < batch_size the prefetcher yields
    # zero batches and the loop below would die with an opaque
    # UnboundLocalError on `logs`.
    assert n_frames >= batch_size, (
        f"_bench_train_e2e needs n_frames ({n_frames}) >= batch_size "
        f"({batch_size}) to form at least one batch"
    )
    imgs, gts, contours = make_arrays(n_frames, 21, size, seed=5)
    if feed_uint8:  # TrainerConfig.feed_uint8: 4x fewer host->device bytes
        imgs = np.round(np.clip(imgs, 0.0, 1.0) * 255.0).astype(np.uint8)
    arrays = {Tags.img: imgs, Tags.gt: gts, Tags.contour: contours}
    task = DSNTAleatoric(
        data_params=DataParams(in_shape=(1, size, size), out_shape=(21, 2),
                               labels=(Label.BG, Label.LV)),
        model_kwargs={"dtype": jnp.bfloat16, **(model_kwargs or {})},
    )
    model = task.build_model()
    variables = jax.jit(model.init)(jax.random.key(0),
                                    jnp.zeros((2, 1, size, size)))
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        tx=optax.adamw(1e-3, weight_decay=1e-3),
    )
    mesh = make_mesh(len(jax.devices()))

    # Identical step body to Trainer (train/trainer.py): augmentation and the
    # per-step rng folds run INSIDE the jit, so each step is one dispatch.
    def train_step(state, batch, rng, step_idx):
        img = batch[Tags.img]
        if img.dtype == jnp.uint8:  # dequantize on device (trainer.py parity)
            batch = {**batch, Tags.img: img.astype(jnp.float32) / 255.0}
        aug_key = jax.random.fold_in(rng, 2 * step_idx)
        batch = aug.apply(batch, aug.sample_params(aug_key, batch[Tags.img].shape[0]))
        loss_key = jax.random.fold_in(rng, 2 * step_idx + 1)

        def loss_fn(params):
            return task.loss(model, {"params": params}, batch, rng=loss_key,
                             train=True)

        (loss, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads=grads), logs

    step = jax.jit(train_step, donate_argnums=(0,))
    key = jax.random.key(1)
    prefetcher = NativePrefetcher(arrays, batch_size, seed=0)
    try:
        # Warm: one epoch compiles and primes the ring.
        si = 0
        for batch in prefetcher.epoch():
            state, logs = step(state, shard_batch(batch, mesh), key,
                               np.uint32(si))
            si += 1
        _sync((logs["loss"],))
        from contouring_uncertainty_tpu.train.trainer import _device_prefetch

        best = 0.0
        for _ in range(windows):
            frames = 0
            t0 = time.perf_counter()
            for _ in range(epochs_per_window):  # steady-state feed
                # Double-buffered feed, exactly as Trainer.fit runs it
                # (overlap_feed: transfer k+1 during step k).
                for batch in _device_prefetch(prefetcher.epoch(), mesh):
                    state, logs = step(state, batch, key, np.uint32(si))
                    si += 1
                    frames += batch[Tags.img].shape[0]
            _sync((logs["loss"],))
            best = max(best, frames / (time.perf_counter() - t0))
    finally:
        prefetcher.close()
    key_name = "train_frames_per_sec_e2e" + ("_u8" if feed_uint8 else "")
    return {key_name: round(best, 1)}


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


def _make_predict_data(tmp: str, bf16: bool, skew: bool, size: int = 256,
                       t_a: int = 25, t_e: int = 10,
                       model_kwargs: dict = None):
    from contouring_uncertainty_tpu.data.camus import CamusContourData
    from contouring_uncertainty_tpu.data.synthetic import write_camus_hdf5
    from contouring_uncertainty_tpu.predict import get_or_fit_prior
    from contouring_uncertainty_tpu.tasks import DSNTAleatoric
    from contouring_uncertainty_tpu.tasks.dsnt_skew import DSNTSkew

    h5 = write_camus_hdf5(f"{tmp}/synth.h5", n_patients=4, size=size, seed=3)
    data = CamusContourData(h5, fold=5)
    model_kwargs = {"drop_block": True, **(model_kwargs or {})}
    if bf16:
        model_kwargs.update(dtype=jnp.bfloat16, head_dtype=jnp.bfloat16)
    cls = DSNTSkew if skew else DSNTAleatoric
    task = cls(data_params=data.data_params, t_a=t_a, t_e=t_e,
               model_kwargs=model_kwargs)
    model = task.build_model()
    variables = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((2, 1, size, size)))
    prior = get_or_fit_prior(data, None)
    return data, task, model, variables, prior


def _bench_predict_pipeline(bf16: bool = False, skew: bool = False,
                            batch_views: int = 1, sequence: bool = False,
                            smoke: dict = None) -> float:
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

    `sequence=True` measures the TMI sequence pipeline (ED<->ES coupling via
    the two-instant PCA + SequencePSMSampler — the reference's Stack 4),
    bench-tracked as predict_views_per_sec_seq (VERDICT r3 weak #3: it was
    traced at ~30 ms/view but invisible to the driver).

    `batch_views=V > 1` measures the single-chip throughput mode
    (cfg predict_batch_views: V views vmapped per dispatch — the view step
    only feeds batch-20 forwards, so stacking views recovers the large-batch
    serving rate; V=4 measured as the throughput point on v5e)."""
    import tempfile

    from contouring_uncertainty_tpu.predict import (
        AleatoricPredictor,
        get_or_fit_sequence_prior,
    )
    from contouring_uncertainty_tpu.sampler import PosteriorShapeModelSampler
    from contouring_uncertainty_tpu.sampler.psm_skew import (
        SkewPosteriorShapeModelSampler)

    smoke = smoke or {}
    n_iters = n_steps = int(smoke.get("iters", 32))
    n_windows = int(smoke.get("windows", 3))
    with tempfile.TemporaryDirectory() as tmp:
        data, task, model, variables, prior = _make_predict_data(
            tmp, bf16, skew,
            **{k: v for k, v in smoke.items() if k not in ("iters", "windows")})
        if sequence:
            from contouring_uncertainty_tpu.sampler.sequence import SequencePSMSampler

            seq_prior = get_or_fit_sequence_prior(data, None)
            sampler = SequencePSMSampler(prior, seq_prior)
        elif skew:
            sampler = SkewPosteriorShapeModelSampler(
                prior, skew_indices=task.skew_indices,
                image_extent=float(task.data_params.in_shape[-1] - 1))
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
            imgs = jnp.stack([views[i % len(views)] for i in range(batch_views)])
            bkeys = jnp.stack([jax.random.fold_in(key, i)
                               for i in range(batch_views)])
            np.asarray(jax.random.key_data(bkeys[-1]))  # host sync: staged
            out = predictor.batched(variables, imgs, bkeys)  # compile + warm
            _sync((out["pred"],))
            best = 0.0
            for _ in range(n_windows):
                t0 = time.perf_counter()
                for _ in range(n_steps):
                    out = predictor.batched(variables, imgs, bkeys)
                _sync((out["pred"],))
                best = max(best,
                           batch_views * n_steps / (time.perf_counter() - t0))
            return best
        keys = [jax.random.fold_in(key, i) for i in range(n_iters)]
        np.asarray(jax.random.key_data(keys[-1]))  # host sync: keys staged
        outs = [predictor(variables, views[0], key)]  # compile + warm
        _sync((outs[-1]["pred"],))
        best = 0.0
        for _ in range(n_windows):
            t0 = time.perf_counter()
            outs = [
                predictor(variables, views[i % len(views)], keys[i])
                for i in range(n_iters)
            ]
            _sync((outs[-1]["pred"],))
            best = max(best, n_iters / (time.perf_counter() - t0))
        return best


def _bench_aggregate_predict(smoke: dict = None) -> dict:
    """Aggregate uncertainty-propagation serving (VERDICT r3 weak #3): the
    predictor's `batched()` path with views sharded over a mesh of ALL
    visible chips (4 views per chip — the single-chip throughput point) so
    multi-chip predict scaling is driver-tracked the day real multi-chip
    hardware appears. Under this driver (1 chip) it degenerates to mesh(1)
    ~= predict_views_per_sec_batched4 plus partitioner overhead."""
    import tempfile

    from contouring_uncertainty_tpu.parallel import make_mesh
    from contouring_uncertainty_tpu.predict import AleatoricPredictor
    from contouring_uncertainty_tpu.sampler import PosteriorShapeModelSampler

    smoke = smoke or {}
    n_steps = int(smoke.get("iters", 32))
    n_windows = int(smoke.get("windows", 3))
    views_per_chip = int(smoke.get("views_per_chip", 4))
    n = len(jax.devices())
    mesh = make_mesh(n)
    with tempfile.TemporaryDirectory() as tmp:
        data, task, model, variables, prior = _make_predict_data(
            tmp, bf16=False, skew=False,
            **{k: v for k, v in smoke.items()
               if k not in ("iters", "windows", "views_per_chip")})
        predictor = AleatoricPredictor(
            task, model, PosteriorShapeModelSampler(prior), mesh=mesh)
        views = [jnp.asarray(v["img"]) for v in data.predict_views("test")]
        v_total = views_per_chip * n
        key = jax.random.key(0)
        imgs = jnp.stack([views[i % len(views)] for i in range(v_total)])
        bkeys = jnp.stack([jax.random.fold_in(key, i) for i in range(v_total)])
        np.asarray(jax.random.key_data(bkeys[-1]))  # host sync: staged
        out = predictor.batched(variables, imgs, bkeys)  # compile + warm
        _sync((out["pred"],))
        best = 0.0
        for _ in range(n_windows):
            t0 = time.perf_counter()
            for _ in range(n_steps):
                out = predictor.batched(variables, imgs, bkeys)
            _sync((out["pred"],))
            best = max(best, v_total * n_steps / (time.perf_counter() - t0))
    return {"aggregate_views_per_sec": round(best, 2),
            "aggregate_views_n_devices": n}


if __name__ == "__main__":
    main()
