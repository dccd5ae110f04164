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
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_FRAMES_PER_SEC = 10_000.0


def _sync(out):
    np.asarray(jnp.ravel(out[0])[:1])


def main():
    from contouring_uncertainty_tpu.models import UNet
    from contouring_uncertainty_tpu.ops.dsnt import logits_to_pixel_gaussians

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
    for batch in (128, 256, 512):
        img = jnp.asarray(rng.normal(size=(batch, 1, 256, 256)), jnp.float32)
        try:
            _sync(forward(variables, img))  # compile + warm
        except Exception:
            break
        iters = 32
        for _ in range(3):  # best-of-3 windows against run-to-run variance
            outs = [forward(variables, img) for _ in range(4)]
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
    try:
        line["predict_views_per_sec"] = round(_bench_predict_pipeline(), 2)
    except Exception as exc:  # secondary metric must not break the headline
        line["predict_views_per_sec_error"] = f"{type(exc).__name__}: {exc}"
    try:
        line.update(_parity_checks())
    except Exception as exc:
        line["parity_error"] = f"{type(exc).__name__}: {exc}"
    print(json.dumps(line))


def _parity_checks() -> dict:
    """On-chip parity of the two approximate/custom compute paths (VERDICT r2
    weak #5 / ADVICE r2): compiled Pallas DSNT vs the XLA path, and
    approx_min_k scanline selection vs exact top_k. Runs on whatever backend
    bench runs on (the real TPU under the driver), so compiled-kernel
    regressions land in BENCH_r*.json instead of hiding behind CPU
    interpret mode."""
    from contouring_uncertainty_tpu.ops.dsnt import raw6_to_pixel_gaussians
    from contouring_uncertainty_tpu.ops.pallas_dsnt import (
        _raw_moments_pallas,
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
    out["rasterize_approx_mismatch_px"] = approx_parity_check(n_contours=64)
    return out


def _bench_predict_pipeline() -> float:
    """Secondary metric: full uncertainty-propagation throughput (views/s) at
    the TMI evaluation budget (t_e=10 epistemic forwards x t_a=25 PSM contour
    samples, 21 landmarks @ 256^2) — the reference's Stack-2 hot path runs
    this as host-side Python (~minutes/view); ours is one jit per view."""
    import tempfile

    from contouring_uncertainty_tpu.data.camus import CamusContourData
    from contouring_uncertainty_tpu.data.synthetic import write_camus_hdf5
    from contouring_uncertainty_tpu.predict import AleatoricPredictor, get_or_fit_prior
    from contouring_uncertainty_tpu.sampler import PosteriorShapeModelSampler
    from contouring_uncertainty_tpu.tasks import DSNTAleatoric

    with tempfile.TemporaryDirectory() as tmp:
        h5 = write_camus_hdf5(f"{tmp}/synth.h5", n_patients=4, size=256, seed=3)
        data = CamusContourData(h5, fold=5)
        task = DSNTAleatoric(data_params=data.data_params, t_a=25, t_e=10,
                             model_kwargs={"drop_block": True})
        model = task.build_model()
        variables = jax.jit(model.init)(
            jax.random.key(0), jnp.zeros((2, 1, 256, 256)))
        prior = get_or_fit_prior(data, None)
        sampler = PosteriorShapeModelSampler(prior)
        predictor = AleatoricPredictor(task, model, sampler)

        views = [jnp.asarray(v["img"]) for v in data.predict_views("test")]
        key = jax.random.key(0)
        outs = [predictor(variables, views[0], key)]  # compile + warm
        _sync((outs[-1]["pred"],))
        n_iters, n_frames = 8, 0
        t0 = time.perf_counter()
        outs = []
        for i in range(n_iters):
            v = views[i % len(views)]
            n_frames += v.shape[0]
            outs.append(predictor(variables, v, jax.random.fold_in(key, i)))
        _sync((outs[-1]["pred"],))
        dt = time.perf_counter() - t0
        return n_iters / dt


if __name__ == "__main__":
    main()
