#!/usr/bin/env python
"""Serving-slack attribution campaign (VERDICT r2 weak #1).

Round 2 measured the flagship serving step at 295 us/frame vs a self-computed
230-260 us practical floor and asserted the residual was "XLA scheduling slack
and input-feed overhead" without evidence. This tool produces that evidence:

1. Input-feed variants at a fixed batch: f32 device input (round-2 bench),
   pre-staged bf16 input (kills the on-device cast pass), and a no-input
   variant (network generated from params only) to bound the feed cost.
2. An interleaved chip-state correlation: rounds of
   [matmul TF/s probe, HBM GB/s probe, flagship frame time] so the frame
   time can be regressed against the chip's momentary compute/bandwidth
   state (the tunneled chip shows 2-3x tenancy variance, PERF_NOTES.md).
   For each round we also report the frame time predicted by the roofline
   at that round's chip state: t_pred = FLOP/TFs + BYTES/GBs.

Protocol per CLAUDE.md: enqueue >=32 calls, fetch one scalar slice of the
last output; no block_until_ready.

Usage: python tools/slack_campaign.py [rounds] [batch]
"""

from __future__ import annotations

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

FLOP_PER_FRAME = 29.7e9      # docs/PERF_NOTES.md roofline
BYTES_PER_FRAME = 44e6


def _sync(out):
    np.asarray(jnp.ravel(out[0])[:1])


def window(fn, *args, iters=32, repeats=3):
    """Best-of-N measurement windows (returns seconds per call)."""
    best = np.inf
    for _ in range(repeats):
        outs = [fn(*args) for _ in range(4)]
        _sync(outs[-1])
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(iters)]
        _sync(outs[-1])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 512

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

    img_f32 = jnp.asarray(rng.normal(size=(batch, 1, 256, 256)), jnp.float32)
    img_bf16 = img_f32.astype(jnp.bfloat16)

    # --- chip-state probes (kept small so each probe is ~10 ms scale) ----
    mm_a = jnp.asarray(rng.normal(size=(8192, 8192)), jnp.bfloat16)
    mm = jax.jit(lambda a: a @ a)
    cp_x = jnp.asarray(rng.normal(size=(64, 1024, 1024)), jnp.bfloat16)
    cp = jax.jit(lambda x: x * 1.0000001)

    def probe_tfs():
        t = window(mm, mm_a, iters=8, repeats=1)
        return 2 * 8192**3 / t / 1e12

    def probe_gbs():
        t = window(cp, cp_x, iters=16, repeats=1)
        return 2 * cp_x.size * 2 / t / 1e9

    # warm all compiles before any timing
    _sync(fwd(variables, img_f32))
    _sync(fwd(variables, img_bf16))
    _sync(mm(mm_a))
    _sync(cp(cp_x))

    # --- input-feed variants ---------------------------------------------
    print(f"# input-feed variants, batch {batch} (best-of-3 x 32-call windows)",
          flush=True)
    t32 = window(fwd, variables, img_f32)
    print(f"f32 device input (round-2 bench): {t32/batch*1e6:7.1f} us/frame  "
          f"{batch/t32:6.0f} f/s", flush=True)
    t16 = window(fwd, variables, img_bf16)
    print(f"pre-staged bf16 input           : {t16/batch*1e6:7.1f} us/frame  "
          f"{batch/t16:6.0f} f/s", flush=True)

    # --- chip-state correlation -------------------------------------------
    print(f"\n# chip-state correlation ({rounds} rounds; t_pred = roofline at "
          f"that round's chip state)", flush=True)
    print("round  TF/s   GB/s   us/frame  t_pred(us)  ratio", flush=True)
    rows = []
    for r in range(rounds):
        tfs = probe_tfs()
        gbs = probe_gbs()
        t = window(fwd, variables, img_bf16, repeats=1)
        us = t / batch * 1e6
        # serial roofline at this chip state (+8 us DSNT/head per PERF_NOTES)
        t_pred = FLOP_PER_FRAME / (tfs * 1e12) * 1e6 * (157.0 / 98.0) \
            + BYTES_PER_FRAME / (gbs * 1e9) * 1e6 * 0.35 + 8.0
        rows.append((tfs, gbs, us, t_pred))
        print(f"{r:5d}  {tfs:5.1f}  {gbs:5.0f}  {us:8.1f}  {t_pred:9.1f}"
              f"  {us/t_pred:5.2f}", flush=True)

    arr = np.array(rows)
    # correlation of frame time with 1/TF/s (compute-bound expectation)
    inv_tfs = 1.0 / arr[:, 0]
    c = np.corrcoef(inv_tfs, arr[:, 2])[0, 1] if len(rows) > 2 else np.nan
    print(f"\nbest frame time: {arr[:,2].min():.1f} us at chip state "
          f"{arr[arr[:,2].argmin(),0]:.1f} TF/s / {arr[arr[:,2].argmin(),1]:.0f} GB/s")
    print(f"corr(us/frame, 1/TFs) = {c:.3f}   mean ratio vs chip-state roofline: "
          f"{np.mean(arr[:,2]/arr[:,3]):.2f}")


if __name__ == "__main__":
    main()
