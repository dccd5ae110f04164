#!/usr/bin/env python
"""Training-step roofline breakdown for the flagship dsnt-al task.

VERDICT r2 weak #2: bf16 batch-64 training ran 583 f/s while the 3x-forward
FLOP model implies ~1.1k — nobody had split the step into forward / backward /
optimizer or tried remat. This tool times, with the enqueue-N + host-fetch
protocol (CLAUDE.md):

  - loss-only jit (forward + loss math)
  - value_and_grad jit (forward + backward, no optimizer)
  - full train step (grad + adamw update, donated state)
  - the above under jax.checkpoint remat policies on the UNet apply
  - batch-size sweep

Usage: python tools/profile_train.py [batch ...]
"""

from __future__ import annotations

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training.train_state import TrainState


def timeit(fn, *args, iters=12, donate_cycle=None):
    """Best-of-3 windows; donate_cycle: callable returning fresh args each
    call when buffers are donated."""
    best = np.inf
    for _ in range(3):
        if donate_cycle is not None:
            state = donate_cycle()
            t0 = time.perf_counter()
            for i in range(iters):
                state, logs = fn(state, *args, jax.random.fold_in(KEY, i))
            np.asarray(logs["loss"])
            best = min(best, (time.perf_counter() - t0) / iters)
        else:
            out = fn(*args)
            jax.tree_util.tree_map(np.asarray, out)
            t0 = time.perf_counter()
            outs = [fn(*args) for _ in range(iters)]
            jax.tree_util.tree_map(np.asarray, outs[-1])
            best = min(best, (time.perf_counter() - t0) / iters)
    return best


KEY = jax.random.key(1)


def main():
    batches = [int(b) for b in sys.argv[1:]] or [64]
    from contouring_uncertainty_tpu.data.config import DataParams, Label, Tags
    from contouring_uncertainty_tpu.tasks import DSNTAleatoric

    rng = np.random.default_rng(0)

    for batch in batches:
        for dtype_name, dtype in (("bf16", jnp.bfloat16),):
            task = DSNTAleatoric(
                data_params=DataParams(in_shape=(1, 256, 256), out_shape=(21, 2),
                                       labels=(Label.BG, Label.LV)),
                model_kwargs={"dtype": dtype},
            )
            model = task.build_model()
            variables = jax.jit(model.init)(
                jax.random.key(0), jnp.zeros((2, 1, 256, 256)))
            batch_data = {
                Tags.img: jnp.asarray(
                    rng.normal(size=(batch, 1, 256, 256)), jnp.float32),
                Tags.contour: jnp.asarray(
                    rng.uniform(32, 224, size=(batch, 21, 2)), jnp.float32),
            }

            def loss_fn(params, rng_):
                loss, logs = task.loss(model, {"params": params}, batch_data,
                                       rng_, train=True)
                return loss

            # 1) forward + loss only
            fwd = jax.jit(lambda p, r: loss_fn(p, r))
            t_fwd = timeit(fwd, variables["params"], KEY)
            print(f"[b{batch} {dtype_name}] loss-only       : "
                  f"{t_fwd*1e3:7.2f} ms  {batch/t_fwd:7.0f} f/s")

            # 2) forward + backward (no optimizer)
            grad = jax.jit(lambda p, r: jax.grad(loss_fn)(p, r))
            t_grad = timeit(grad, variables["params"], KEY)
            print(f"[b{batch} {dtype_name}] grad (fwd+bwd)  : "
                  f"{t_grad*1e3:7.2f} ms  {batch/t_grad:7.0f} f/s  "
                  f"bwd={1e3*(t_grad-t_fwd):.2f} ms")

            # 3) full step, donated
            def make_state():
                return TrainState.create(
                    apply_fn=model.apply, params=variables["params"],
                    tx=optax.adamw(1e-3, weight_decay=1e-3))

            def train_step(state, rng_):
                def lf(params):
                    return task.loss(model, {"params": params}, batch_data,
                                     rng_, train=True)

                (loss, logs), grads = jax.value_and_grad(lf, has_aux=True)(
                    state.params)
                return state.apply_gradients(grads=grads), logs

            step = jax.jit(train_step, donate_argnums=(0,))
            s = make_state()
            s, logs = step(s, KEY)  # compile
            np.asarray(logs["loss"])
            t_full = timeit(step, donate_cycle=make_state)
            print(f"[b{batch} {dtype_name}] full step       : "
                  f"{t_full*1e3:7.2f} ms  {batch/t_full:7.0f} f/s  "
                  f"opt={1e3*(t_full-t_grad):.2f} ms")

            # 4) remat policies on the grad step
            for policy_name, policy in (
                ("remat-none-dots", jax.checkpoint_policies.checkpoint_dots),
                ("remat-nothing", jax.checkpoint_policies.nothing_saveable),
            ):
                def loss_remat(params, rng_):
                    apply = jax.checkpoint(
                        lambda p, x: model.apply({"params": p}, x, train=True,
                                                 rngs={"dropout": rng_}),
                        policy=policy)
                    out = apply(params, batch_data[Tags.img])
                    # re-run the task loss math on the rematted forward
                    logits = out["out"]
                    from contouring_uncertainty_tpu.ops.dsnt import (
                        logits_to_pixel_gaussians,
                    )
                    mu, sig = logits_to_pixel_gaussians(logits)
                    # Gaussian NLL vs target (matches dsnt-al's core term)
                    tgt = batch_data[Tags.contour]
                    d = (mu - tgt)[..., None]
                    prec = jnp.linalg.inv(sig.astype(jnp.float32))
                    m = (d.transpose(0, 1, 3, 2) @ prec @ d)[..., 0, 0]
                    return jnp.mean(m + jnp.log(
                        jnp.linalg.det(sig.astype(jnp.float32))))

                g = jax.jit(lambda p, r, f=loss_remat: jax.grad(f)(p, r))
                try:
                    t = timeit(g, variables["params"], KEY)
                    print(f"[b{batch} {dtype_name}] grad {policy_name:14s}: "
                          f"{t*1e3:7.2f} ms  {batch/t:7.0f} f/s")
                except Exception as exc:
                    print(f"[b{batch} {dtype_name}] grad {policy_name}: "
                          f"failed {type(exc).__name__}: {exc}")


if __name__ == "__main__":
    main()
