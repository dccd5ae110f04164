#!/usr/bin/env python
"""Per-section timing breakdown of the flagship UNet+DSNT forward pass.

Decides where optimization effort goes (MXU vs HBM vs head): times whole-jit
variants (per CLAUDE.md, per-op timings are meaningless on this chip — only
whole-jit numbers count) using the enqueue-N + host-fetch protocol.

Usage: python tools/profile_forward.py [batch]
"""

from __future__ import annotations

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=16):
    out = fn(*args)  # compile + warm
    jax.tree_util.tree_map(np.asarray, out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    jax.tree_util.tree_map(np.asarray, outs[-1])
    return (time.perf_counter() - t0) / iters


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    from flax import linen as nn

    from contouring_uncertainty_tpu.models import UNet
    from contouring_uncertainty_tpu.models.unet import ConvBlock, UpsampleBlock, OutputBlock
    from contouring_uncertainty_tpu.ops.dsnt import logits_to_pixel_gaussians

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(batch, 1, 256, 256)), jnp.float32)
    key = jax.random.key(0)
    dt = jnp.bfloat16

    model = UNet(input_shape=(1, 256, 256), output_shape=(21, 256, 256), dtype=dt)
    variables = jax.jit(model.init)(key, img[:2])

    # --- microbenchmarks -------------------------------------------------
    a = jnp.asarray(rng.normal(size=(8192, 8192)), dt)
    b = jnp.asarray(rng.normal(size=(8192, 8192)), dt)
    t = timeit(jax.jit(lambda a, b: (a @ b).sum()), a, b, iters=8)
    print(f"matmul 8192^3 bf16: {t*1e3:8.2f} ms  -> {2*8192**3/t/1e12:6.1f} TF/s")

    big = jnp.asarray(rng.normal(size=(64, 1024, 1024)), dt)
    t = timeit(jax.jit(lambda x: x * 1.0000001), big, iters=8)
    nbytes = big.size * 2 * 2  # read + write
    print(f"elementwise copy {big.size*2/1e6:.0f} MB: {t*1e3:8.2f} ms -> {nbytes/t/1e9:6.1f} GB/s (r+w)")

    # --- end-to-end vs unet-only vs head ---------------------------------
    @jax.jit
    def full(v, x):
        logits = model.apply(v, x)["out"]
        mu, sig = logits_to_pixel_gaussians(logits)
        return mu.sum() + sig.sum()

    @jax.jit
    def unet_only(v, x):
        return model.apply(v, x)["out"].sum()

    t_full = timeit(full, variables, img)
    t_unet = timeit(unet_only, variables, img)
    print(f"full fwd      : {t_full*1e3:8.2f} ms  {batch/t_full:8.0f} f/s  {t_full/batch*1e6:7.1f} us/frame")
    print(f"unet only     : {t_unet*1e3:8.2f} ms  {t_unet/batch*1e6:7.1f} us/frame")

    logits = jax.jit(lambda v, x: model.apply(v, x)["out"])(variables, img)
    logits = jax.block_until_ready(logits)
    t_dsnt = timeit(jax.jit(lambda l: sum(x.sum() for x in logits_to_pixel_gaussians(l))), logits)
    print(f"dsnt on NCHW logits: {t_dsnt*1e3:8.2f} ms  {t_dsnt/batch*1e6:7.1f} us/frame")

    # --- encoder prefixes -------------------------------------------------
    filters = model.filters

    class Prefix(nn.Module):
        n_stages: int

        @nn.compact
        def __call__(self, x):
            x = jnp.transpose(x, (0, 2, 3, 1)).astype(dt)
            strides = model.strides
            kernels = model.kernels
            for i in range(self.n_stages):
                x = ConvBlock(filters[i], kernels[i], strides[i], 1e-2, False, dtype=dt)(x)
            return x

        # encoder+decoder truncated at high-res stages

    for n in (1, 2, 3, 5, 8):
        pm = Prefix(n_stages=n)
        pv = jax.jit(pm.init)(key, img[:2])
        t = timeit(jax.jit(lambda v, x, m=pm: m.apply(v, x).sum()), pv, img)
        print(f"encoder[0:{n}]  : {t*1e3:8.2f} ms  {t/batch*1e6:7.1f} us/frame")

    # --- isolated hot blocks ----------------------------------------------
    def bench_block(name, mod, shape, dtype=dt):
        x = jnp.asarray(rng.normal(size=shape), dtype)
        v = jax.jit(mod.init)(key, x)
        t = timeit(jax.jit(lambda v, x, m=mod: m.apply(v, x).sum()), v, x)
        # traffic estimate: in + out, bf16
        print(f"{name:22s}: {t*1e3:8.2f} ms  {t/batch*1e6:7.1f} us/frame")

    bench_block("s0 ConvBlock 1->32", ConvBlock(32, dtype=dt), (batch, 256, 256, 1))
    bench_block("s0b ConvBlock 32->32", ConvBlock(32, dtype=dt), (batch, 256, 256, 32))
    bench_block("s1 ConvBlock s2 64", ConvBlock(64, strides=(2, 2), dtype=dt), (batch, 256, 256, 32))

    class U7(nn.Module):
        @nn.compact
        def __call__(self, x_skip):
            x, skip = x_skip
            return UpsampleBlock(32, dtype=dt)(x, skip)

    x = jnp.asarray(rng.normal(size=(batch, 128, 128, 64)), dt)
    skip = jnp.asarray(rng.normal(size=(batch, 256, 256, 32)), dt)
    u7 = U7()
    v = jax.jit(u7.init)(key, (x, skip))
    t = timeit(jax.jit(lambda v, a: u7.apply(v, a).sum()), v, (x, skip))
    print(f"U7 upsample block     : {t*1e3:8.2f} ms  {t/batch*1e6:7.1f} us/frame")

    class U6(nn.Module):
        @nn.compact
        def __call__(self, x_skip):
            x, skip = x_skip
            return UpsampleBlock(64, dtype=dt)(x, skip)

    x = jnp.asarray(rng.normal(size=(batch, 64, 64, 128)), dt)
    skip = jnp.asarray(rng.normal(size=(batch, 128, 128, 64)), dt)
    u6 = U6()
    v = jax.jit(u6.init)(key, (x, skip))
    t = timeit(jax.jit(lambda v, a: u6.apply(v, a).sum()), v, (x, skip))
    print(f"U6 upsample block     : {t*1e3:8.2f} ms  {t/batch*1e6:7.1f} us/frame")

    # head: output block + transpose + f32 cast
    x = jnp.asarray(rng.normal(size=(batch, 256, 256, 32)), dt)
    ob = OutputBlock(21, dtype=dt)
    v = jax.jit(ob.init)(key, x)
    t = timeit(jax.jit(lambda v, x: jnp.transpose(ob.apply(v, x), (0, 3, 1, 2)).sum()), v, x)
    print(f"head 1x1 + NCHW + f32 : {t*1e3:8.2f} ms  {t/batch*1e6:7.1f} us/frame")
    t = timeit(jax.jit(lambda v, x: ob.apply(v, x).sum()), v, x)
    print(f"head 1x1 (NHWC, f32)  : {t*1e3:8.2f} ms  {t/batch*1e6:7.1f} us/frame")


if __name__ == "__main__":
    main()
