"""TPU-backend availability probing for the tunneled axon platform.

The environment reaches its single TPU chip through a tunnel that goes down
for hours at a time (observed >7 h). When it is down, the first backend touch
hangs ~20 min inside PJRT init before raising UNAVAILABLE and ``jax.devices()``
blocks — so anything that must not hang (bench runs, driver entry checks)
probes availability in a *timeout-bounded subprocess* first and falls back to
the CPU backend explicitly.

No reference counterpart: the reference (ThierryJudge/contouring-uncertainty)
is single-process CUDA; this is infrastructure for the tunneled-TPU
deployment target.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time


def tpu_probe_once(timeout_s: int = 180) -> bool:
    """True iff the TPU backend initializes and executes in a subprocess."""
    code = (
        "import jax, numpy as np, jax.numpy as jnp;"
        "assert jax.devices()[0].platform != 'cpu';"
        "np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)));"
        "print('TPU_OK')"
    )
    try:
        res = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        return False
    return "TPU_OK" in res.stdout


def ensure_backend(wait_budget_s: int = 0, probe_timeout_s: int = 180,
                   label: str = "tpu") -> bool:
    """Wait (bounded) for the TPU; pin the CPU backend if it never comes back.

    Returns True when the TPU is usable, False after falling back to CPU.
    Must be called BEFORE the first backend touch in the calling process
    (jax backends initialize lazily, so flipping ``jax_platforms`` is safe
    until then — same contract as tests/conftest.py).
    """
    import jax

    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        return False
    deadline = time.monotonic() + wait_budget_s
    while True:
        if tpu_probe_once(probe_timeout_s):
            return True
        remaining = deadline - time.monotonic()
        if remaining <= 0:
            break
        print(
            f"{label}: TPU tunnel down, retrying (gives up in {remaining:.0f}s)",
            file=sys.stderr,
        )
        time.sleep(min(90, max(1, remaining)))
    jax.config.update("jax_platforms", "cpu")
    print(f"{label}: TPU tunnel unavailable — pinned the CPU backend",
          file=sys.stderr)
    return False
