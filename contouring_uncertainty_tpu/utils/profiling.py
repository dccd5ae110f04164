"""Profiling & tracing utilities.

The reference had no profiler integration at all (SURVEY §5 — only torchinfo
summaries). Here tracing is first-class:

- `PhaseTimer`: cheap accumulating wall-clock phases with device sync, for
  the train/predict loops (written to phases.json next to the metrics CSV);
- `device_trace`: context manager around jax.profiler.trace (TensorBoard
  format), no-op if the backend can't trace (the tunneled axon platform);
- `model_summary`: flax tabulate dump, the torchinfo-summary.txt counterpart
  (vital/vital/system.py:117-132).
"""

from __future__ import annotations

import json
import time
from collections import defaultdict
from contextlib import contextmanager
from pathlib import Path
from typing import Dict, Optional

import jax


class PhaseTimer:
    def __init__(self, sync: bool = False):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        self.sync = sync

    @contextmanager
    def phase(self, name: str):
        start = time.perf_counter()
        yield
        if self.sync:
            # Effectful sync: materialize a trivial computation.
            jax.block_until_ready(jax.numpy.zeros(()))
        self.totals[name] += time.perf_counter() - start
        self.counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                "total_s": round(self.totals[name], 4),
                "count": self.counts[name],
                "mean_ms": round(1000 * self.totals[name] / max(self.counts[name], 1), 3),
            }
            for name in self.totals
        }

    def dump(self, path: str | Path):
        Path(path).write_text(json.dumps(self.summary(), indent=2))


@contextmanager
def device_trace(log_dir: Optional[str | Path]):
    """jax.profiler trace (xplane/TensorBoard format); silently no-ops when
    the platform cannot trace."""
    if log_dir is None:
        yield
        return
    try:
        jax.profiler.start_trace(str(log_dir))
        started = True
    except Exception:
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


def model_summary(model, input_shape, train: bool = False) -> str:
    """Flax tabulate summary (the reference wrote torchinfo to summary.txt)."""
    import jax.numpy as jnp
    from flax import linen as nn

    try:
        fn = nn.tabulate(model, jax.random.key(0),
                         compute_flops=False, compute_vjp_flops=False)
        return fn(jnp.zeros((1,) + tuple(input_shape), jnp.float32))
    except Exception as exc:
        return f"<summary unavailable: {type(exc).__name__}: {exc}>"
