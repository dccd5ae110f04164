"""Backend availability probing (utils/backend.py).

The real probe path (subprocess PJRT init against the tunneled TPU) is
exercised by bench.py and __graft_entry__.entry() under the driver; here we
pin the contracts that must hold in any environment.
"""

import io
import sys
from contextlib import redirect_stderr

from contouring_uncertainty_tpu.utils import backend


def test_ensure_backend_respects_cpu_pin(monkeypatch):
    # Under the test env (JAX_PLATFORMS=cpu, conftest) ensure_backend must
    # short-circuit to False without spawning any probe subprocess.
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    calls = []
    monkeypatch.setattr(backend, "tpu_probe_once",
                        lambda *a, **k: calls.append(1) or True)
    assert backend.ensure_backend(wait_budget_s=0) is False
    assert not calls


def test_ensure_backend_returns_true_when_probe_passes(monkeypatch):
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    monkeypatch.setattr(backend, "tpu_probe_once", lambda *a, **k: True)
    assert backend.ensure_backend(wait_budget_s=0) is True


def test_ensure_backend_pins_cpu_after_budget(monkeypatch):
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    monkeypatch.setattr(backend, "tpu_probe_once", lambda *a, **k: False)
    pinned = []
    import jax

    monkeypatch.setattr(jax.config, "update",
                        lambda k, v: pinned.append((k, v)))
    err = io.StringIO()
    with redirect_stderr(err):
        assert backend.ensure_backend(wait_budget_s=0, label="t") is False
    assert ("jax_platforms", "cpu") in pinned
    assert "unavailable" in err.getvalue()


def test_probe_times_out_quickly(monkeypatch):
    # A probe command that would hang forever must be bounded by the timeout.
    monkeypatch.setattr(
        backend.sys, "executable", sys.executable, raising=False)
    import time

    t0 = time.monotonic()
    ok = backend.tpu_probe_once(timeout_s=1) if _probe_would_hang() else True
    assert time.monotonic() - t0 < 30
    assert ok in (True, False)


def _probe_would_hang() -> bool:
    # Probe subprocesses inherit JAX_PLATFORMS=cpu from the test env, so the
    # platform assert fails fast — safe to run the real function.
    return True
