"""Bench-artifact robustness (VERDICT r3 next-round #1): the driver's one
independently-captured artifact must land every round — a parseable JSON line
must hit stdout no matter what the tunnel or the wall clock does.

Covers: (a) the stage scheduler skips stages that don't fit the remaining
budget, records them, re-emits after every stage, and survives stage
exceptions; (b) a simulated full tunnel outage (probe forced to fail, zero
wait budget) still prints a well-formed degraded line end-to-end through
`python bench.py`.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import bench  # noqa: E402


def test_run_stages_skips_over_budget_and_records():
    emitted, cached = [], []
    line = {"metric": "m", "value": 1.0}
    calls = []

    stages = [
        ("fast", "a", 10, lambda: calls.append("fast") or line.update(fast=1)),
        ("slow", "a", 500, lambda: calls.append("slow")),
        ("fits", "b", 10, lambda: calls.append("fits") or line.update(fits=2)),
    ]
    skipped = bench._run_stages(
        line, stages,
        emit=lambda l: emitted.append(json.loads(json.dumps(l))),
        write_cache=lambda l: cached.append(dict(l)),
        remaining=lambda: 60.0,
    )
    assert calls == ["fast", "fits"]
    assert skipped == ["slow"]
    assert line["skipped_benches"] == ["slow"]
    assert line["fast"] == 1 and line["fits"] == 2
    # Re-emitted after each run stage + the final skipped-list emit: every
    # emitted line is complete JSON (proven by the round-trip above).
    assert len(emitted) == 3
    assert emitted[-1]["skipped_benches"] == ["slow"]
    assert len(cached) == len(emitted)


def test_run_stages_adaptive_family_estimate():
    """A measured slow stage raises its family's estimate so a later
    same-family stage is skipped even if its static estimate would fit."""
    import time as _time

    line = {}
    ran = []

    def slow():
        ran.append("p1")
        _time.sleep(0.25)

    stages = [
        ("p1", "predict", 0.01, slow),
        # static est 0.01 fits the 0.1 remaining, but family cost is now 0.25
        ("p2", "predict", 0.01, lambda: ran.append("p2")),
    ]
    clock = iter([10.0, 0.1, 0.1])
    skipped = bench._run_stages(
        line, stages, emit=lambda l: None, write_cache=lambda l: None,
        remaining=lambda: next(clock),
    )
    assert ran == ["p1"]
    assert skipped == ["p2"]


def test_run_stages_stage_exception_is_recorded_not_fatal():
    line = {}

    def boom():
        raise RuntimeError("tunnel ate it")

    stages = [
        ("bad", "a", 1, boom),
        ("good", "a", 1, lambda: line.update(good=1)),
    ]
    skipped = bench._run_stages(
        line, stages, emit=lambda l: None, write_cache=lambda l: None,
        remaining=lambda: 100.0,
    )
    assert skipped == []
    assert "RuntimeError" in line["bad_error"]
    assert line["good"] == 1


_TINY_MODEL = dict(kernels=((3, 3),) * 4, strides=((1, 1),) + ((2, 2),) * 3)
_SMOKE = dict(size=64, t_a=3, t_e=2, iters=2, windows=1,
              model_kwargs=_TINY_MODEL)


def test_bench_train_e2e_smoke():
    """The feed-inclusive training stage runs end-to-end (prefetcher ->
    shard -> in-jit augmentation+fold_in -> donated step) on a tiny config,
    so a stage-function API/shape error can't first surface on the chip."""
    out = bench._bench_train_e2e(batch_size=8, n_frames=32, size=64,
                                 model_kwargs=_TINY_MODEL,
                                 windows=1, epochs_per_window=1)
    assert out["train_frames_per_sec_e2e"] > 0


def test_bench_predict_seq_smoke():
    assert bench._bench_predict_pipeline(sequence=True, smoke=_SMOKE) > 0


def test_bench_aggregate_predict_smoke():
    out = bench._bench_aggregate_predict(
        smoke={**_SMOKE, "views_per_chip": 1})
    assert out["aggregate_views_per_sec"] > 0
    assert out["aggregate_views_n_devices"] == 8  # conftest's virtual mesh


def test_bench_outage_emits_parseable_degraded_line():
    """End-to-end `python bench.py` under a simulated tunnel outage: probe
    forced to fail instantly (JAX_PLATFORMS=cpu short-circuits ensure_backend),
    zero wait budget. The LAST stdout line must be complete JSON carrying the
    degraded marker, a numeric value, and the cached last-TPU line."""
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        BENCH_TPU_WAIT_BUDGET_S="0",
        BENCH_TOTAL_BUDGET_S="400",
        PYTHONPATH=str(REPO),
    )
    res = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        capture_output=True, text=True, timeout=540, env=env, cwd=str(REPO),
    )
    assert res.returncode == 0, res.stderr[-2000:]
    json_lines = [l for l in res.stdout.strip().splitlines()
                  if l.startswith("{")]
    assert json_lines, res.stdout
    line = json.loads(json_lines[-1])
    assert line["metric"] == "unet_dsnt_inference_frames_per_sec_per_chip"
    assert line["degraded"] == "tpu_tunnel_unavailable_cpu_fallback"
    assert isinstance(line["value"], float)
    # The outage must not erase the round's real measurement: the cached
    # on-TPU line rides along whenever the cache file exists.
    if (REPO / "BENCH_LAST_TPU.json").exists():
        assert "last_tpu" in line
