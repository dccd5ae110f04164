"""Experiment loggers: CSV (always on), JSONL, and optional Comet / TensorBoard.

Capability parity with the reference's logger group
(vital/vital/runner.py:166-196: CometLogger default, TensorBoardLogger
fallback; figure uploads task/uncertainty.py:100-104). comet_ml and
tensorboard are optional imports; when one is missing the shim no-ops and
everything still lands in CSV/JSONL. In this environment comet_ml is absent
(fake-backend tested) while TensorBoard is real — the TB fan-out is verified
against actual event files (tests/test_tracking_shims.py round-trip).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Optional


class ExperimentLogger:
    """Fan-out logger: JSONL file + optional comet/tensorboard backends."""

    def __init__(self, run_dir: str | Path, name: str,
                 use_comet: bool = False, use_tensorboard: bool = False,
                 project_name: str = "contouring-uncertainty-tpu",
                 tags: Optional[Dict] = None):
        self.run_dir = Path(run_dir)
        self.run_dir.mkdir(parents=True, exist_ok=True)
        self._jsonl = open(self.run_dir / f"{name}_metrics.jsonl", "a")
        self._comet = None
        self._tb = None
        if use_comet:
            try:
                import comet_ml

                self._comet = comet_ml.Experiment(project_name=project_name)
                if tags:
                    self._comet.log_parameters(tags)
            except Exception as exc:
                print(f"[logger] comet unavailable ({exc}); falling back to JSONL")
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(str(self.run_dir / "tb"))
            except Exception as exc:
                print(f"[logger] tensorboard unavailable ({exc}); falling back to JSONL")

    def log_metrics(self, metrics: Dict, step: Optional[int] = None):
        record = {"step": step, **{k: _py(v) for k, v in metrics.items()}}
        self._jsonl.write(json.dumps(record) + "\n")
        self._jsonl.flush()
        if self._comet is not None:
            self._comet.log_metrics(metrics, step=step)
        if self._tb is not None:
            for key, value in metrics.items():
                try:
                    self._tb.add_scalar(key, float(value), step or 0)
                except (TypeError, ValueError):
                    pass

    def log_figure(self, name: str, fig, step: Optional[int] = None):
        """Upload/attach a matplotlib figure (reference upload_fig)."""
        path = self.run_dir / "figures" / f"{name}_{step or 0}.png"
        path.parent.mkdir(parents=True, exist_ok=True)
        fig.savefig(path, dpi=80)
        if self._comet is not None:
            self._comet.log_figure(name, fig, step=step)
        if self._tb is not None:
            try:
                self._tb.add_figure(name, fig, step or 0)
            except Exception:
                pass

    def close(self):
        self._jsonl.close()
        if self._comet is not None:
            self._comet.end()
        if self._tb is not None:
            self._tb.close()


def _py(v):
    try:
        return float(v)
    except (TypeError, ValueError):
        return str(v)
