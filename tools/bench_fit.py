#!/usr/bin/env python
"""Steady-state REAL-LOOP training throughput (Trainer.fit, not a bare step).

bench.py's train_frames_per_sec times the jitted step on fixed device tensors;
this tool answers the follow-up question — does the full fit() loop (native
C++ prefetcher -> shard_batch host->device -> on-device augmentation ->
donated train step -> epoch-end val) sustain that rate? It runs a few epochs
of in-memory synthetic data at the flagship shape and reports:

  - steady-state train frames/s from the LAST epoch's wall time (the trainer
    writes per-epoch `time` rows to its metrics CSV; epoch 0 carries the
    compiles),
  - the PhaseTimer data/train_step wall split the trainer already records
    (dispatch-side: train_step enqueues asynchronously, so the data phase is
    the honest host-feed cost and the residual epoch time is device-bound).

Usage: python tools/bench_fit.py [batch] [frames_per_epoch] [epochs]
"""

from __future__ import annotations

import csv
import json
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import tempfile
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    frames = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    epochs = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from contouring_uncertainty_tpu.data.config import DataParams, Label, Tags
    from contouring_uncertainty_tpu.tasks import DSNTAleatoric
    from contouring_uncertainty_tpu.train import Trainer, TrainerConfig

    rng = np.random.default_rng(0)
    task = DSNTAleatoric(
        data_params=DataParams(in_shape=(1, 256, 256), out_shape=(21, 2),
                               labels=(Label.BG, Label.LV)),
        model_kwargs={"dtype": jnp.bfloat16},
    )

    def arrays(n):
        return {
            Tags.img: rng.normal(size=(n, 1, 256, 256)).astype(np.float32),
            Tags.gt: np.zeros((n, 256, 256), np.int32),
            Tags.contour: rng.uniform(32, 224, size=(n, 21, 2)).astype(np.float32),
        }

    train_arrays = arrays(frames)
    val_arrays = arrays(batch)

    with tempfile.TemporaryDirectory() as tmp:
        cfg = TrainerConfig(batch_size=batch, max_epochs=epochs, save_path=tmp,
                            name="bench_fit", augment=True, use_comet=False,
                            use_tensorboard=False)
        trainer = Trainer(task, cfg)
        trainer.fit(train_arrays, val_arrays)

        run_dir = Path(tmp) / str(cfg.seed)
        with open(run_dir / "bench_fit_metrics.csv") as f:
            rows = list(csv.DictReader(f))
        phases = {}
        phase_file = run_dir / "bench_fit_phases.json"
        if phase_file.exists():
            phases = json.loads(phase_file.read_text())

    steps_per_epoch = frames // batch
    epoch_frames = steps_per_epoch * batch
    per_epoch = [float(r["time"]) for r in rows]
    steady = per_epoch[-1]
    print(json.dumps({
        "batch": batch,
        "frames_per_epoch": epoch_frames,
        "epoch_wall_s": [round(t, 2) for t in per_epoch],
        "steady_state_frames_per_sec": round(epoch_frames / steady, 1),
        "phases": phases,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
