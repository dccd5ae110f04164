"""Experiment driver: compose config -> data -> task -> trainer -> predict.

Capability parity with the reference's runner stack (runner.py:10-57 +
vital/vital/runner.py:30-216): same CLI surface
(`python runner.py data=camus-cont task=dsnt-al task.model.drop_block=True
train=False ...`), deterministic experiment naming, auto weight loading for
eval-only runs, train -> best-ckpt -> test -> predict sequencing.
"""

from __future__ import annotations

import sys
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from contouring_uncertainty_tpu.config import compose
from contouring_uncertainty_tpu.factory import (
    build_data,
    build_task,
    build_trainer,
    experiment_name,
)
from contouring_uncertainty_tpu.train.checkpoint import (
    resolve_checkpoint,
    restore_checkpoint,
)


def run(overrides: Optional[List[str]] = None) -> Dict:
    cfg = compose(overrides)
    data = build_data(cfg)
    task = build_task(cfg, data.data_params)
    trainer = build_trainer(cfg, task)

    result: Dict = {"cfg": cfg}
    variables = None

    if cfg.get("train", True):
        train_arrays = data.train_arrays("train")
        val_arrays = data.train_arrays("val")
        n_members = int(cfg.get("task", {}).get("train_ensemble", 0) or 0)
        if n_members > 1:
            # Deep ensemble: independently-seeded members into one directory
            # (reference train_ensemble flag + ensemble ckpt dirs,
            # uncertainty.py:54-70).
            ens_dir = Path(cfg.get("save_path", "outputs")) / str(cfg.get("seed", 10)) / (
                experiment_name(cfg) + "_ensemble"
            )
            ens_dir.mkdir(parents=True, exist_ok=True)
            members = []
            for i in range(n_members):
                member_cfg = dict(cfg)
                member_cfg["seed"] = cfg.get("seed", 10) + i
                member_trainer = build_trainer(member_cfg, task)
                member_vars, member_ckpt = member_trainer.fit(train_arrays, val_arrays)
                target = ens_dir / f"member_{i}.ckpt"
                import shutil

                if target.exists():
                    shutil.rmtree(target)
                shutil.move(str(member_ckpt), str(target))
                members.append(member_vars)
            variables = members
            ckpt_path = ens_dir
            result["history"] = member_trainer.history
        else:
            resume_from = None
            if cfg.get("resume"):
                resume_from = cfg.get("ckpt") or str(
                    Path(cfg.get("save_path", "outputs")) / str(cfg.get("seed", 10))
                    / (experiment_name(cfg) + "_last.ckpt")
                )
            variables, ckpt_path = trainer.fit(train_arrays, val_arrays,
                                               resume_from=resume_from)
            result["history"] = trainer.history
        result["ckpt_path"] = str(ckpt_path)
    else:
        ckpt = cfg.get("weights") or cfg.get("ckpt")
        if not ckpt:
            ckpt = Path(cfg.get("save_path", "outputs")) / str(cfg.get("seed", 10)) / (
                experiment_name(cfg) + ".ckpt"
            )
        model = task.build_model()
        import jax
        import jax.numpy as jnp

        c, h, w = task.data_params.in_shape
        init = jax.jit(model.init)(jax.random.key(0), jnp.zeros((2, c, h, w)))
        # Local path OR 'workspace/registry[/version]' Comet model-registry
        # query with local caching (checkpoint.resolve_checkpoint).
        ckpt = resolve_checkpoint(ckpt)
        # A directory of .ckpt checkpoints is loaded as a deep ensemble
        # (reference uncertainty.py:54-70: list of ckpts -> nn.ModuleList).
        members = sorted(ckpt.glob("*.ckpt")) if ckpt.is_dir() and not (ckpt / "state").exists() else []
        if members:
            variables = [restore_checkpoint(m, {"params": init["params"]}) for m in members]
        else:
            variables = restore_checkpoint(ckpt, {"params": init["params"]})
        result["ckpt_path"] = str(ckpt)

    if cfg.get("test", True) and variables is not None and hasattr(data, "train_arrays"):
        # Test-split metrics pass (the reference's trainer.test between fit
        # and predict, vital/vital/runner.py:142).
        import jax
        import numpy as np

        from contouring_uncertainty_tpu.parallel import make_mesh, shard_batch
        from contouring_uncertainty_tpu.train.trainer import _iterate

        try:
            test_arrays = data.train_arrays("test")
            model = task.build_model()
            var0 = variables[0] if isinstance(variables, (list, tuple)) else variables
            eval_step = jax.jit(
                lambda v, b: task.val_metrics(model, v, b)
            )
            mesh = make_mesh()
            logs = []
            rng = np.random.default_rng(0)
            for batch in _iterate(test_arrays, cfg.get("trainer", {}).get("batch_size", 32),
                                  rng, shuffle=False, drop_last=False):
                logs.append(eval_step(var0, shard_batch(batch, mesh)))
            if logs:
                test_metrics = {f"test/{k}": float(np.mean([float(l[k]) for l in logs]))
                                for k in logs[0]}
                result["test_metrics"] = test_metrics
                print({k: round(v, 4) for k, v in test_metrics.items()})
        except Exception as exc:
            # Recorded (not just printed) so eval-only runs exit nonzero.
            result["test_error"] = f"{type(exc).__name__}: {exc}"
            print(f"[runner] test pass failed: {result['test_error']}")

    if cfg.get("predict", True) and variables is not None:
        import jax

        from contouring_uncertainty_tpu.predict import run_predict

        # Multi-chip DP serving from the CLI: with more than one visible
        # device, predict shards views over a mesh of all of them
        # (parallel/serving.py; equivalence gated by tests/test_parallel.py).
        # `predict_mesh=false` pins the single-device path (bitwise
        # latency-mode reproducibility); default 'auto' uses what's there.
        mesh = None
        # Normalize truthy/falsy spellings from CLI overrides (ADVICE r4:
        # 'True'/'1'/'yes'/'on' must not silently pin single-device serving).
        raw_mesh = cfg.get("predict_mesh", "auto")
        mesh_sel = str(raw_mesh).strip().lower()
        if mesh_sel in ("true", "1", "yes", "on"):
            mesh_sel = "auto"
        elif mesh_sel in ("false", "0", "no", "off"):
            mesh_sel = "false"
        elif mesh_sel != "auto":
            raise ValueError(
                f"predict_mesh={raw_mesh!r} not understood — use 'auto', "
                "true, or false"
            )
        if mesh_sel == "auto" and len(jax.devices()) > 1:
            from contouring_uncertainty_tpu.parallel import make_mesh

            # predict_sample_parallel=s composes view DP with sample-axis
            # sharding on a 2D (views x samples) mesh — for the
            # few-views-on-many-chips regime (parallel/serving.py).
            s = int(cfg.get("predict_sample_parallel", 1) or 1)
            if len(jax.devices()) % s:
                raise ValueError(
                    f"predict_sample_parallel={s} must divide the device "
                    f"count ({len(jax.devices())})"
                )
            mesh = make_mesh(model_parallel=s)
        proc_metrics: Dict = {}
        results = run_predict(task, variables, data, cfg, mesh=mesh,
                              metrics_out=proc_metrics)
        result["predict"] = results
        if proc_metrics.get("processor_errors"):
            result["processor_errors"] = proc_metrics["processor_errors"]
    return result


def main():
    result = run(sys.argv[1:])
    if "history" in result and result["history"]:
        last = result["history"][-1]
        print({k: round(v, 4) for k, v in last.items() if isinstance(v, float)})
    if "ckpt_path" in result:
        print(f"checkpoint: {result['ckpt_path']}")
    # Eval-only runs exist to produce artifacts; a failed processor or test
    # pass means the run did NOT deliver them -> nonzero exit status.
    eval_only = not result.get("cfg", {}).get("train", True)
    failures = {}
    if result.get("processor_errors"):
        failures["processors"] = result["processor_errors"]
    if result.get("test_error"):
        failures["test"] = result["test_error"]
    if eval_only and failures:
        print(f"[runner] evaluation produced errors: {failures}")
        sys.exit(1)


if __name__ == "__main__":
    main()
