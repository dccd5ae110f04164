"""Config -> object factory (the counterpart of Hydra's instantiate calls in
vital/vital/runner.py:94-110, but explicit instead of reflective)."""

from __future__ import annotations

from pathlib import Path
from typing import Dict

import jax.numpy as jnp

from contouring_uncertainty_tpu.data.camus import CamusContourData
from contouring_uncertainty_tpu.data.config import Label, LungLabel
from contouring_uncertainty_tpu.train import Trainer, TrainerConfig

_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}


def build_data(cfg: Dict):
    from contouring_uncertainty_tpu.data.transforms import build_transform

    data_cfg = cfg["data"]
    name = data_cfg.get("name", "camus-cont")
    # Each dataset family has its own label enum (reference keeps a Label
    # per data package: vital camus config.py vs data/lung/config.py).
    enum = LungLabel if name.startswith("lung") else Label
    default_labels = (["BG", "LUNG", "HEART"] if enum is LungLabel
                      else ["BG", "LV"])
    labels = tuple(enum[l] if isinstance(l, str) else enum(l)
                   for l in data_cfg.get("labels") or default_labels)
    transform = build_transform(data_cfg.get("transform"))
    if name == "synthetic":
        from contouring_uncertainty_tpu.data.synthetic import write_camus_hdf5

        path = Path(data_cfg["dataset_path"])
        if not path.exists():
            write_camus_hdf5(
                path,
                n_patients=data_cfg.get("n_patients", 16),
                size=data_cfg.get("image_size", 256),
                seed=cfg.get("seed", 10),
                fold=data_cfg.get("fold", 5),
            )
        return CamusContourData(
            path, fold=data_cfg.get("fold", 5),
            points_per_side=data_cfg.get("points_per_side", 11), labels=labels,
            transform=transform,
        )
    if name in ("camus-cont", "camus"):
        return CamusContourData(
            data_cfg["dataset_path"], fold=data_cfg.get("fold", 5),
            points_per_side=data_cfg.get("points_per_side", 11), labels=labels,
            use_sequence=data_cfg.get("use_sequence", False),
            transform=transform,
        )
    if name in ("lung", "lung-cont"):
        from contouring_uncertainty_tpu.data.lung import JSRTContourData

        return JSRTContourData(data_cfg["dataset_path"], labels=labels,
                               transform=transform)
    raise ValueError(f"Unknown data config '{name}'")


def model_kwargs_from_cfg(model_cfg: Dict) -> Dict:
    kwargs = {}
    if "kernels" in model_cfg:
        kwargs["kernels"] = tuple(tuple(k) for k in model_cfg["kernels"])
    if "strides" in model_cfg:
        kwargs["strides"] = tuple(tuple(s) for s in model_cfg["strides"])
    for flag in ("drop_block", "deep_supervision", "residual", "attention",
                 "out_seg_bias", "ssn_rank", "bottleneck_out", "init_channels",
                 "dropout", "n_heads", "base", "layers", "encoder_relu",
                 "decoder_relu", "sigma_out"):
        if flag in model_cfg:
            kwargs[flag] = model_cfg[flag]
    if "layers" in kwargs:
        kwargs["layers"] = tuple(kwargs["layers"])
    if "dtype" in model_cfg:
        kwargs["dtype"] = _DTYPES[model_cfg["dtype"]]
    return kwargs


def build_task(cfg: Dict, data_params):
    task_cfg = cfg["task"]
    name = task_cfg.get("name", "dsnt-al")
    model_cfg = task_cfg.get("model", {})
    model_kwargs = model_kwargs_from_cfg(model_cfg)
    common = dict(
        data_params=data_params,
        t_a=task_cfg.get("t_a", 25),
        t_e=task_cfg.get("t_e", 1),
        model_kwargs=model_kwargs,
        model_name=model_cfg.get("name", "unet2"),
    )
    if name == "dsnt-al":
        from contouring_uncertainty_tpu.tasks import DSNTAleatoric

        return DSNTAleatoric(
            covar=task_cfg.get("covar", True),
            mse_weight=task_cfg.get("mse_weight", 1.0),
            log_penalty_weight=task_cfg.get("log_penalty_weight", 1.0),
            **common,
        )
    if name in ("dsnt-skew", "dsnt-skew5", "dsnt-skew9"):
        from contouring_uncertainty_tpu.tasks.dsnt_skew import DSNTSkew

        raw_idx = task_cfg.get("skew_indices")
        return DSNTSkew(
            skew_indices=tuple(raw_idx) if raw_idx else None,
            mse_weight=task_cfg.get("mse_weight", 1.0),
            log_penalty_weight=task_cfg.get("log_penalty_weight", 1.0),
            freeze_seg=task_cfg.get("freeze_seg", False),
            **common,
        )
    if name == "epistemic":
        from contouring_uncertainty_tpu.tasks.epistemic import EpistemicUncertainty

        return EpistemicUncertainty(
            covar=task_cfg.get("covar", True),
            **common,
        )
    if name == "mcdropout":
        from contouring_uncertainty_tpu.tasks.segmentation import McDropoutUncertainty

        return McDropoutUncertainty(**common)
    if name == "aleatoric":
        from contouring_uncertainty_tpu.tasks.segmentation import AleatoricUncertainty

        return AleatoricUncertainty(iterations=task_cfg.get("iterations", 10), **common)
    if name == "tta":
        from contouring_uncertainty_tpu.tasks.segmentation import TTAUncertainty

        return TTAUncertainty(**common)
    if name == "ssn":
        from contouring_uncertainty_tpu.tasks.segmentation import StochasticSegmentationNetwork

        return StochasticSegmentationNetwork(
            rank=task_cfg.get("rank", 10),
            mc_samples=task_cfg.get("mc_samples", 20),
            **common,
        )
    raise ValueError(f"Unknown task '{name}'")


def experiment_name(cfg: Dict) -> str:
    data_name = cfg["data"].get("name", "data")
    task_name = cfg["task"].get("name", "task")
    model_name = cfg["task"].get("model", {}).get("name", "unet2")
    drop = cfg["task"].get("model", {}).get("drop_block", False)
    return f"{data_name}_{task_name}-{model_name}-{drop}_{cfg.get('seed', 10)}"


def build_trainer(cfg: Dict, task) -> Trainer:
    t = cfg.get("trainer", {})
    optim = cfg["task"].get("optim", {})
    tc = TrainerConfig(
        batch_size=t.get("batch_size", 32),
        max_epochs=t.get("max_epochs", 1000),
        patience=t.get("patience", 100),
        lr=float(optim.get("lr", 1e-3)),
        weight_decay=float(optim.get("weight_decay", 1e-3)),
        optimizer=optim.get("name", "adamw"),
        momentum=float(optim.get("momentum", 0.0) or 0.0),
        rmsprop_alpha=float(optim.get("alpha", 0.9)),
        lr_schedule=optim.get("schedule"),
        lr_decay_steps=int(optim.get("decay_steps", 0) or 0),
        lr_decay_rate=float(optim.get("decay_rate", 0.1)),
        lr_warmup_steps=int(optim.get("warmup_steps", 0) or 0),
        seed=cfg.get("seed", 10),
        save_path=cfg.get("save_path", "outputs"),
        name=experiment_name(cfg),
        fast_dev_run=t.get("fast_dev_run", 0),
        augment=t.get("augment", True),
        min_epochs=t.get("min_epochs", 1),
        use_comet=bool(cfg.get("comet", False)),
        use_tensorboard=bool(cfg.get("tensorboard", False)),
        save_every=t.get("save_every", 25),
        feed_uint8=bool(t.get("feed_uint8", False)),
    )
    return Trainer(task, tc)
