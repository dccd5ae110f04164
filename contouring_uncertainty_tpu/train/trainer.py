"""Trainer: jitted train/eval steps over an explicit TrainState on a device mesh.

Replaces the reference's PyTorch-Lightning Trainer + VitalSystem
(vital/vital/runner.py:94-145, vital/vital/system.py:17-137) with a compact
TPU-native loop:

- one jitted `train_step` with donated state (params stay on device, grads
  averaged across the mesh's data axis automatically by XLA's partitioner);
- host-side epoch loop feeding sharded batches and on-device augmentation;
- early stopping on val/loss (patience, matching config/default.yaml:42-44)
  and deterministic best-checkpoint naming
  `{save_path}/{seed}/{name}.ckpt` (vital/vital/runner.py:128-136);
- CSV metric logging (stand-in for the Comet/TensorBoard loggers).
"""

from __future__ import annotations

import csv
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training.train_state import TrainState

from contouring_uncertainty_tpu.data import augment as aug
from contouring_uncertainty_tpu.data.config import Tags
from contouring_uncertainty_tpu.parallel import make_mesh, replicate, shard_batch
from contouring_uncertainty_tpu.train.checkpoint import save_checkpoint


@dataclass
class TrainerConfig:
    batch_size: int = 32
    max_epochs: int = 1000
    patience: int = 100
    lr: float = 1e-3
    weight_decay: float = 1e-3
    # Optimizer family (the reference's task/optim group: adam/sgd/rmsprop —
    # vital/config/task/optim/*.yaml + config/task/optim/rmsprop.yaml).
    # "adamw" (default, decoupled decay) matches the historical behavior of
    # this trainer; "adam"/"sgd"/"rmsprop" use torch-style L2 decay (decayed
    # weights added to the gradient BEFORE the moment updates).
    optimizer: str = "adamw"
    momentum: float = 0.0  # sgd / rmsprop
    rmsprop_alpha: float = 0.9  # rmsprop smoothing (torch `alpha`)
    # LR schedule surface (reference callbacks/lr_monitor.yaml monitors a
    # scheduler; Lightning schedulers step per epoch — these step per
    # optimizer step, horizon in steps). None = constant lr.
    lr_schedule: Optional[str] = None  # None | cosine | exponential | step
    lr_decay_steps: int = 0  # schedule horizon (steps); 0 -> max_epochs*100
    lr_decay_rate: float = 0.1  # exponential/step decay factor per horizon
    lr_warmup_steps: int = 0  # linear warmup prefix
    seed: int = 10
    save_path: str = "outputs"
    name: str = "run"
    fast_dev_run: int = 0  # >0: cap batches/epoch and run 1 epoch
    augment: bool = True
    log_every: int = 50
    min_epochs: int = 1
    native_loader: bool = True  # C++ async prefetcher (falls back to numpy)
    # Double-buffer the host->device feed: a background thread device_puts
    # batch k+1 while step k computes (VERDICT r4 item 7 — on PCIe hosts
    # this overlap is the difference between feed-bound and compute-bound).
    overlap_feed: bool = True
    # Ship train images host->device as uint8 (4x fewer feed bytes; the step
    # dequantizes on device). Lossless for 8-bit acquisitions stored as
    # [0,1] floats (CAMUS img_proc is uint8/255 — data/camus.py:116); other
    # data is round-tripped through round(img*255)/255, so keep the f32
    # default when images are not natively 8-bit.
    feed_uint8: bool = False
    use_comet: bool = False
    use_tensorboard: bool = False
    save_every: int = 25  # periodic full-state (resumable) checkpoint cadence
    # Per-val-epoch contour-overlay figures (reference uncertainty.py:100-104);
    # written under {run_dir}/figures/ and attached to Comet/TB when active.
    log_figures: bool = True


class Trainer:
    def __init__(self, task, config: TrainerConfig, mesh=None):
        self.task = task
        self.config = config
        self.mesh = mesh if mesh is not None else make_mesh()
        self.model = task.build_model()
        self.history: list = []
        self._metrics_file: Optional[Path] = None

    # ------------------------------------------------------------------- setup

    def _lr_schedule(self):
        """Per-step learning-rate schedule callable (also used to log `lr`
        each epoch — the reference's LearningRateMonitor callback)."""
        cfg = self.config
        name = (cfg.lr_schedule or "").lower()
        horizon = cfg.lr_decay_steps or cfg.max_epochs * 100
        if not name or name == "constant":
            sched = optax.constant_schedule(cfg.lr)
        elif name == "cosine":
            sched = optax.cosine_decay_schedule(cfg.lr, horizon)
        elif name == "exponential":
            sched = optax.exponential_decay(cfg.lr, horizon, cfg.lr_decay_rate)
        elif name == "step":
            sched = optax.exponential_decay(cfg.lr, horizon, cfg.lr_decay_rate,
                                            staircase=True)
        else:
            raise ValueError(f"Unknown lr_schedule '{cfg.lr_schedule}'")
        if cfg.lr_warmup_steps:
            sched = optax.join_schedules(
                [optax.linear_schedule(0.0, cfg.lr, cfg.lr_warmup_steps), sched],
                [cfg.lr_warmup_steps],
            )
        return sched

    def _make_optimizer(self):
        cfg = self.config
        lr = self._lr_schedule()
        name = cfg.optimizer.lower()
        if name == "adamw":
            return optax.adamw(lr, weight_decay=cfg.weight_decay)
        # torch-style coupled L2: decay folded into the gradient before the
        # moment updates (torch.optim.{Adam,SGD,RMSprop} weight_decay).
        l2 = ([optax.add_decayed_weights(cfg.weight_decay)]
              if cfg.weight_decay else [])
        if name == "adam":
            return optax.chain(*l2, optax.adam(lr))
        if name == "sgd":
            return optax.chain(*l2, optax.sgd(lr, momentum=cfg.momentum or None))
        if name == "rmsprop":
            return optax.chain(*l2, optax.rmsprop(
                lr, decay=cfg.rmsprop_alpha, momentum=cfg.momentum))
        raise ValueError(f"Unknown optimizer '{cfg.optimizer}'")

    def init_state(self, rng: jax.Array) -> TrainState:
        c, h, w = self.task.data_params.in_shape
        dummy = jnp.zeros((2, c, h, w), jnp.float32)
        variables = jax.jit(self.model.init)(rng, dummy)
        tx = self._make_optimizer()
        # Fine-tune modes (e.g. dsnt-skew freeze_seg): the task may label
        # parameter subtrees; frozen ones get set_to_zero updates.
        labels_fn = getattr(self.task, "optimizer_labels", None)
        labels = labels_fn(variables["params"]) if labels_fn else None
        if labels is not None:
            tx = optax.multi_transform(
                {"train": tx, "freeze": optax.set_to_zero()}, labels
            )
        state = TrainState.create(
            apply_fn=self.model.apply, params=variables["params"], tx=tx
        )
        return replicate(state, self.mesh)

    def _build_steps(self):
        task, model = self.task, self.model
        augment = self.config.augment

        def train_step(state: TrainState, batch, rng, step_idx):
            # Augmentation params and the per-step rng folds run INSIDE the
            # jit: on the tunneled platform every host-side dispatch
            # (fold_in, each augment op) costs 10s of ms of enqueue time, so
            # the whole step must be ONE dispatch. Key derivation matches
            # the former host-side loop exactly (fold_in(rng, 2*step) for
            # augmentation, 2*step+1 for the loss), so runs reproduce.
            img = batch[Tags.img]
            if img.dtype == jnp.uint8:  # feed_uint8: dequantize on device
                batch = {**batch, Tags.img: img.astype(jnp.float32) / 255.0}
            if augment:
                aug_key = jax.random.fold_in(rng, 2 * step_idx)
                batch = aug.apply(
                    batch, aug.sample_params(aug_key, batch[Tags.img].shape[0])
                )
            loss_key = jax.random.fold_in(rng, 2 * step_idx + 1)

            def loss_fn(params):
                return task.loss(model, {"params": params}, batch, rng=loss_key,
                                 train=True)

            (loss, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
            state = state.apply_gradients(grads=grads)
            return state, logs

        def eval_step(state: TrainState, batch):
            return task.val_metrics(model, {"params": state.params}, batch)

        self._train_step = jax.jit(train_step, donate_argnums=(0,))
        self._eval_step = jax.jit(eval_step)

    # --------------------------------------------------------------------- fit

    def fit(self, train_arrays: Dict[str, np.ndarray], val_arrays: Dict[str, np.ndarray],
            resume_from: Optional[str] = None):
        """Train; `resume_from` restores a full-state checkpoint (params +
        optimizer state + epoch) written by the periodic saver — the
        counterpart of Lightning's resume_from_checkpoint
        (vital/vital/runner.py:91-92)."""
        # Multi-host DCN init happens inside make_mesh() (Trainer.__init__),
        # i.e. before the backend is first touched.
        cfg = self.config
        if cfg.feed_uint8:
            img = train_arrays[Tags.img]
            if img.dtype != np.uint8:
                # Guard (ADVICE r4): quantization is only lossless for [0, 1]
                # 8-bit-origin data; z-scored or raw-intensity inputs would
                # be silently clipped/crushed. Refuse rather than corrupt.
                frac_outside = float(np.mean((img < -1e-6) | (img > 1.0 + 1e-6)))
                if frac_outside > 0.01:
                    raise ValueError(
                        f"feed_uint8=true but {frac_outside:.1%} of image "
                        "values fall outside [0, 1] — the uint8 feed would "
                        "clip them (z-scored/raw data?). Disable feed_uint8 "
                        "or normalize images to [0, 1] first."
                    )
                if frac_outside > 0:
                    print(f"[trainer] feed_uint8: clipping {frac_outside:.2%} "
                          "of image values to [0, 1]")
                train_arrays = {**train_arrays, Tags.img: np.round(
                    np.clip(img, 0.0, 1.0) * 255.0).astype(np.uint8)}
        rng = jax.random.key(cfg.seed)
        np_rng = np.random.default_rng(cfg.seed)
        state = self.init_state(rng)
        start_epoch = 0
        if resume_from:
            from contouring_uncertainty_tpu.train.checkpoint import (
                load_meta,
                restore_checkpoint,
            )

            restored = restore_checkpoint(resume_from, {
                "params": state.params, "opt_state": state.opt_state,
            })
            state = state.replace(params=restored["params"],
                                  opt_state=restored["opt_state"])
            start_epoch = int(load_meta(resume_from).get("epoch", -1)) + 1
        self._build_steps()

        run_dir = Path(cfg.save_path) / str(cfg.seed)
        run_dir.mkdir(parents=True, exist_ok=True)
        self._metrics_file = run_dir / f"{cfg.name}_metrics.csv"

        # Model summary at fit start (reference vital/system.py:117-132).
        from contouring_uncertainty_tpu.utils.profiling import PhaseTimer, model_summary

        if not cfg.fast_dev_run:
            (run_dir / "summary.txt").write_text(
                model_summary(self.model, self.task.data_params.in_shape)
            )
        timer = PhaseTimer()
        from contouring_uncertainty_tpu.train.logging import ExperimentLogger

        exp_logger = ExperimentLogger(
            run_dir, cfg.name, use_comet=cfg.use_comet,
            use_tensorboard=cfg.use_tensorboard,
        )

        best_val = np.inf
        # Copy: state's buffers are donated into the first train_step, so an
        # alias would be a deleted array if no epoch ever improves val loss.
        best_params = jax.tree.map(jnp.copy, state.params)
        best_epoch = -1
        epochs_since_best = 0
        max_epochs = 1 if cfg.fast_dev_run else cfg.max_epochs
        step = 0

        prefetcher = None
        if cfg.native_loader and not cfg.fast_dev_run:
            try:
                from contouring_uncertainty_tpu.data.native_loader import NativePrefetcher

                prefetcher = NativePrefetcher(train_arrays, cfg.batch_size, seed=cfg.seed)
            except Exception:
                prefetcher = None

        last_ckpt = run_dir / f"{cfg.name}_last.ckpt"
        for epoch in range(start_epoch, max_epochs):
            t0 = time.time()
            train_logs = []
            train_iter = (prefetcher.epoch() if prefetcher is not None
                          else _iterate(train_arrays, cfg.batch_size, np_rng))
            if cfg.overlap_feed and not cfg.fast_dev_run:
                train_iter = _device_prefetch(train_iter, self.mesh)
                already_on_device = True
            else:
                already_on_device = False
            for bi, batch in enumerate(train_iter):
                if cfg.fast_dev_run and bi >= cfg.fast_dev_run:
                    break
                with timer.phase("data"):
                    if not already_on_device:
                        batch = shard_batch(batch, self.mesh)
                with timer.phase("train_step"):
                    state, logs = self._train_step(
                        state, batch, rng, np.uint32(step)
                    )
                train_logs.append(logs)
                step += 1

            val_logs = []
            for bi, batch in enumerate(
                _iterate(val_arrays, cfg.batch_size, np_rng, shuffle=False, drop_last=False)
            ):
                if cfg.fast_dev_run and bi >= cfg.fast_dev_run:
                    break
                val_logs.append(self._eval_step(state, shard_batch(batch, self.mesh)))

            # Failure detection: a whole epoch of non-finite losses means the
            # run has diverged — stop and keep the best checkpoint rather
            # than burning the remaining patience budget (SURVEY §5: the
            # reference had no in-process failure detection).
            epoch_losses = np.array([float(l["loss"]) for l in train_logs])
            if len(epoch_losses) and not np.isfinite(epoch_losses).any():
                print(f"[trainer] aborting: all train losses non-finite at epoch {epoch}")
                self.history.append({"epoch": epoch, "diverged": 1.0})
                break

            row = {"epoch": epoch, "time": time.time() - t0,
                   # Current learning rate (the reference's
                   # LearningRateMonitor callback surface).
                   "lr": float(self._lr_schedule()(step))}
            row.update({f"train/{k}": float(np.mean([float(l[k]) for l in train_logs]))
                        for k in train_logs[0]})
            row.update({f"val/{k}": float(np.mean([float(l[k]) for l in val_logs]))
                        for k in val_logs[0]})
            self.history.append(row)
            self._log_row(row)
            exp_logger.log_metrics(row, step=epoch)

            if cfg.log_figures and hasattr(self.task, "val_figure"):
                try:
                    fig_batch = {
                        k: v[: min(4, len(v))] for k, v in val_arrays.items()
                    }
                    fig = self.task.val_figure(
                        self.model, {"params": state.params}, fig_batch
                    )
                    if fig is not None:
                        exp_logger.log_figure("val_contours", fig, step=epoch)
                        import matplotlib.pyplot as plt

                        plt.close(fig)
                except Exception as exc:  # figures must never kill a fit
                    print(f"[trainer] val figure failed: {exc}")

            val_loss = row["val/loss"]
            if np.isfinite(val_loss) and val_loss < best_val:
                best_val = val_loss
                # Real copy: state is donated into train_step, so aliasing
                # state.params would leave deleted buffers behind.
                best_params = jax.tree.map(jnp.copy, state.params)
                best_epoch = epoch
                epochs_since_best = 0
            else:
                epochs_since_best += 1
            if cfg.save_every and (epoch + 1) % cfg.save_every == 0:
                save_checkpoint(
                    last_ckpt,
                    {"params": jax.tree.map(jnp.copy, state.params),
                     "opt_state": jax.tree.map(
                         lambda x: jnp.copy(x) if hasattr(x, "dtype") else x,
                         state.opt_state)},
                    meta={"task_name": self.task.task_name, "epoch": epoch,
                          "seed": cfg.seed},
                )
            if epochs_since_best > cfg.patience and epoch + 1 >= cfg.min_epochs:
                break

        if prefetcher is not None:
            prefetcher.close()
        exp_logger.close()
        timer.dump(run_dir / f"{cfg.name}_phases.json")
        ckpt_path = run_dir / f"{cfg.name}.ckpt"
        save_checkpoint(
            ckpt_path,
            {"params": best_params},
            meta={
                "task_name": self.task.task_name,
                "best_epoch": best_epoch,
                "best_val_loss": float(best_val),
                "seed": cfg.seed,
            },
        )
        (run_dir / "train_complete").write_text("1")
        return {"params": best_params}, ckpt_path

    def _log_row(self, row: Dict[str, Any]):
        new = not self._metrics_file.exists()
        with open(self._metrics_file, "a", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=list(row))
            if new:
                writer.writeheader()
            writer.writerow(row)


def _device_prefetch(batch_iter, mesh, depth: int = 2):
    """Double-buffered host->device feed: a daemon thread runs shard_batch
    (jax.device_put with the mesh sharding) for upcoming batches while the
    main thread dispatches train steps, so the H2D transfer of batch k+1
    overlaps step k's compute (TrainerConfig.overlap_feed). `depth` bounds
    device-side staging memory to `depth` batches. Worker exceptions are
    re-raised at the consuming site."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    done = object()

    def worker():
        try:
            for b in batch_iter:
                q.put(shard_batch(b, mesh))
        except BaseException as exc:  # surfaced to the training loop
            q.put(exc)
            return
        q.put(done)

    threading.Thread(target=worker, daemon=True).start()
    while True:
        item = q.get()
        if item is done:
            return
        if isinstance(item, BaseException):
            raise item
        yield item


def _iterate(arrays, batch_size, rng, shuffle=True, drop_last=True):
    n = len(arrays[Tags.img])
    order = rng.permutation(n) if shuffle else np.arange(n)
    end = n - (n % batch_size) if drop_last and n >= batch_size else n
    for start in range(0, end, batch_size):
        idx = order[start:start + batch_size]
        yield {
            k: v[idx]
            for k, v in arrays.items()
            if isinstance(v, np.ndarray) and v.dtype != object and v.dtype.kind != "U"
        }
