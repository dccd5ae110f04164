"""Training runtime: explicit TrainState, jitted/pjitted steps, early stopping,
orbax checkpointing — the TPU-native replacement for the Lightning Trainer."""

from contouring_uncertainty_tpu.train.trainer import Trainer, TrainerConfig
