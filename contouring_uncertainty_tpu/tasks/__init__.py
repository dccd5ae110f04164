"""Tasks: the method layer (DSNT-AL, DSNT-skew, segmentation-uncertainty baselines).

Capability parity with contour_uncertainty/task/ — but instead of
LightningModules with implicit trainer state, each task is a small config
object exposing pure functions (`loss`, `val_metrics`, `predict_*`) over an
explicit (model, variables, batch, rng), which the trainer jits/pjits.
"""

from contouring_uncertainty_tpu.tasks.dsnt_al import DSNTAleatoric
