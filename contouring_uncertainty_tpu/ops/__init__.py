"""Core device ops: DSNT moments, splines, rasterization, uncertainty maps."""

from contouring_uncertainty_tpu.ops.coords import (
    normalized_linspace,
    normalized_to_pixel,
    pixel_to_normalized,
)
from contouring_uncertainty_tpu.ops.dsnt import (
    dsnt_moments,
    flat_softmax,
    heatmaps_to_pixel_gaussians,
)
