"""Contour samplers: naive per-point, PSM (posterior shape model), skew and
sequence variants — all batched on device."""

from contouring_uncertainty_tpu.sampler.naive import NaiveSampler
from contouring_uncertainty_tpu.sampler.psm import PosteriorShapeModelSampler
from contouring_uncertainty_tpu.sampler.prior import ShapePrior, fit_shape_prior
