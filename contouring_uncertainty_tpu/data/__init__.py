"""Data layer: tags/contracts, CAMUS + JSRT HDF5 readers, synthetic fixtures,
on-device augmentations, host->device pipelines."""

from contouring_uncertainty_tpu.data.config import (
    BatchResult,
    DataParams,
    Label,
    Tags,
)
