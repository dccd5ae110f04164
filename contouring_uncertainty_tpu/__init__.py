"""TPU-native framework for contour-based uncertainty estimation in medical imaging.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
ThierryJudge/contouring-uncertainty (MICCAI 2023 asymmetric contour
uncertainty + TMI contour-sampling uncertainty propagation), designed
TPU-first:

- The compute path (U-Net, DSNT, distributions, PSM sampling,
  rasterization, clinical metrics) is pure JAX, jit/vmap/scan-based, with
  Pallas kernels for the fused hot ops.
- Parallelism is expressed as `jax.sharding` over a device `Mesh`
  (data-parallel over ICI by default), never host loops.
- Everything that the reference ran on host CPU per-sample (sampling,
  rasterization, uncertainty maps, Monte-Carlo clinical metrics) runs
  batched on device here.
"""

__version__ = "0.1.0"
