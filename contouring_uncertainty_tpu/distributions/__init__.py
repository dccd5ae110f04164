"""Bivariate (skew-)normal distributions as pure, batched JAX functions.

Capability parity with the reference's classmethod API
(contour_uncertainty/distributions/bivariatedistribution.py:5-91), redesigned
as stateless functions that broadcast over arbitrary leading batch axes and
jit/vmap cleanly. 2x2 linear algebra is closed-form (adjugate inverses,
trig-free eigendecompositions) rather than generic torch.linalg calls.
"""

from contouring_uncertainty_tpu.distributions import normal as bvn
from contouring_uncertainty_tpu.distributions import skew_normal as bsn
from contouring_uncertainty_tpu.distributions.linalg import (
    cov2corr,
    rotate_alpha,
    rotate_cov,
    sym_matrix_pow,
)
