"""Pure-epistemic contour task: statistics over T_e stochastic forwards.

Capability parity with reference EpistemicUncertaintyTask
(task/regression/epistemic.py:13-71): no per-point aleatoric head — the
point distribution comes entirely from the spread of T_e MC-dropout (or
ensemble) DSNT predictions.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from contouring_uncertainty_tpu.tasks.dsnt_al import DSNTAleatoric


@dataclass
class EpistemicUncertainty(DSNTAleatoric):
    task_name: str = "epistemic"

    def predict_point_stats(self, model, variables, img, rng=None):
        """-> (mu (N, K, 2), cov (N, K, 2, 2)) from the T_e forward spread."""
        mu_te, _ = self.predict(model, variables, img, rng=rng)  # (N, T_e, K, 2)
        mu = mu_te.mean(axis=1)
        d = mu_te - mu[:, None]
        cov = jnp.mean(d[..., :, None] * d[..., None, :], axis=1)
        return mu, cov
