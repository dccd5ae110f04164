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

    def build_model(self):
        # A pure-epistemic task is meaningless without stochastic forwards:
        # force MC dropout on when t_e > 1 (the reference patches dropout ON
        # for every task whenever t_e > 1, uncertainty.py:75 — but without
        # dropout modules the model has nothing to patch, so the flag itself
        # must be forced here, per backbone).
        if self.t_e > 1:
            if self.model_name in ("unet2", "unet"):
                self.model_kwargs["drop_block"] = True
            elif self.model_name in ("enet", "deeplabv3", "resnet"):
                if not self.model_kwargs.get("dropout"):
                    print("[epistemic] forcing model dropout=0.1 (t_e > 1 "
                          "requires stochastic forwards)")
                    self.model_kwargs["dropout"] = 0.1
        return super().build_model()

    def predict(self, model, variables, img, rng=None, mesh=None):
        """Pure-epistemic stats: zero the aleatoric-head covariances so the
        predictor's fusion (mean cov + spread) reduces to the spread of the
        T_e forwards only (reference epistemic.py:33-34)."""
        mu_te, cov_te = super().predict(model, variables, img, rng=rng, mesh=mesh)
        return mu_te, jnp.zeros_like(cov_te)

    def predict_point_stats(self, model, variables, img, rng=None):
        """-> (mu (N, K, 2), cov (N, K, 2, 2)) from the T_e forward spread."""
        mu_te, _ = self.predict(model, variables, img, rng=rng)  # (N, T_e, K, 2)
        mu = mu_te.mean(axis=1)
        d = mu_te - mu[:, None]
        cov = jnp.mean(d[..., :, None] * d[..., None, :], axis=1)
        return mu, cov
