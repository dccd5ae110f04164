"""Minimal Hydra-style YAML config composition.

The reference's public API surface is its Hydra CLI
(`python runner.py data=camus-cont task=dsnt-al task.model.drop_block=True`,
runner.py:29-31 + config/ groups). Hydra is not available in this
environment, so this package reimplements the subset that defines that
surface: config groups selected by `group=option`, dotted overrides, env-var
resolvers, and deep merging — over plain dicts instead of live objects.
"""

from contouring_uncertainty_tpu.config.compose import compose, deep_merge
