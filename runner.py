#!/usr/bin/env python
"""CLI entry: `python runner.py data=camus-cont task=dsnt-al [overrides...]`.

Same public surface as the reference's Hydra runner (reference runner.py:29-57).
"""

from contouring_uncertainty_tpu.runner import main

if __name__ == "__main__":
    main()
