"""Offline tools: PSM prior generation (reproduces the reference's shipped
camus-cont_psm_11_no_std.npy / sequence variant artifacts — psm.py:453-554
and sequence_sampler.py:167-241 __main__ blocks).

Usage:
    python -m contouring_uncertainty_tpu.tools generate-psm data=camus-cont \
        out=priors/camus-cont_psm_11.npz seq_out=priors/camus-cont_sequence_psm_11.npz
"""

from __future__ import annotations

import sys
from pathlib import Path
from typing import List, Optional

import numpy as np

from contouring_uncertainty_tpu.config import compose
from contouring_uncertainty_tpu.data.config import Tags
from contouring_uncertainty_tpu.factory import build_data
from contouring_uncertainty_tpu.sampler.prior import fit_shape_prior, save_prior


def generate_psm(overrides: Optional[List[str]] = None):
    overrides = list(overrides or [])
    out = "priors/psm.npz"
    seq_out = None
    rest = []
    for ov in overrides:
        if ov.startswith("out="):
            out = ov.split("=", 1)[1]
        elif ov.startswith("seq_out="):
            seq_out = ov.split("=", 1)[1]
        else:
            rest.append(ov)
    cfg = compose(rest)
    data = build_data(cfg)

    train = data.train_arrays("train")
    contours = np.asarray(train[Tags.contour])
    prior = fit_shape_prior(contours)
    Path(out).parent.mkdir(parents=True, exist_ok=True)
    save_prior(Path(out), prior)
    print(f"single-instant prior ({contours.shape[1] * 2}-dim, "
          f"{len(contours)} shapes) -> {out}")

    if seq_out:
        # Pair ED+ES contours per view into 2K-point shapes.
        pairs = []
        for view in data.predict_views("train"):
            inst = view[Tags.instants]
            if "ED" in inst and "ES" in inst:
                c = view[Tags.contour]
                pairs.append(np.concatenate([c[inst["ED"]], c[inst["ES"]]]))
        if pairs:
            seq_prior = fit_shape_prior(np.stack(pairs))
            save_prior(Path(seq_out), seq_prior)
            print(f"sequence prior ({pairs[0].shape[0] * 2}-dim, "
                  f"{len(pairs)} views) -> {seq_out}")


def main():
    if len(sys.argv) < 2 or sys.argv[1] not in {"generate-psm"}:
        print(__doc__)
        sys.exit(1)
    if sys.argv[1] == "generate-psm":
        generate_psm(sys.argv[2:])


if __name__ == "__main__":
    main()
