"""Offline tools: PSM prior generation (reproduces the reference's shipped
camus-cont_psm_11_no_std.npy / sequence variant artifacts — psm.py:453-554
and sequence_sampler.py:167-241 __main__ blocks) and raw-data HDF5
generators (vital dataset_generator.py, lung jsrt_generator.py).

Usage:
    python -m contouring_uncertainty_tpu.tools generate-psm data=camus-cont \
        out=priors/camus-cont_psm_11.npz seq_out=priors/camus-cont_sequence_psm_11.npz
    python -m contouring_uncertainty_tpu.tools generate-camus <raw_camus_dir> \
        out=camus.h5 [folds=1,2,...] [sequence=true] [img_format=mhd]
    python -m contouring_uncertainty_tpu.tools generate-jsrt <hybridnet_jsrt_dir> \
        out=jsrt_contour.h5
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


def generate_camus_cli(args: List[str]):
    from contouring_uncertainty_tpu.data.generators import generate_camus

    data_dir, kw = None, {}
    for a in args:
        if "=" not in a:
            data_dir = a
        else:
            k, v = a.split("=", 1)
            if k == "out":
                kw["output"] = v
            elif k == "folds":
                kw["folds"] = [int(x) for x in v.split(",")]
            elif k == "sequence":
                kw["sequence"] = v.lower() in ("1", "true", "yes")
            elif k == "img_format":
                kw["img_format"] = v
            elif k == "labels":
                kw["labels_to_keep"] = [int(x) for x in v.split(",")]
            else:
                raise SystemExit(f"unknown option {a}")
    if data_dir is None:
        raise SystemExit("generate-camus needs the raw CAMUS directory")
    kw.setdefault("output", "camus.h5")
    generate_camus(data_dir, **kw)
    print(f"wrote {kw['output']}")


def generate_jsrt_cli(args: List[str]):
    from contouring_uncertainty_tpu.data.generators import generate_jsrt

    data_dir, out = None, "jsrt_contour.h5"
    for a in args:
        if a.startswith("out="):
            out = a.split("=", 1)[1]
        else:
            data_dir = a
    if data_dir is None:
        raise SystemExit("generate-jsrt needs the hybridnet-jsrt directory")
    generate_jsrt(data_dir, out)
    print(f"wrote {out}")


def main():
    cmds = {
        "generate-psm": generate_psm,
        "generate-camus": generate_camus_cli,
        "generate-jsrt": generate_jsrt_cli,
    }
    if len(sys.argv) < 2 or sys.argv[1] not in cmds:
        print(__doc__)
        sys.exit(1)
    cmds[sys.argv[1]](sys.argv[2:])


if __name__ == "__main__":
    main()
