"""JSRT lung dataset reader + synthetic generator."""

import numpy as np

from contouring_uncertainty_tpu.data.config import Tags
from contouring_uncertainty_tpu.data.lung import (
    JSRTContourData,
    N_POINTS,
    lung_contour_to_mask,
    split_structures,
    write_jsrt_hdf5,
)


def test_jsrt_synthetic_roundtrip(tmp_path):
    h5 = write_jsrt_hdf5(tmp_path / "jsrt.h5", n_items=8, size=128, seed=2)
    data = JSRTContourData(h5)
    train = data.train_arrays("train")
    assert train[Tags.img].shape[1:] == (1, 128, 128)
    assert train[Tags.contour].shape[1:] == (N_POINTS, 2)
    assert set(np.unique(train[Tags.gt])) <= {0, 1, 2, 3}
    # All three structures present in masks.
    assert {1, 2, 3} <= set(np.unique(train[Tags.gt]))
    assert data.data_params.out_shape == (N_POINTS, 2)

    views = list(data.predict_views("test"))
    assert len(views) >= 1
    assert views[0][Tags.img].shape[0] == 1


def test_structure_split_and_mask():
    rng = np.random.default_rng(0)
    contour = rng.uniform(20, 100, size=(N_POINTS, 2)).astype(np.float32)
    parts = split_structures(contour)
    assert parts["rlung"].shape == (44, 2)
    assert parts["llung"].shape == (50, 2)
    assert parts["heart"].shape == (26, 2)
    mask = lung_contour_to_mask(contour, (128, 128))
    assert mask.shape == (128, 128)
