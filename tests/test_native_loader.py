"""Native C++ prefetcher: builds, streams shuffled epochs, matches content."""

import numpy as np
import pytest

from contouring_uncertainty_tpu.data.config import Tags


def _arrays(n=20, size=16, k=5, seed=0):
    rng = np.random.default_rng(seed)
    return {
        Tags.img: rng.normal(size=(n, 1, size, size)).astype(np.float32),
        Tags.gt: rng.integers(0, 3, size=(n, size, size)).astype(np.uint8),
        Tags.contour: rng.normal(size=(n, k, 2)).astype(np.float32),
    }


def test_native_prefetcher_streams_correct_batches():
    from contouring_uncertainty_tpu.data.native_loader import NativePrefetcher, _library

    if _library() is None:
        pytest.skip("no native toolchain")
    arrays = _arrays()
    pf = NativePrefetcher(arrays, batch_size=8, seed=3)
    assert pf.n_batches == 2
    seen = []
    for batch in pf.epoch():
        assert batch[Tags.img].shape == (8, 1, 16, 16)
        assert batch[Tags.gt].shape == (8, 16, 16)
        assert batch[Tags.contour].shape == (8, 5, 2)
        # Every batch sample must be an exact row of the source (gather check).
        for j in range(8):
            match = np.where(
                (arrays[Tags.img].reshape(20, -1) == batch[Tags.img][j].ravel()).all(1)
            )[0]
            assert len(match) == 1
            src = match[0]
            np.testing.assert_array_equal(batch[Tags.gt][j], arrays[Tags.gt][src])
            np.testing.assert_array_equal(batch[Tags.contour][j], arrays[Tags.contour][src])
            seen.append(src)
    # Shuffled without replacement within the epoch.
    assert len(set(seen)) == 16
    # Second epoch has a different order.
    seen2 = []
    for batch in pf.epoch():
        for j in range(8):
            match = np.where(
                (arrays[Tags.img].reshape(20, -1) == batch[Tags.img][j].ravel()).all(1)
            )[0]
            seen2.append(match[0])
    assert seen != seen2
    pf.close()
