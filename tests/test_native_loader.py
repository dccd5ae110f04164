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


def test_native_prefetcher_uint8_images():
    """uint8 image feed (TrainerConfig.feed_uint8): the C side streams images
    as a dtype-agnostic byte stream, so uint8 sources must round-trip exactly
    in their own dtype (4x fewer feed bytes than f32)."""
    from contouring_uncertainty_tpu.data.native_loader import NativePrefetcher

    rng = np.random.default_rng(3)
    arrays = {
        Tags.img: rng.integers(0, 256, size=(20, 1, 16, 16), dtype=np.uint8),
        Tags.contour: rng.normal(size=(20, 5, 2)).astype(np.float32),
    }
    try:
        pf = NativePrefetcher(arrays, batch_size=8, seed=1)
    except RuntimeError:
        import pytest

        pytest.skip("native prefetch library unavailable")
    for batch in pf.epoch():
        assert batch[Tags.img].dtype == np.uint8
        assert batch[Tags.img].shape == (8, 1, 16, 16)
        for j in range(8):
            match = np.where(
                (arrays[Tags.img].reshape(20, -1)
                 == batch[Tags.img][j].ravel()).all(1)
            )[0]
            assert len(match) == 1
            np.testing.assert_array_equal(
                batch[Tags.contour][j], arrays[Tags.contour][match[0]])
    pf.close()


def test_trainer_feed_uint8_fit(tmp_path):
    """Trainer(feed_uint8=True) quantizes the train images once on host and
    dequantizes inside the jitted step: a short fit must run end-to-end and
    produce finite losses."""
    import jax

    from contouring_uncertainty_tpu.data.config import DataParams, Label
    from contouring_uncertainty_tpu.data.synthetic import make_arrays
    from contouring_uncertainty_tpu.tasks import DSNTAleatoric
    from contouring_uncertainty_tpu.train.trainer import Trainer, TrainerConfig

    imgs, gts, contours = make_arrays(12, 21, 32, seed=2)
    arrays = {Tags.img: imgs, Tags.gt: gts, Tags.contour: contours}
    task = DSNTAleatoric(
        data_params=DataParams(in_shape=(1, 32, 32), out_shape=(21, 2),
                               labels=(Label.BG, Label.LV)),
        model_kwargs=dict(kernels=((3, 3),) * 3,
                          strides=((1, 1),) + ((2, 2),) * 2),
    )
    cfg = TrainerConfig(batch_size=4, max_epochs=1, fast_dev_run=2,
                        save_path=str(tmp_path), feed_uint8=True)
    trainer = Trainer(task, cfg)
    _, ckpt = trainer.fit(arrays, arrays)
    assert ckpt.exists()
    assert np.isfinite(trainer.history[0]["train/loss"])
