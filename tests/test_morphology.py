"""On-device morphology vs scipy oracle (the reference used
scipy.ndimage.binary_fill_holes + a host largest-blob loop)."""

import numpy as np
import jax.numpy as jnp
from scipy import ndimage

from contouring_uncertainty_tpu.ops.morphology import (
    fill_holes,
    largest_blob,
    postprocess_batch,
)


def _random_blobs(seed=0, size=64, n_blobs=3):
    rng = np.random.default_rng(seed)
    mask = np.zeros((size, size), np.float32)
    for _ in range(n_blobs):
        cy, cx = rng.integers(10, size - 10, 2)
        r = rng.integers(3, 10)
        yy, xx = np.mgrid[0:size, 0:size]
        mask[(yy - cy) ** 2 + (xx - cx) ** 2 < r * r] = 1
    return mask


def test_fill_holes_matches_scipy():
    mask = np.zeros((32, 32), np.float32)
    mask[5:25, 5:25] = 1
    mask[10:20, 10:20] = 0  # hole
    mask[12:14, 30:32] = 1  # blob touching border
    got = np.asarray(fill_holes(jnp.asarray(mask)))
    ref = ndimage.binary_fill_holes(mask).astype(np.float32)
    np.testing.assert_array_equal(got, ref)


def test_fill_holes_random():
    for seed in range(3):
        mask = _random_blobs(seed)
        # punch holes
        mask[20:24, 20:24] *= 0
        got = np.asarray(fill_holes(jnp.asarray(mask)))
        ref = ndimage.binary_fill_holes(mask).astype(np.float32)
        np.testing.assert_array_equal(got, ref)


def test_largest_blob_matches_scipy():
    for seed in range(3):
        mask = _random_blobs(seed)
        got = np.asarray(largest_blob(jnp.asarray(mask)))
        labels, n = ndimage.label(mask)
        if n == 0:
            assert got.sum() == 0
            continue
        sizes = ndimage.sum(mask, labels, range(1, n + 1))
        ref = (labels == (1 + np.argmax(sizes))).astype(np.float32)
        # Note: ndimage.label uses 4-connectivity by default — same as ours.
        assert got.sum() == ref.sum(), f"seed {seed}: {got.sum()} vs {ref.sum()}"


def test_postprocess_batch_shapes():
    masks = np.stack([_random_blobs(s) for s in range(4)]).reshape(2, 2, 64, 64)
    out = np.asarray(postprocess_batch(jnp.asarray(masks)))
    assert out.shape == masks.shape
    assert ((out == 0) | (out == 1)).all()
