"""Synthetic echo-like dataset generator (test fixtures + benchmarks).

Generates LV-like half-ellipse contours with matching speckle-textured
ultrasound-style images and multi-label masks, and can write them into an
HDF5 file with the exact CAMUS layout the reference consumes
(vital/data/camus/dataset_generator.py:32-177):

    /cross_validation/fold_{f}/{train,val,test}   -> patient id lists
    /{patient}/{view}/img_proc  (N, H, W) float32
    /{patient}/{view}/gt_proc   (N, H, W) uint8
    view attrs: voxelspacing, instants=['ED','ES'], ED, ES, ImageQuality

The reference had no synthetic fixtures at all (tests ran on the real 2GB
CAMUS file); this generator is what makes the test pyramid hermetic.
"""

from __future__ import annotations

from pathlib import Path
from typing import Tuple

import numpy as np

from contouring_uncertainty_tpu.data.config import Label


def lv_contour_points(
    rng: np.random.Generator, k: int = 21, size: int = 256
) -> np.ndarray:
    """Random anatomically-plausible LV endocardium contour, (K, 2) in (x, y).

    Points run base1 -> apex -> base2 (the reference's landmark ordering from
    extract_points.py: base, side wall, apex, other wall, base).
    """
    s = size / 256.0
    cx = size / 2 + rng.uniform(-15, 15) * s
    base_y = size * 0.75 + rng.uniform(-15, 15) * s
    apex_y = size * 0.2 + rng.uniform(-10, 15) * s
    half_w = size * 0.18 + rng.uniform(-8, 12) * s
    tilt = rng.uniform(-0.15, 0.15)

    # Angles from 0 (base right) through pi (base left) over the half-ellipse.
    t = np.linspace(0.0, np.pi, k)
    x = cx + half_w * np.cos(t)
    height = base_y - apex_y
    y = base_y - height * np.sin(t) ** 0.9
    # Mild wall irregularity.
    wobble = rng.normal(scale=1.5 * s, size=k)
    x = x + wobble * np.sin(t)
    # Tilt around the base center.
    xr = cx + (x - cx) * np.cos(tilt) - (y - base_y) * np.sin(tilt)
    yr = base_y + (x - cx) * np.sin(tilt) + (y - base_y) * np.cos(tilt)
    pts = np.stack([xr, yr], axis=-1)
    # Reverse so the contour runs left-base -> apex -> right-base like CAMUS.
    return pts[::-1].astype(np.float32)


def _fill_poly(points: np.ndarray, size: int) -> np.ndarray:
    from matplotlib.path import Path as MplPath

    yy, xx = np.mgrid[0:size, 0:size]
    inside = MplPath(points).contains_points(np.stack([xx.ravel(), yy.ravel()], -1))
    return inside.reshape(size, size)


def make_sample(
    rng: np.random.Generator, k: int = 21, size: int = 256
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Returns (img (H, W) f32 in [0,1], gt (H, W) uint8 labels, contour (K, 2))."""
    contour = lv_contour_points(rng, k, size)
    lv = _fill_poly(contour, size)

    # Myocardium: dilated LV ring (coarse outward offset of the contour),
    # clipped above the base line so the LV base borders "atrium" (background)
    # like in CAMUS — endo_base detection relies on that frontier.
    center = contour.mean(axis=0)
    ring_pts = center + (contour - center) * 1.25
    myo = _fill_poly(ring_pts, size) & ~lv
    base_y = min(contour[0, 1], contour[-1, 1])
    yy_grid = np.arange(size)[:, None]
    myo &= yy_grid <= base_y

    gt = np.zeros((size, size), np.uint8)
    gt[myo] = int(Label.MYO)
    gt[lv] = int(Label.LV)

    speckle = rng.gamma(2.0, 0.25, size=(size, size))
    img = 0.45 * speckle
    img = np.where(lv, img * 0.35, img)  # anechoic cavity
    img = np.where(myo, img * 1.6, img)  # bright myocardium
    # Smooth a little to fake PSF.
    kernel = np.ones((3, 3)) / 9.0
    from scipy.signal import convolve2d

    img = convolve2d(img, kernel, mode="same", boundary="symm")
    return np.clip(img, 0, 1).astype(np.float32), gt, contour


def make_arrays(n: int, k: int = 21, size: int = 256, seed: int = 0):
    """In-memory dataset: img (N,1,H,W), gt (N,H,W), contour (N,K,2)."""
    rng = np.random.default_rng(seed)
    imgs, gts, contours = [], [], []
    for _ in range(n):
        img, gt, c = make_sample(rng, k, size)
        imgs.append(img[None])
        gts.append(gt)
        contours.append(c)
    return np.stack(imgs), np.stack(gts), np.stack(contours)


def write_camus_hdf5(
    path: Path,
    n_patients: int = 8,
    k: int = 21,
    size: int = 256,
    seed: int = 0,
    fold: int = 5,
) -> Path:
    """Write a synthetic dataset in the CAMUS HDF5 layout."""
    import h5py

    rng = np.random.default_rng(seed)
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    patients = [f"patient{i:04d}" for i in range(1, n_patients + 1)]
    n_train = max(1, int(n_patients * 0.6))
    n_val = max(1, int(n_patients * 0.2))
    splits = {
        "train": patients[:n_train],
        "val": patients[n_train:n_train + n_val],
        "test": patients[n_train + n_val:] or patients[-1:],
    }
    with h5py.File(path, "w") as f:
        f.attrs["register"] = False
        f.attrs["sequence"] = False
        cv = f.create_group(f"cross_validation/fold_{fold}")
        for split, ids in splits.items():
            cv.create_dataset(split, data=np.array(ids, dtype="S"))
        for pid in patients:
            for view in ("2CH", "4CH"):
                imgs, gts = [], []
                for _ in range(2):  # ED, ES
                    img, gt, _ = make_sample(rng, k, size)
                    imgs.append(img)
                    gts.append(gt)
                g = f.create_group(f"{pid}/{view}")
                g.create_dataset("img_proc", data=np.stack(imgs))
                g.create_dataset("gt_proc", data=np.stack(gts))
                g.attrs["voxelspacing"] = np.array([1.0, 0.62, 0.42])
                g.attrs["instants"] = np.array(["ED", "ES"], dtype="S")
                g.attrs["ED"] = 0
                g.attrs["ES"] = 1
                g.attrs["ImageQuality"] = "Good"
    return path
