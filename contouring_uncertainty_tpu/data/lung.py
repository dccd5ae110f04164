"""JSRT chest X-ray landmark dataset (lungs + heart).

Capability parity with contour_uncertainty/data/lung/ (dataset.py:24-141,
config.py:33-39, utils.py): flat HDF5 layout

    /{train,val,test}/{id}/{img (H, W), gt (H, W), contour (120, 2)}

with 120 landmarks = right lung 44 + left lung 50 + heart 26, multi-structure
contour->mask rasterization, and a synthetic generator for hermetic tests
(the reference built the HDF5 from HybridGNet landmark txt files,
jsrt_generator.py:27-48).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Iterator, List, Sequence, Tuple

import numpy as np

from contouring_uncertainty_tpu.data.config import DataParams, LungLabel, Tags

# Landmark counts per structure (reference data/lung/config.py:33-39).
# Label semantics follow the reference exactly (config.py:9-19 + utils.py
# LungContourToMask:44-70): BOTH lungs share LungLabel.LUNG (1), the heart
# is LungLabel.HEART (2), and where lung and heart polygons overlap the
# LUNG label wins (the reference argmaxes channel order [BG, LUNG, HEART],
# and np.argmax takes the first max).
RLUNG, LLUNG, HEART = 44, 50, 26
STRUCTURES = (("rlung", 0, RLUNG, int(LungLabel.LUNG)),
              ("llung", RLUNG, RLUNG + LLUNG, int(LungLabel.LUNG)),
              ("heart", RLUNG + LLUNG, RLUNG + LLUNG + HEART, int(LungLabel.HEART)))
N_POINTS = RLUNG + LLUNG + HEART


def split_structures(contour: np.ndarray) -> Dict[str, np.ndarray]:
    return {name: contour[a:b] for name, a, b, _ in STRUCTURES}


def lung_contour_to_mask(contour: np.ndarray, shape: Tuple[int, int]) -> np.ndarray:
    """Rasterize the three structures into a label map (host/numpy variant).

    Device paths use ops/rasterize per structure; this mirrors the reference
    LungContourToMask for data generation and tests. The heart is drawn
    FIRST so the lungs overwrite it in overlaps (reference precedence; see
    STRUCTURES note).
    """
    from matplotlib.path import Path as MplPath

    h, w = shape
    yy, xx = np.mgrid[0:h, 0:w]
    pts = np.stack([xx.ravel(), yy.ravel()], -1)
    out = np.zeros(shape, np.uint8)
    for name, a, b, label in sorted(STRUCTURES, key=lambda s: -s[3]):
        inside = MplPath(contour[a:b]).contains_points(pts).reshape(shape)
        out[inside] = label
    return out


class JSRTContourData:
    """In-memory JSRT reader with the same API as CamusContourData."""

    def __init__(self, dataset_path: str | Path,
                 labels: Sequence[LungLabel] = (LungLabel.BG, LungLabel.LUNG,
                                                LungLabel.HEART),
                 transform=None):
        self.path = Path(dataset_path)
        self.labels = tuple(labels)
        # Optional static image transform (data/transform group).
        self.transform = transform
        self._cache: Dict[str, Dict[str, np.ndarray]] = {}

    def _load(self, split: str):
        import h5py

        if split in self._cache:
            return self._cache[split]
        imgs, gts, contours, ids = [], [], [], []
        with h5py.File(self.path, "r") as f:
            for item_id in f[split]:
                g = f[f"{split}/{item_id}"]
                img = np.asarray(g["img"], np.float32)
                if img.max() > 1.5:
                    img = img / 255.0
                if self.transform is not None:
                    img = np.asarray(self.transform(img), np.float32)
                imgs.append(img[None])
                gts.append(np.asarray(g["gt"], np.uint8))
                contours.append(np.asarray(g["contour"], np.float32))
                ids.append(item_id)
        self._cache[split] = {
            Tags.img: np.stack(imgs),
            Tags.gt: np.stack(gts),
            Tags.contour: np.stack(contours),
            Tags.id: np.array(ids),
        }
        return self._cache[split]

    def train_arrays(self, split: str = "train") -> Dict[str, np.ndarray]:
        return self._load(split)

    def predict_views(self, split: str = "test") -> Iterator[Dict]:
        data = self._load(split)
        for i in range(len(data[Tags.img])):
            yield {
                Tags.id: str(data[Tags.id][i]),
                Tags.img: data[Tags.img][i:i + 1],
                Tags.gt: data[Tags.gt][i:i + 1],
                Tags.contour: data[Tags.contour][i:i + 1],
                Tags.voxelspacing: np.array([1.0, 1.0, 1.0]),
                Tags.instants: {"ED": 0},
            }

    @property
    def contour_groups(self):
        """(start, end, label) landmark slices per structure for the predict
        pipeline (rlung/llung/heart, landmark order). Overlap precedence
        (lungs beat heart — reference LungContourToMask argmax order) is the
        rasterizer's job: it paints in descending label order."""
        return tuple((a, b, label) for _, a, b, label in STRUCTURES)

    @property
    def data_params(self) -> DataParams:
        data = self._load("train")
        h, w = data[Tags.img].shape[-2:]
        return DataParams(in_shape=(1, h, w), out_shape=(N_POINTS, 2), labels=self.labels)


def _structure_contour(rng, cx, cy, rx, ry, n, squish=0.0):
    t = np.linspace(0, 2 * np.pi, n, endpoint=False)
    x = cx + rx * np.cos(t) * (1 + squish * np.sin(2 * t))
    y = cy + ry * np.sin(t)
    x += rng.normal(scale=0.5, size=n)
    y += rng.normal(scale=0.5, size=n)
    return np.stack([x, y], -1)


def write_jsrt_hdf5(path: Path, n_items: int = 12, size: int = 256, seed: int = 0) -> Path:
    """Synthetic JSRT-layout HDF5 (lungs as tall ellipses, heart between)."""
    import h5py

    rng = np.random.default_rng(seed)
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    splits = {"train": int(n_items * 0.6) or 1, "val": int(n_items * 0.2) or 1,
              "test": n_items - (int(n_items * 0.6) or 1) - (int(n_items * 0.2) or 1) or 1}
    with h5py.File(path, "w") as f:
        idx = 0
        for split, count in splits.items():
            for _ in range(count):
                s = size / 256.0
                rl = _structure_contour(rng, size * 0.32 + rng.uniform(-5, 5) * s,
                                        size * 0.45, size * 0.14, size * 0.3, RLUNG)
                ll = _structure_contour(rng, size * 0.68 + rng.uniform(-5, 5) * s,
                                        size * 0.45, size * 0.14, size * 0.3, LLUNG)
                he = _structure_contour(rng, size * 0.52, size * 0.62,
                                        size * 0.12, size * 0.14, HEART)
                contour = np.concatenate([rl, ll, he]).astype(np.float32)
                gt = lung_contour_to_mask(contour, (size, size))
                img = rng.gamma(2.0, 0.2, (size, size)).astype(np.float32)
                img = np.where(gt > 0, img * 0.5, img)
                g = f.create_group(f"{split}/case{idx:04d}")
                g.create_dataset("img", data=np.clip(img, 0, 1))
                g.create_dataset("gt", data=gt)
                g.create_dataset("contour", data=contour)
                idx += 1
    return path
