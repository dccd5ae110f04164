"""CAMUS HDF5 data module (contour + segmentation variants).

Reads the exact HDF5 layout the reference consumes
(vital/vital/data/camus/dataset.py:25-410, dataset_generator.py:32-177):
cross-validation fold patient lists, per-view img_proc/gt_proc stacks and
metadata attrs. Landmark contours are extracted from GT masks once and cached
beside the file (the reference caches a .pt, data/camus/dataset.py:42-47; we
cache a .npz keyed by fold/points/labels).

TPU-first redesign: instead of torch DataLoader worker processes feeding
per-sample tensors, the (small) dataset is loaded into pinned host numpy
arrays once; batching is array slicing and augmentation runs on device
(data/augment.py). Predict mode yields whole views like the reference
(batch = all instants of one patient view).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from contouring_uncertainty_tpu.data.config import DataParams, Label, Tags
from contouring_uncertainty_tpu.data.contour_extraction import get_contour_points


@dataclass
class ViewData:
    id: str
    img: np.ndarray  # (N, 1, H, W) float32
    gt: np.ndarray  # (N, H, W) uint8
    contour: np.ndarray  # (N, K, 2) float32
    voxelspacing: np.ndarray
    instants: Dict[str, int]
    image_quality: str = "Unknown"


def _image_quality(group) -> str:
    """ImageQuality metadata: our generator writes it as a view attr; files
    built by the reference store it as a dataset inside the view group
    (contour_uncertainty/data/camus/dataset.py:93-94) — accept both."""
    if "ImageQuality" in group.attrs:
        v = group.attrs["ImageQuality"]
    elif "ImageQuality" in group:
        v = group["ImageQuality"][()]
    else:
        return "Unknown"
    return v.decode() if isinstance(v, bytes) else str(v)


class CamusContourData:
    """Loads a CAMUS-layout HDF5 into memory with cached landmark contours."""

    def __init__(
        self,
        dataset_path: str | Path,
        fold: int = 5,
        points_per_side: int = 11,
        labels: Sequence[Label] = (Label.BG, Label.LV),
        cache_dir: Optional[Path] = None,
        use_sequence: bool = False,
        transform=None,
    ):
        self.path = Path(dataset_path)
        # Optional static image transform (data/transform group — see
        # data/transforms.py); applied once per view stack at load time.
        self.transform = transform
        self.fold = fold
        self.points_per_side = points_per_side
        self.labels = tuple(labels)
        # Train on every cine frame between ED and ES (vital dataset.py:49,
        # 79-83) instead of only the key instants.
        self.use_sequence = use_sequence
        self._include_myo = Label.MYO in self.labels
        self.nb_points = 2 * points_per_side - 1
        self._cache_dir = Path(cache_dir) if cache_dir else self.path.parent
        self._views: Dict[str, Dict[str, ViewData]] = {}

    # ------------------------------------------------------------------ loading

    def _split_patients(self, split: str) -> List[str]:
        import h5py

        with h5py.File(self.path, "r") as f:
            return [
                p.decode() if isinstance(p, bytes) else str(p)
                for p in f[f"cross_validation/fold_{self.fold}/{split}"]
            ]

    def _cache_path(self, split: str) -> Path:
        key = (f"{self.path.name}-{self.fold}-{split}-{self.points_per_side}-"
               f"{len(self.labels)}-{self._include_myo}")
        digest = hashlib.md5(key.encode()).hexdigest()[:10]
        return self._cache_dir / f"contours_{split}_{digest}.npz"

    def load_split(self, split: str) -> List[ViewData]:
        import h5py

        if split in self._views:
            return list(self._views[split].values())

        patients = self._split_patients(split)
        cache_file = self._cache_path(split)
        cached = dict(np.load(cache_file, allow_pickle=False)) if cache_file.exists() else {}
        new_cache = {}
        views: Dict[str, ViewData] = {}
        with h5py.File(self.path, "r") as f:
            for pid in patients:
                for view in f[pid].keys():
                    g = f[f"{pid}/{view}"]
                    img = np.asarray(g["img_proc"], np.float32)
                    if img.ndim == 4 and img.shape[-1] == 1:
                        # the reference generator stores a trailing channel
                        # axis (dataset_generator.py:170); ours is squeezed
                        img = img[..., 0]
                    if img.max() > 1.5:  # raw grayscale datasets store 0..255
                        img = img / 255.0
                    if self.transform is not None:
                        img = np.asarray(self.transform(img), np.float32)
                    gt = np.asarray(g["gt_proc"], np.uint8)
                    vid = f"{pid}/{view}"
                    ckey = vid.replace("/", "_")
                    if ckey in cached:
                        contour = cached[ckey]
                    else:
                        contour = np.stack([
                            get_contour_points(gt[i], self.nb_points,
                                               include_myo=self._include_myo)
                            for i in range(len(gt))
                        ])
                    new_cache[ckey] = contour
                    instants = {}
                    for ikey in g.attrs.get("instants", []):
                        ikey = ikey.decode() if isinstance(ikey, bytes) else str(ikey)
                        instants[ikey] = int(g.attrs[ikey])
                    views[vid] = ViewData(
                        id=vid,
                        img=img[:, None],
                        gt=gt,
                        contour=contour,
                        voxelspacing=np.asarray(g.attrs.get("voxelspacing", [1.0, 1.0, 1.0])),
                        instants=instants or {"ED": 0, "ES": min(1, len(gt) - 1)},
                        image_quality=_image_quality(g),
                    )
        if new_cache.keys() - cached.keys():
            np.savez_compressed(cache_file, **{**cached, **new_cache})
        self._views[split] = views
        return list(views.values())

    # ----------------------------------------------------------------- batching

    def train_arrays(self, split: str = "train") -> Dict[str, np.ndarray]:
        """Stack every instant of the split into flat arrays (instant-level items,
        like the reference's _get_instant_paths train mode)."""
        views = self.load_split(split)
        imgs, gts, contours, ids = [], [], [], []
        for v in views:
            if self.use_sequence or not v.instants:
                frames = range(v.img.shape[0])
            else:
                # Key instants only (the reference's default training items).
                frames = sorted(set(v.instants.values()))
            for i in frames:
                imgs.append(v.img[i])
                gts.append(v.gt[i])
                contours.append(v.contour[i])
                ids.append(f"{v.id}_{i}")
        return {
            Tags.img: np.stack(imgs),
            Tags.gt: np.stack(gts),
            Tags.contour: np.stack(contours),
            Tags.id: np.array(ids),
        }

    def predict_views(self, split: str = "test") -> Iterator[Dict]:
        """Whole-view prediction items (reference _get_predict_item)."""
        for v in self.load_split(split):
            yield {
                Tags.id: v.id,
                Tags.img: v.img,
                Tags.gt: v.gt,
                Tags.contour: v.contour,
                Tags.voxelspacing: v.voxelspacing,
                Tags.instants: v.instants,
                Tags.image_quality: v.image_quality,
            }

    @property
    def contour_groups(self):
        """(start, end, label) landmark slices for the predict pipeline.

        Order = painting order (later groups overwrite): the epicardium's
        filled polygon CONTAINS the LV cavity, so MYO must be painted first
        and the LV last."""
        k = self.nb_points
        if self._include_myo:
            return ((k, 2 * k, int(Label.MYO)), (0, k, int(Label.LV)))
        return ((0, k, int(Label.LV)),)

    @property
    def data_params(self) -> DataParams:
        views = self.load_split("train")
        h, w = views[0].img.shape[-2:]
        # K comes from the actually-extracted contours: nb_points landmarks
        # for LV-endo, 2*nb_points when MYO/epi extraction is enabled (see
        # data/contour_extraction.py and tests/test_end_to_end.py).
        nb_points = views[0].contour.shape[1]
        return DataParams(in_shape=(1, h, w), out_shape=(nb_points, 2), labels=self.labels)


def iterate_batches(
    arrays: Dict[str, np.ndarray],
    batch_size: int,
    rng: np.random.Generator,
    shuffle: bool = True,
    drop_last: bool = True,
) -> Iterator[Dict[str, np.ndarray]]:
    """Simple epoch iterator over stacked arrays (host-side)."""
    n = len(arrays[Tags.img])
    order = rng.permutation(n) if shuffle else np.arange(n)
    end = n - (n % batch_size) if drop_last else n
    for start in range(0, end, batch_size):
        idx = order[start:start + batch_size]
        yield {k: v[idx] for k, v in arrays.items()}
