"""Configurable image transforms (the reference's `data/transform` group).

Capability parity with /root/reference/config/data/transform/{compose,
normalize,normalizesample}.yaml (torchvision.transforms.Compose/Normalize +
vital.data.transforms.NormalizeSample, vital/data/transforms.py): statically
configured normalization applied to the image stack when a datamodule is
built with `data/transform=...`.

TPU note: these run ONCE on the host numpy stacks at load time (they are
per-dataset constants), not per-step on device — the train step's dynamic
augmentation stays in data/augment.py inside the jit.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence

import numpy as np


def normalize(mean: float, std: float) -> Callable[[np.ndarray], np.ndarray]:
    """Fixed-statistics normalization (torchvision.transforms.Normalize)."""
    mean_, std_ = float(mean), float(std)

    def fn(img: np.ndarray) -> np.ndarray:
        return (img - mean_) / std_

    return fn


def normalize_sample(eps: float = 1e-8) -> Callable[[np.ndarray], np.ndarray]:
    """Per-sample z-score (vital.data.transforms.NormalizeSample): each
    leading-axis item is normalized by its own mean/std."""

    def fn(img: np.ndarray) -> np.ndarray:
        img = np.asarray(img, np.float32)
        axes = tuple(range(1, img.ndim))
        mu = img.mean(axis=axes, keepdims=True)
        sd = img.std(axis=axes, keepdims=True)
        return (img - mu) / (sd + eps)

    return fn


def compose(fns: Sequence[Callable]) -> Callable[[np.ndarray], np.ndarray]:
    """Sequential application (torchvision.transforms.Compose)."""

    def fn(img: np.ndarray) -> np.ndarray:
        for f in fns:
            img = f(img)
        return img

    return fn


def build_transform(cfg: Optional[Dict]) -> Optional[Callable]:
    """`data.transform` config node -> callable (or None).

    Accepted shapes (mirroring the reference group options):
      {name: normalize, mean: M, std: S}
      {name: normalizesample}
      {name: compose, transforms: [<node>, ...]}
    """
    if not cfg:
        return None
    name = str(cfg.get("name", "")).lower()
    if name == "normalize":
        if cfg.get("mean") is None or cfg.get("std") is None:
            raise ValueError(
                "data/transform=normalize requires data.transform.mean and "
                "data.transform.std (the reference yaml leaves them '???')"
            )
        return normalize(cfg["mean"], cfg["std"])
    if name in ("normalizesample", "normalize_sample"):
        return normalize_sample()
    if name == "compose":
        subs = [build_transform(sub) for sub in cfg.get("transforms") or []]
        subs = [s for s in subs if s is not None]
        if not subs:
            raise ValueError("data/transform=compose requires data.transform."
                             "transforms, a list of transform nodes")
        return compose(subs)
    raise ValueError(f"Unknown transform '{name}'")
