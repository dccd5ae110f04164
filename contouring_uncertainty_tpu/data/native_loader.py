"""Python driver for the native async batch prefetcher (native/prefetch_loader.cpp).

Replaces the reference's torch DataLoader worker processes
(vital/vital/data/data_module.py:39-47) with C++ threads assembling shuffled
batches into a reusable ring; falls back to plain numpy batching when the
native library is unavailable.
"""

from __future__ import annotations

import ctypes
from typing import Dict, Iterator, Optional

import numpy as np

from contouring_uncertainty_tpu.data.config import Tags

_LIB = None
_TRIED = False


def _library():
    global _LIB, _TRIED
    if not _TRIED:
        _TRIED = True
        from contouring_uncertainty_tpu.native import build_library

        lib = build_library("prefetch_loader", ["prefetch_loader.cpp"])
        if lib is not None:
            lib.pf_create.restype = ctypes.c_void_p
            lib.pf_create.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_uint64, ctypes.c_int,
            ]
            lib.pf_next.restype = ctypes.c_int
            lib.pf_next.argtypes = [ctypes.c_void_p]
            lib.pf_release.argtypes = [ctypes.c_void_p, ctypes.c_int]
            lib.pf_buffers.argtypes = [
                ctypes.c_void_p, ctypes.c_int,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
                ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
                ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ]
            lib.pf_destroy.argtypes = [ctypes.c_void_p]
        _LIB = lib
    return _LIB


class NativePrefetcher:
    """Streams shuffled batches assembled by C++ threads.

    Holds references to the source arrays (they must stay alive) and yields
    dicts of numpy views copied out of the ring slots.
    """

    def __init__(self, arrays: Dict[str, np.ndarray], batch_size: int,
                 seed: int = 0, n_slots: int = 4):
        lib = _library()
        if lib is None:
            raise RuntimeError("native prefetch library unavailable")
        self._lib = lib
        self.batch_size = batch_size
        # Images pass through in their OWN dtype (the C side treats them as
        # a byte stream): float32 is the parity default; uint8 is the
        # 4x-smaller wire format for 8-bit acquisitions (TrainerConfig
        # feed_uint8 — the train step dequantizes on device).
        img_src = arrays[Tags.img]
        img_dtype = np.uint8 if img_src.dtype == np.uint8 else np.float32
        self.imgs = np.ascontiguousarray(img_src, img_dtype)
        self.gts = (np.ascontiguousarray(arrays[Tags.gt], np.uint8)
                    if Tags.gt in arrays else None)
        self.contours = (np.ascontiguousarray(arrays[Tags.contour], np.float32)
                         if Tags.contour in arrays else None)
        n = len(self.imgs)
        self.n_batches = n // batch_size
        self._img_shape = (batch_size,) + self.imgs.shape[1:]
        self._gt_shape = (batch_size,) + (self.gts.shape[1:] if self.gts is not None else ())
        self._cont_shape = (batch_size,) + (self.contours.shape[1:] if self.contours is not None else ())

        self._handle = lib.pf_create(
            self.imgs.ctypes.data_as(ctypes.c_void_p),
            self.gts.ctypes.data_as(ctypes.c_void_p) if self.gts is not None else None,
            self.contours.ctypes.data_as(ctypes.c_void_p) if self.contours is not None else None,
            n,
            int(np.prod(self.imgs.shape[1:])) * self.imgs.dtype.itemsize,
            int(np.prod(self.gts.shape[1:])) if self.gts is not None else 0,
            int(np.prod(self.contours.shape[1:])) if self.contours is not None else 0,
            batch_size, seed, n_slots,
        )

    def epoch(self) -> Iterator[Dict[str, np.ndarray]]:
        lib = self._lib
        for _ in range(self.n_batches):
            slot = lib.pf_next(self._handle)
            if slot < 0:
                return
            img_p = ctypes.POINTER(ctypes.c_uint8)()
            gt_p = ctypes.POINTER(ctypes.c_uint8)()
            cont_p = ctypes.POINTER(ctypes.c_float)()
            lib.pf_buffers(self._handle, slot, ctypes.byref(img_p),
                           ctypes.byref(gt_p), ctypes.byref(cont_p))
            n_img_bytes = int(np.prod(self._img_shape)) * self.imgs.dtype.itemsize
            img_flat = np.ctypeslib.as_array(img_p, (n_img_bytes,))
            batch = {
                Tags.img: img_flat.view(self.imgs.dtype).reshape(
                    self._img_shape).copy()
            }
            if self.gts is not None:
                batch[Tags.gt] = np.ctypeslib.as_array(gt_p, self._gt_shape).copy()
            if self.contours is not None:
                batch[Tags.contour] = np.ctypeslib.as_array(cont_p, self._cont_shape).copy()
            lib.pf_release(self._handle, slot)
            yield batch

    def close(self):
        if getattr(self, "_handle", None):
            self._lib.pf_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
