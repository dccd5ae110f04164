"""Invertible, jittable on-device augmentations over {image, mask, keypoints}.

Capability parity with the reference augmentation stack
(contour_uncertainty/augmentations/: RandomRotation(3), RandomTranslation(5,5),
RandomBrightnessContrast(0.2,0.2), RandomGamma((0.8,1.2)) with the
apply/un_apply protocol used both for train-time DA and TTA,
augmentations/augmentation.py:49-120).

TPU-first redesign: instead of per-sample host torchvision calls, a single
`apply(key, batch)` samples per-item parameters and warps the whole batch on
device (bilinear for images, nearest for masks), vmapped. `un_apply` inverts
the geometric part on logits/keypoints for TTA (tta.py:34-40).

Convention: img (N, C, H, W) float; mask (N, H, W); keypoints (N, K, 2) in
(x, y) pixels. Rotation is about the image center with the same screen-space
angle convention as the reference (y axis down: keypoints rotate with R(-a)
while the image grid rotates with R(a)).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class AugmentParams(NamedTuple):
    angle_deg: jnp.ndarray  # (N,)
    shift: jnp.ndarray  # (N, 2) (dx, dy)
    brightness: jnp.ndarray  # (N,)
    contrast: jnp.ndarray  # (N,)
    gamma: jnp.ndarray  # (N,)


class AugmentConfig(NamedTuple):
    degrees: float = 3.0
    translate: Tuple[float, float] = (5.0, 5.0)
    brightness: float = 0.2
    contrast: float = 0.2
    gamma: Tuple[float, float] = (0.8, 1.2)


def sample_params(key: jax.Array, n: int, cfg: AugmentConfig = AugmentConfig()) -> AugmentParams:
    ks = jax.random.split(key, 5)
    angle = jax.random.uniform(ks[0], (n,), minval=-cfg.degrees, maxval=cfg.degrees)
    shift = jnp.stack(
        [
            jax.random.uniform(ks[1], (n,), minval=-cfg.translate[0], maxval=cfg.translate[0]),
            jax.random.uniform(ks[2], (n,), minval=-cfg.translate[1], maxval=cfg.translate[1]),
        ],
        axis=-1,
    )
    brightness = jax.random.uniform(ks[3], (n,), minval=-cfg.brightness, maxval=cfg.brightness)
    k5, k6 = jax.random.split(ks[4])
    contrast = jax.random.uniform(k5, (n,), minval=-cfg.contrast, maxval=cfg.contrast)
    gamma = jax.random.uniform(k6, (n,), minval=cfg.gamma[0], maxval=cfg.gamma[1])
    return AugmentParams(angle, shift, brightness, contrast, gamma)


def identity_params(n: int) -> AugmentParams:
    z = jnp.zeros((n,))
    return AugmentParams(z, jnp.zeros((n, 2)), z, z, jnp.ones((n,)))


def _warp_image(img: jnp.ndarray, angle_deg, shift, order: int) -> jnp.ndarray:
    """Rotate-about-center + translate one (C, H, W) image via inverse mapping."""
    c, h, w = img.shape
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    th = jnp.deg2rad(angle_deg)
    cos, sin = jnp.cos(th), jnp.sin(th)
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=img.dtype), jnp.arange(w, dtype=img.dtype), indexing="ij")
    # Inverse map: output pixel -> source pixel (undo translation, then rotation).
    xs = xx - shift[0] - cx
    ys = yy - shift[1] - cy
    src_x = cos * xs - sin * ys + cx
    src_y = sin * xs + cos * ys + cy
    coords = jnp.stack([src_y, src_x])

    def sample_channel(ch):
        return jax.scipy.ndimage.map_coordinates(ch, list(coords), order=order, mode="constant", cval=0.0)

    return jax.vmap(sample_channel)(img)


def _rotate_keypoints(kp: jnp.ndarray, angle_deg, center) -> jnp.ndarray:
    """Screen-space keypoint rotation (reference affine.py:42-58: R(-a))."""
    th = jnp.deg2rad(angle_deg)
    cos, sin = jnp.cos(th), jnp.sin(th)
    ax = kp[..., 0] - center[0]
    ay = kp[..., 1] - center[1]
    qx = center[0] + cos * ax + sin * ay
    qy = center[1] - sin * ax + cos * ay
    return jnp.stack([qx, qy], axis=-1)


@jax.jit
def apply(batch: Dict[str, jnp.ndarray], params: AugmentParams) -> Dict[str, jnp.ndarray]:
    """Apply geometric + intensity augmentations to a batch dict.

    Keys handled: 'img' (N,C,H,W), 'gt' (N,H,W) mask, 'contour' (N,K,2).
    Other keys pass through untouched.
    """
    out = dict(batch)
    img = batch["img"]
    n, _, h, w = img.shape
    center = ((w - 1) / 2.0, (h - 1) / 2.0)

    warped = jax.vmap(partial(_warp_image, order=1))(img, params.angle_deg, params.shift)
    # Intensity: contrast/brightness then gamma (on [0, 1] images).
    ctr = (1.0 + params.contrast)[:, None, None, None]
    br = params.brightness[:, None, None, None]
    warped = jnp.clip(warped * ctr + br, 0.0, 1.0)
    warped = jnp.power(jnp.maximum(warped, 1e-8), params.gamma[:, None, None, None])
    out["img"] = warped

    if "gt" in batch and batch["gt"] is not None:
        gt = batch["gt"][:, None].astype(jnp.float32)
        gt_w = jax.vmap(partial(_warp_image, order=0))(gt, params.angle_deg, params.shift)
        out["gt"] = gt_w[:, 0].astype(batch["gt"].dtype)

    if "contour" in batch and batch["contour"] is not None:
        kp = _rotate_keypoints(batch["contour"], params.angle_deg[:, None], center)
        out["contour"] = kp + params.shift[:, None, :]
    return out


@jax.jit
def un_apply_logits(logits: jnp.ndarray, params: AugmentParams) -> jnp.ndarray:
    """Invert the geometric transform on (N, C, H, W) logits (TTA path)."""
    # Inverse of (rotate about center, then translate): first remove the
    # translation, then rotate back.
    unshifted = jax.vmap(partial(_warp_image, order=1))(
        logits, jnp.zeros_like(params.angle_deg), -params.shift
    )
    return jax.vmap(partial(_warp_image, order=1))(
        unshifted, -params.angle_deg, jnp.zeros_like(params.shift)
    )


@jax.jit
def un_apply_keypoints(kp: jnp.ndarray, params: AugmentParams, image_shape=(256, 256)) -> jnp.ndarray:
    center = ((image_shape[1] - 1) / 2.0, (image_shape[0] - 1) / 2.0)
    kp = kp - params.shift[:, None, :]
    return _rotate_keypoints(kp, -params.angle_deg[:, None], center)
