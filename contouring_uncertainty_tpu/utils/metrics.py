"""Segmentation metrics on device (reference used medpy on host,
contour_uncertainty/utils/metrics.py:9-41)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dice_binary(pred: jnp.ndarray, target: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Binary Dice over trailing (H, W); broadcasts over leading axes."""
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    inter = jnp.sum(pred * target, axis=(-2, -1))
    denom = jnp.sum(pred, axis=(-2, -1)) + jnp.sum(target, axis=(-2, -1))
    return (2.0 * inter + eps) / (denom + eps)


def dice_multiclass(pred: jnp.ndarray, target: jnp.ndarray, labels) -> jnp.ndarray:
    """Mean Dice over non-background labels. pred/target: (..., H, W) int maps."""
    scores = []
    for lab in labels:
        if int(lab) == 0:
            continue
        scores.append(dice_binary(pred == int(lab), target == int(lab)))
    return jnp.stack(scores, axis=-1).mean(axis=-1)


def soft_dice(probs: jnp.ndarray, target: jnp.ndarray, n_channels: int,
              eps: float = 1e-8) -> jnp.ndarray:
    """Differentiable Dice over foreground channels (the reference's
    DifferentiableDiceCoefficient, vital/metrics/train/functional.py:7-133).

    probs: (N, C, H, W) probabilities; target: (N, H, W) int labels.
    Returns per-foreground-class mean Dice (C' ,).
    """
    if n_channels == 1:
        tgt = (target > 0).astype(jnp.float32)[:, None]
        p = probs
    else:
        tgt = jax.nn.one_hot(target, n_channels, axis=1)[:, 1:]
        p = probs[:, 1:]
    inter = jnp.sum(p * tgt, axis=(0, 2, 3))
    denom = jnp.sum(p, axis=(0, 2, 3)) + jnp.sum(tgt, axis=(0, 2, 3))
    return (2.0 * inter + eps) / (denom + eps)


def pixel_entropy(probs: jnp.ndarray, axis: int = 1, eps: float = 1e-12) -> jnp.ndarray:
    """Shannon entropy of per-pixel class probabilities along `axis`."""
    return -jnp.sum(probs * jnp.log(probs + eps), axis=axis)
