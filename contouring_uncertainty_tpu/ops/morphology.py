"""Binary morphology on device: hole filling and largest-connected-component.

Capability parity with the reference's mask post-processing
(task/segmentation/segmentation_uncertainty.py:102-110 + utils.py big_blob:
scipy binary_fill_holes + keep-largest-blob per MC sample on host).

TPU-first: both are expressed as bounded fixed-point iterations of
8/4-neighbour max-pooling label/indicator propagation inside
`lax.while_loop` — no host callbacks — and vmap over the (N, T_e, T_a)
sample populations.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _dilate(mask: jnp.ndarray) -> jnp.ndarray:
    """4-neighbour binary dilation of (H, W) via shifts."""
    up = jnp.roll(mask, -1, 0).at[-1, :].set(False)
    down = jnp.roll(mask, 1, 0).at[0, :].set(False)
    left = jnp.roll(mask, -1, 1).at[:, -1].set(False)
    right = jnp.roll(mask, 1, 1).at[:, 0].set(False)
    return mask | up | down | left | right


@jax.jit
def fill_holes(mask: jnp.ndarray) -> jnp.ndarray:
    """Fill enclosed background regions of a binary (H, W) mask.

    Grows the border-connected background to a fixed point; anything not
    reached and not foreground is a hole.
    """
    fg = mask > 0
    h, w = fg.shape
    border = jnp.zeros((h, w), bool)
    border = border.at[0, :].set(True).at[-1, :].set(True)
    border = border.at[:, 0].set(True).at[:, -1].set(True)
    outside0 = border & ~fg

    def cond(state):
        outside, changed = state
        return changed

    def body(state):
        outside, _ = state
        grown = _dilate(outside) & ~fg
        return grown, (grown != outside).any()

    outside, _ = jax.lax.while_loop(cond, body, (outside0, jnp.asarray(True)))
    return (fg | ~outside).astype(mask.dtype)


def _max_pool_labels(labels: jnp.ndarray) -> jnp.ndarray:
    up = jnp.roll(labels, -1, 0).at[-1, :].set(0)
    down = jnp.roll(labels, 1, 0).at[0, :].set(0)
    left = jnp.roll(labels, -1, 1).at[:, -1].set(0)
    right = jnp.roll(labels, 1, 1).at[:, 0].set(0)
    return jnp.maximum(labels, jnp.maximum(jnp.maximum(up, down), jnp.maximum(left, right)))


@jax.jit
def largest_blob(mask: jnp.ndarray) -> jnp.ndarray:
    """Keep only the largest 4-connected component of a binary (H, W) mask.

    Label propagation: every foreground pixel starts with a unique id and
    repeatedly takes the max over its component until fixed point; component
    sizes come from a bincount over final labels.
    """
    fg = mask > 0
    h, w = fg.shape
    ids = (jnp.arange(h * w, dtype=jnp.int32) + 1).reshape(h, w)
    labels0 = jnp.where(fg, ids, 0)

    def cond(state):
        labels, changed = state
        return changed

    def body(state):
        labels, _ = state
        new = jnp.where(fg, _max_pool_labels(labels), 0)
        return new, (new != labels).any()

    labels, _ = jax.lax.while_loop(cond, body, (labels0, jnp.asarray(True)))
    sizes = jnp.zeros(h * w + 1, jnp.int32).at[labels.reshape(-1)].add(1)
    sizes = sizes.at[0].set(0)  # background doesn't count
    best = jnp.argmax(sizes)
    return ((labels == best) & fg).astype(mask.dtype)


@jax.jit
def postprocess_sample(mask: jnp.ndarray) -> jnp.ndarray:
    """fill_holes + largest_blob (the reference's per-sample chain)."""
    return largest_blob(fill_holes(mask))


def postprocess_batch(masks: jnp.ndarray) -> jnp.ndarray:
    """vmap the post-processing over arbitrary leading axes. (..., H, W)."""
    lead = masks.shape[:-2]
    flat = masks.reshape((-1,) + masks.shape[-2:])
    out = jax.vmap(postprocess_sample)(flat)
    return out.reshape(lead + masks.shape[-2:])
