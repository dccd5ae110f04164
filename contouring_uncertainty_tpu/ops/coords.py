"""Normalized <-> pixel coordinate conventions for spatial-softmax point regression.

Convention (matching reference contour_uncertainty/task/regression/dsnt/utils.py:52-118):
a length-L axis maps to normalized coordinates at *cell centers*,

    u_i = (2 i + 1) / L - 1,   i = 0..L-1

so -1 and +1 lie just outside the first/last cell. Points carry (x, y)
ordering in the last axis; `size` arguments carry (height, width) ordering.
"""

from __future__ import annotations

import jax.numpy as jnp


def normalized_linspace(length: int, dtype=jnp.float32) -> jnp.ndarray:
    """Cell-center normalized coordinates of a length-`length` axis in (-1, 1)."""
    i = jnp.arange(length, dtype=dtype)
    return (2.0 * i + 1.0) / length - 1.0


def normalized_to_pixel(coords: jnp.ndarray, size) -> jnp.ndarray:
    """Map normalized (x, y, ...) coords to pixel coords.

    Args:
        coords: (..., D) with last axis ordered (x, y, ...).
        size: spatial dims ordered (..., height, width) — flipped internally
            so x pairs with width.
    """
    size = jnp.asarray(size, dtype=coords.dtype)[::-1]
    return 0.5 * ((coords + 1.0) * size - 1.0)


def pixel_to_normalized(coords: jnp.ndarray, size) -> jnp.ndarray:
    """Inverse of :func:`normalized_to_pixel`."""
    size = jnp.asarray(size, dtype=coords.dtype)[::-1]
    return (2.0 * coords + 1.0) / size - 1.0
