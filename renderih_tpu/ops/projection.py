"""Orthographic camera used throughout the two-hand stack.

The model predicts, per hand, a scalar `scale` and a 2D `trans2d` in
normalized units; projection to pixel space is

    uv = scale * img_size * xyz[..., :2] + (trans2d * img_size / 2 + img_size / 2)

matching `projection_batch` in the reference (`utils/manoutils.py:26-44`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def orthographic_project(
    scale: jax.Array,
    trans2d: jax.Array,
    points3d: jax.Array,
    img_size: float = 256.0,
) -> jax.Array:
    """Project 3D points with a per-sample orthographic camera.

    Args:
      scale: (...,) per-sample scale in normalized units.
      trans2d: (..., 2) per-sample translation in [-1, 1] units.
      points3d: (..., N, 3) points.
      img_size: output pixel resolution.

    Returns:
      (..., N, 2) pixel coordinates.
    """
    s = (scale * img_size)[..., None, None]
    t = (trans2d * img_size / 2.0 + img_size / 2.0)[..., None, :]
    return s * points3d[..., :2] + t
