"""Cameras used throughout the two-hand stack.

Orthographic: the model predicts, per hand, a scalar `scale` and a 2D
`trans2d` in normalized units; projection to pixel space is

    uv = scale * img_size * xyz[..., :2] + (trans2d * img_size / 2 + img_size / 2)

matching `projection_batch` in the reference (`utils/manoutils.py:26-44`).

Pinhole (perspective): dataset-side tools project camera-space points
through per-frame 3x3 intrinsics `cameraIn`, exactly as the reference's
`utils/compute_maskiou.py:190-198` (`p = v @ K.T; uv = p[:, :2]/p[:, 2:]`)
and its `PerspectiveCameras` construction (`utils/vis_utils.py:72-80`).
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


def pinhole_project(
    points_cam: jax.Array,
    camera_in: jax.Array,
    eps: float = 1e-9,
) -> tuple[jax.Array, jax.Array]:
    """Project camera-space points through 3x3 pinhole intrinsics.

    uv = (K @ p)_{xy} / (K @ p)_z  — identical to the reference's
    `v @ cameraIn.T` then divide by the homogeneous z
    (`utils/compute_maskiou.py:193-197`). With a standard upper-triangular
    K the divisor is the camera depth itself.

    Args:
      points_cam: (..., N, 3) points in camera space (+z toward scene).
      camera_in: (..., 3, 3) intrinsics (fx, fy on the diagonal, cx, cy
        in the last column).

    Returns:
      (uv (..., N, 2) pixel coordinates, depth (..., N) camera-space z —
      the z-buffer key: smaller = closer, matching the rasterizer).
    """
    p = jnp.einsum("...ij,...nj->...ni", camera_in, points_cam)
    uv = p[..., :2] / (p[..., 2:] + eps)
    return uv, points_cam[..., 2]
