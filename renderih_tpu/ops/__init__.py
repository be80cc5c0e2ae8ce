"""Numeric primitives shared across the framework (pure JAX)."""

from renderih_tpu.ops.rotation import (
    rodrigues,
    rodrigues_inverse,
    rot6d_to_rotmat,
    axis_angle_rotate,
    rotmat_z,
)
from renderih_tpu.ops.projection import orthographic_project

__all__ = [
    "rodrigues",
    "rodrigues_inverse",
    "rot6d_to_rotmat",
    "axis_angle_rotate",
    "rotmat_z",
    "orthographic_project",
]
