"""Differentiable MANO hand model (pure JAX).

`ManoModel` is a pytree of arrays; `mano_forward` is a pure function, so
the whole layer vmaps/jits/differentiates and shards like any other JAX
computation. See `renderih_tpu/mano/layer.py` for the math.
"""

from renderih_tpu.mano.params import (
    MANO_PARENTS,
    NEW_JOINT_ORDER,
    TIP_VERTEX_IDS,
    NUM_VERTS,
    NUM_JOINTS,
    ManoModel,
    load_mano_npz,
    convert_mano_pkl,
    fix_left_shapedirs,
    make_synthetic_mano,
    joint_regressor_21,
)
from renderih_tpu.mano.layer import (
    mano_forward,
    pca_to_axis,
    axis_to_pca,
    pose_to_rotmats,
)

__all__ = [
    "MANO_PARENTS",
    "NEW_JOINT_ORDER",
    "TIP_VERTEX_IDS",
    "NUM_VERTS",
    "NUM_JOINTS",
    "ManoModel",
    "load_mano_npz",
    "convert_mano_pkl",
    "fix_left_shapedirs",
    "make_synthetic_mano",
    "joint_regressor_21",
    "mano_forward",
    "pca_to_axis",
    "axis_to_pca",
    "pose_to_rotmats",
]
