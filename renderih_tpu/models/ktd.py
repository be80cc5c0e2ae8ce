"""KTD — kinematics-aware MANO parameter head (flax.linen).

Parity with the reference's `decoder_ktd.py` (SURVEY 2.2 "Legacy
IntagHand decoders"): a per-joint chain of tiny regressors where each
joint's 6D rotation is predicted from the shared hidden feature
concatenated with the predictions of all its kinematic ancestors
(`common/myhand/decoder_ktd.py:26-110`, ancestor table `:6-23`), plus
shape and orthographic camera heads.

TPU note: the 16-step chain is unrolled at trace time — each step is a
(B, hidden + 6·|ancestors|) x (..., 6) matmul; XLA fuses the whole chain
into a handful of small GEMMs, so no scan is needed (the loop length is
a compile-time constant and the per-step shapes differ).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from renderih_tpu.mano.layer import ManoModel, mano_forward
from renderih_tpu.ops.projection import orthographic_project
from renderih_tpu.ops.rotation import rot6d_to_rotmat

# Ancestor indices per MANO joint (root, then index/middle/pinky/ring/
# thumb chains of 3), reference `decoder_ktd.py:6-23`.
HAND_ANCESTORS: tuple = (
    (),
    (0,), (0, 1), (0, 1, 2),
    (0,), (0, 4), (0, 4, 5),
    (0,), (0, 7), (0, 7, 8),
    (0,), (0, 10), (0, 10, 11),
    (0,), (0, 13), (0, 13, 14),
)


class KTDHead(nn.Module):
    """Single-hand KTD regressor: global feature -> MANO params + camera."""

    hidden_dim: int = 1024
    dropout: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)

        small = nn.initializers.variance_scaling(1e-4, "fan_avg", "uniform")
        shape = nn.Dense(10, kernel_init=small, name="decshape")(x)
        cam = nn.Dense(3, kernel_init=small, name="deccam")(x)

        # Kinematic chain: each joint sees [hidden ‖ ancestor 6D preds].
        poses = []
        for j, ancestors in enumerate(HAND_ANCESTORS):
            inp = jnp.concatenate([x] + [poses[a] for a in ancestors], -1)
            poses.append(
                nn.Dense(6, kernel_init=small, name=f"joint_reg{j}")(inp)
            )
        pose6d = jnp.concatenate(poses, axis=-1)  # (B, 96)
        return pose6d.astype(jnp.float32), shape.astype(jnp.float32), \
            cam.astype(jnp.float32)


def ktd_mano_outputs(
    model: ManoModel,
    pose6d: jax.Array,   # (B, 96)
    shape: jax.Array,    # (B, 10)
    cam: jax.Array,      # (B, 3) = scale, trans2d
    img_size: int = 256,
) -> dict:
    """6D chain output -> MANO verts/joints + 2D reprojection
    (`decoder_ktd.py:96-140` `get_output`)."""
    b = pose6d.shape[0]
    rotmats = rot6d_to_rotmat(pose6d.reshape(b, 16, 6))  # (B, 16, 3, 3)
    verts, joints = mano_forward(
        model, rotmats[:, 0], rotmats[:, 1:], shape, use_pca=False,
    )
    scale, trans2d = cam[:, 0], cam[:, 1:]
    j2d = orthographic_project(scale, trans2d, joints, img_size)
    return {
        "verts3d": verts, "joints3d": joints, "joints2d": j2d,
        "rotmats": rotmats, "shape": shape, "scale": scale,
        "trans2d": trans2d,
    }
