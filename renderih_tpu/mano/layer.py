"""Pure-functional MANO forward pass, vectorized for the MXU.

Behavioural parity target: `ManoLayer.forward` in the reference
(`models/manolayer.py:250-322`) — same inputs, same outputs — but the
implementation is TPU-first:

  * The 16-step sequential SE(3) kinematic chain (reference
    `models/manolayer.py:274-283`, a Python loop of batched 4x4 matmuls)
    is replaced by *level-parallel* composition: the MANO tree has depth 3
    below the root and each level holds exactly one joint per finger, so
    the global transforms are three batched (B, 5, 4, 4) matmuls.
  * Blend shapes / LBS are einsums that XLA maps straight onto the MXU.
  * Everything is differentiable and vmappable; no Python-level state.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from renderih_tpu.mano.params import (
    KINEMATIC_LEVELS,
    NEW_JOINT_ORDER,
    TIP_VERTEX_IDS,
    ManoModel,
)
from renderih_tpu.ops.rotation import rodrigues

# new_skel knuckle overrides (reference `models/manolayer.py:316-320`).
_NEW_SKEL_JOINTS = (5, 9, 13, 17)
_NEW_SKEL_VERTS = ((63, 144), (271, 220), (148, 290), (770, 83))


def pca_to_axis(model: ManoModel, pca: jax.Array) -> jax.Array:
    """PCA pose coefficients (..., ncomps) -> 45-dim axis-angle."""
    ncomps = pca.shape[-1]
    return pca @ model.hands_components[:ncomps] + model.hands_mean


def axis_to_pca(model: ManoModel, axis: jax.Array) -> jax.Array:
    """45-dim axis-angle -> full 45-dim PCA coefficients."""
    return (axis - model.hands_mean) @ model.hands_components_inv


def pose_to_rotmats(model: ManoModel, pose: jax.Array, use_pca: bool = True) -> jax.Array:
    """Pose (..., ncomps) or (..., 45) axis-angle -> (..., 15, 3, 3)."""
    axis = pca_to_axis(model, pose) if use_pca else pose
    return rodrigues(axis.reshape(axis.shape[:-1] + (15, 3)))


def _compose_kinematics(local: jax.Array) -> jax.Array:
    """Compose local joint SE(3)s into global transforms, level-parallel.

    Args:
      local: (B, 16, 4, 4) local transforms in skeleton-joint order
        (root = 0). Parent of level k is the matching finger joint in
        level k-1; parents of level 0 fingers are the root.

    Returns:
      (B, 16, 4, 4) global transforms.
    """
    g_root = local[:, 0]  # (B, 4, 4)
    l1, l2, l3 = KINEMATIC_LEVELS
    g1 = jnp.einsum("bij,bfjk->bfik", g_root, local[:, list(l1)])
    g2 = jnp.einsum("bfij,bfjk->bfik", g1, local[:, list(l2)])
    g3 = jnp.einsum("bfij,bfjk->bfik", g2, local[:, list(l3)])
    stacked = jnp.concatenate([g_root[:, None], g1, g2, g3], axis=1)
    # stacked order: [0] + l1 + l2 + l3 -> invert to joint order 0..15.
    order = (0,) + l1 + l2 + l3
    inv = [0] * 16
    for pos, joint in enumerate(order):
        inv[joint] = pos
    return stacked[:, jnp.asarray(inv)]


def mano_forward(
    model: ManoModel,
    root_rotmat: jax.Array,
    pose: jax.Array,
    shape: jax.Array,
    trans: jax.Array | None = None,
    scale: jax.Array | None = None,
    center_idx: int | None = 9,
    use_pca: bool = True,
    new_skel: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """MANO forward: pose/shape -> (verts (B, 778, 3), joints (B, 21, 3)).

    Args:
      model: MANO parameters.
      root_rotmat: (B, 3, 3) global wrist rotation.
      pose: (B, ncomps) PCA coefficients, (B, 45) axis-angle when
        use_pca=False, or (B, 15, 3, 3) rotation matrices.
      shape: (B, 10) shape coefficients.
      trans: optional (B, 3) translation applied last.
      scale: optional (B,) scale applied after centering.
      center_idx: joint to center the output on (9 = middle MCP, the
        pipeline-wide convention), or None to keep MANO root frame.
      use_pca: whether `pose` is PCA coefficients.
      new_skel: override 4 knuckle joints with vertex midpoints
        (reference `models/manolayer.py:316-320`).
    """
    bs = root_rotmat.shape[0]
    f32 = root_rotmat.dtype

    if pose.ndim == 4:  # already rotation matrices
        rotmats = pose
    else:
        rotmats = pose_to_rotmats(model, pose, use_pca=use_pca)

    # Shape blend: v_shaped = T + shapedirs . beta
    v_shaped = model.v_template + jnp.einsum("vds,bs->bvd", model.shapedirs, shape)
    # T-pose joints.
    j_tpose = jnp.einsum("jv,bvd->bjd", model.J_regressor, v_shaped)
    # Pose blend: posedirs . vec(R - I)
    eye = jnp.eye(3, dtype=f32)
    pose_feat = (rotmats - eye).reshape(bs, 135)
    v_tpose = v_shaped + jnp.einsum("vdp,bp->bvd", model.posedirs, pose_feat)

    # Local SE(3) per joint: [R | (I - R) j] so each joint is a fixed point
    # of its own local transform.
    all_rot = jnp.concatenate([root_rotmat[:, None], rotmats], axis=1)  # (B,16,3,3)
    t_local = jnp.einsum("bjmn,bjn->bjm", eye - all_rot, j_tpose)  # (B,16,3)
    local = jnp.zeros((bs, 16, 4, 4), f32)
    local = local.at[:, :, :3, :3].set(all_rot)
    local = local.at[:, :, :3, 3].set(t_local)
    local = local.at[:, :, 3, 3].set(1.0)

    g = _compose_kinematics(local)  # (B, 16, 4, 4)

    # Posed skeleton joints: G_i applied to its own t-pose joint.
    j_posed = (
        jnp.einsum("bjmn,bjn->bjm", g[:, :, :3, :3], j_tpose) + g[:, :, :3, 3]
    )

    # Linear blend skinning: per-vertex SE(3) = weights . G.
    t_verts = jnp.einsum("vj,bjmn->bvmn", model.weights, g)  # (B,778,4,4)
    v_out = (
        jnp.einsum("bvmn,bvn->bvm", t_verts[:, :, :3, :3], v_tpose)
        + t_verts[:, :, :3, 3]
    )

    # 21 joints = 16 skeleton + 5 fingertip verts, reordered.
    tips = v_out[:, jnp.asarray(TIP_VERTEX_IDS)]
    j_out = jnp.concatenate([j_posed, tips], axis=1)[:, jnp.asarray(NEW_JOINT_ORDER)]

    if center_idx is not None:
        center = j_out[:, center_idx : center_idx + 1]
        v_out = v_out - center
        j_out = j_out - center

    if scale is not None:
        v_out = v_out * scale[:, None, None]
        j_out = j_out * scale[:, None, None]

    if trans is not None:
        v_out = v_out + trans[:, None, :]
        j_out = j_out + trans[:, None, :]

    if new_skel:
        for joint, (va, vb) in zip(_NEW_SKEL_JOINTS, _NEW_SKEL_VERTS):
            j_out = j_out.at[:, joint].set((v_out[:, va] + v_out[:, vb]) / 2.0)

    return v_out, j_out
