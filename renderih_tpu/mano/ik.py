"""Joints -> MANO parameters: batched analytic IK + gradient refinement.

Reference capability: `utils/mano_from_3djoint/AIK.py:16-103` (adaptive
twist-swing IK, one hand at a time in numpy + transforms3d) and
`utils/mano_from_3djoint/convert2mano.py:160-204` (200-step Adam
refinement of pose + shape against the target joints). This module is
the TPU-native rebuild: everything is batched over hands, the kinematic
recursion is *level-parallel* (3 iterations of (B, 5, ...) math — the
same trick as `mano/layer.py`), the global rotation uses Horn's
quaternion closed form (shared with `eval/metrics.py`, no SVD custom
call), and the refinement is a jitted `lax.fori_loop` over optax Adam
with the reference's linearly-decayed learning rate.

Joint convention: the pipeline-wide 21-joint order (mano/params.py
NEW_JOINT_ORDER = wrist, thumb..tip, index..tip, middle..tip, ring..tip,
pinky..tip) — identical to the reference's SNAP order
(`utils/mano_from_3djoint/config.py:84-124`).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from renderih_tpu.eval.metrics import _umeyama_rotation
from renderih_tpu.mano.layer import mano_forward
from renderih_tpu.mano.params import ManoModel
from renderih_tpu.ops.rotation import rodrigues, rodrigues_inverse

# 21-joint (SNAP) tree, grouped by depth. Finger order inside each level:
# thumb, index, middle, ring, pinky.
_MCP = (1, 5, 9, 13, 17)          # level 1 (children of the wrist)
_LEVELS = (
    (2, 6, 10, 14, 18),           # level 2
    (3, 7, 11, 15, 19),           # level 3
    (4, 8, 12, 16, 20),           # level 4 (fingertips)
)
# Skeleton pose slot (0..14, i.e. MANO joint id - 1) that holds the local
# rotation computed at each level, per finger. The rotation swinging the
# bone INTO level-k joints lives at the level-(k-1) parent's skeleton slot
# (reference `config.py:126-132` ID2ROT). MANO skeleton finger blocks:
# index 1-3, middle 4-6, pinky 7-9, ring 10-12, thumb 13-15.
_POSE_SLOTS = (
    (12, 0, 3, 9, 6),             # rotations at the MCPs
    (13, 1, 4, 10, 7),            # rotations at the PIPs
    (14, 2, 5, 11, 8),            # rotations at the DIPs
)


def _safe_normalize(v: jax.Array, eps: float = 1e-8) -> jax.Array:
    return v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + eps)


def _normalize_target(template: jax.Array, joints: jax.Array) -> jax.Array:
    """Rescale (|j9 - j0| -> template scale) and re-anchor at the template
    wrist (`convert2mano.py:167-169`)."""
    t = template.astype(jnp.float32)
    p = joints.astype(jnp.float32)
    ratio = jnp.linalg.norm(t[9] - t[0]) / (
        jnp.linalg.norm(p[:, 9] - p[:, 0], axis=-1) + 1e-9)
    p = p * ratio[:, None, None]
    return p - p[:, :1] + t[0]


def _adaptive_ik_normalized(template: jax.Array, p: jax.Array):
    """Core twist-swing sweep on a pre-normalized target.

    Returns (root_rotmat (B, 3, 3), locals (B, 15, 3, 3),
    q (B, 21, 3)): the rotations plus the rigid-chain joint positions the
    IK itself predicts (tips included) — callers use q to measure the
    skinning offset of the fingertip VERTICES against the rigid chain.
    """
    b = p.shape[0]
    t = template.astype(jnp.float32)

    # Global rotation from the five wrist->MCP directions (Horn closed
    # form; the reference uses Arun's SVD, `AIK.py:46-67`).
    mcp = jnp.asarray(_MCP)
    dirs_t = t[mcp] - t[0]                        # (5, 3)
    dirs_p = p[:, mcp] - p[:, :1]                 # (B, 5, 3)
    k = jnp.einsum("fi,bfj->bij", dirs_t, dirs_p)
    r0, _ = _umeyama_rotation(k)                  # (B, 3, 3), takes t -> p

    # Level-parallel kinematic sweep: five fingers at once per level.
    r_pa = jnp.broadcast_to(r0[:, None], (b, 5, 3, 3))
    q_pa = jnp.einsum("bij,fj->bfi", r0, dirs_t) + t[0]  # MCP positions
    t_pa = t[mcp]                                        # (5, 3)
    locals_out = jnp.zeros((b, 15, 3, 3), jnp.float32)
    q_out = jnp.zeros((b, 21, 3), jnp.float32)
    q_out = q_out.at[:, 0].set(t[0])
    q_out = q_out.at[:, mcp].set(q_pa)
    for child_ids, slots in zip(_LEVELS, _POSE_SLOTS):
        child = jnp.asarray(child_ids)
        delta_t = t[child] - t_pa                            # (5, 3)
        # Parent-frame offset of the observed child joint.
        delta_p = jnp.einsum(
            "bfji,bfj->bfi", r_pa, p[:, child] - q_pa)       # R^T (p - q)
        axis = _safe_normalize(jnp.cross(
            jnp.broadcast_to(delta_t, delta_p.shape), delta_p))
        denom = ((jnp.linalg.norm(delta_t, axis=-1) + 1e-8)
                 * (jnp.linalg.norm(delta_p, axis=-1) + 1e-8))
        cos_a = jnp.clip(
            jnp.einsum("fi,bfi->bf", delta_t, delta_p) / denom, -1.0, 1.0)
        alpha = jnp.arccos(cos_a)
        r_local = rodrigues(axis * alpha[..., None])         # (B, 5, 3, 3)
        r_k = jnp.einsum("bfij,bfjk->bfik", r_pa, r_local)
        q_k = jnp.einsum("bfij,fj->bfi", r_k, delta_t) + q_pa
        locals_out = locals_out.at[:, jnp.asarray(slots)].set(r_local)
        q_out = q_out.at[:, child].set(q_k)
        r_pa, q_pa, t_pa = r_k, q_k, t[child]

    return r0, locals_out, q_out


def adaptive_ik(template: jax.Array, joints: jax.Array, tip_iters: int = 0,
                model: ManoModel | None = None):
    """Twist-swing analytic IK, batched.

    Args:
      template: (21, 3) zero-pose MANO joints (any consistent unit).
      joints: (B, 21, 3) target joints in the same 21-joint order. They
        are internally rescaled (|j9 - j0| -> template scale) and
        re-anchored at the template wrist, so any unit/offset works.
      tip_iters: fingertip-correction sweeps (requires `model`). The 5
        tip rows of the 21-joint convention are skinned VERTICES, not
        skeleton joints, so they sit off the rigid chain by a
        pose-dependent skinning/blendshape offset; each sweep measures
        that offset with one `mano_forward` and re-aims the distal
        swing at `tip_target - offset`. 2 sweeps take the distal error
        from ~5 mm to sub-mm. The reference ignores this and leaves it
        to its 200-step Adam refinement.

    Returns:
      (root_rotmat (B, 3, 3), rotmats (B, 15, 3, 3)): global wrist
      rotation plus local per-joint rotations in MANO skeleton order,
      directly consumable by `mano_forward(..., pose=rotmats)`.

    Matches `AIK.adaptive_IK` (`utils/mano_from_3djoint/AIK.py:16-103`)
    with the twist component fixed at zero, but runs all five fingers of
    the whole batch per level instead of a 15-step scalar loop.
    """
    p = _normalize_target(template, joints)
    r0, locals_out, q = _adaptive_ik_normalized(template, p)
    tips = jnp.asarray(_LEVELS[-1])
    b = joints.shape[0]
    for _ in range(tip_iters):
        assert model is not None, "tip_iters needs the ManoModel"
        _, j_fwd = mano_forward(model, r0, locals_out,
                                jnp.zeros((b, 10), jnp.float32),
                                center_idx=None, use_pca=False)
        j_fwd = j_fwd - j_fwd[:, :1] + p[:, :1]  # template-anchored
        offset = j_fwd[:, tips] - q[:, tips]     # skinning offset
        p = p.at[:, tips].set(
            _normalize_target(template, joints)[:, tips] - offset)
        r0, locals_out, q = _adaptive_ik_normalized(template, p)
    return r0, locals_out


def ik_template(model: ManoModel, shape: jax.Array | None = None) -> jax.Array:
    """Zero-pose 21 joints for `adaptive_ik` (optionally shape-dependent)."""
    shape = jnp.zeros((1, 10)) if shape is None else shape.reshape(1, 10)
    eye = jnp.broadcast_to(jnp.eye(3), (1, 3, 3))
    _, j = mano_forward(model, eye, jnp.zeros((1, 45)), shape,
                        center_idx=None, use_pca=False)
    return j[0]


class IKFit(NamedTuple):
    root_aa: jax.Array      # (B, 3) global wrist axis-angle
    pose_aa: jax.Array      # (B, 45) local pose axis-angle
    shape: jax.Array        # (B, 10)
    joint_err: jax.Array    # (B,) mean |joint residual| after the fit


def ik_from_joints(model: ManoModel, joints: jax.Array,
                   tip_iters: int = 2) -> IKFit:
    """Analytic-only fit (no gradient refinement): joints -> IKFit."""
    template = ik_template(model)
    r0, rotmats = adaptive_ik(template, joints, tip_iters=tip_iters,
                              model=model)
    root_aa = rodrigues_inverse(r0)
    pose_aa = rodrigues_inverse(rotmats).reshape(-1, 45)
    b = joints.shape[0]
    err = _joint_residual(model, root_aa, pose_aa, jnp.zeros((b, 10)), joints)
    return IKFit(root_aa, pose_aa, jnp.zeros((b, 10)), err)


def _joint_residual(model, root_aa, pose_aa, shape, target):
    v, j = mano_forward(model, rodrigues(root_aa), pose_aa, shape,
                        center_idx=None, use_pca=False)
    j = j - j[:, :1]
    tgt = target - target[:, :1]
    # Match scales the same way the IK does (unit-agnostic).
    t0 = ik_template(model)
    ratio = jnp.linalg.norm(t0[9] - t0[0]) / (
        jnp.linalg.norm(tgt[:, 9], axis=-1) + 1e-9)
    return jnp.abs(j - tgt * ratio[:, None, None]).mean(axis=(1, 2))


def fit_mano_to_joints(
    model: ManoModel,
    joints: jax.Array,
    iters: int = 200,
    lr: float = 1e-1,
    shape_reg: float = 2e-3,
    pose_reg: float = 1e-3,
) -> IKFit:
    """AIK init + jitted Adam refinement of pose AND shape.

    The reference (`convert2mano.py:177-204`) optimizes the raw 3x3
    entries of the rotation matrices (off-manifold) then re-orthogonalizes
    through mat2aa; we optimize axis-angle directly — on-manifold, same
    parameter count the MANO layer consumes, and `rodrigues` is exactly
    differentiable. LR decays linearly to 0 like the reference
    (`convert2mano.py:202-203`).

    `pose_reg` weakly pulls the pose toward the analytic (swing-only)
    initialization. 21 joints cannot observe bone twist, so the data
    term has a null space; the regularizer pins those directions at the
    zero-twist init instead of letting Adam wander in them (the
    reference has no equivalent and simply accepts the drift).
    """
    b = joints.shape[0]
    template = ik_template(model)
    r0, rotmats = adaptive_ik(template, joints, tip_iters=2, model=model)

    # Normalized target: template scale, root-relative.
    tgt = joints.astype(jnp.float32)
    ratio = jnp.linalg.norm(template[9] - template[0]) / (
        jnp.linalg.norm(tgt[:, 9] - tgt[:, 0], axis=-1) + 1e-9)
    tgt = (tgt - tgt[:, :1]) * ratio[:, None, None]

    params0 = {
        "root": rodrigues_inverse(r0),
        "pose": rodrigues_inverse(rotmats).reshape(b, 45),
        "shape": jnp.zeros((b, 10)),
    }
    schedule = optax.linear_schedule(lr, 0.0, iters)
    tx = optax.adam(schedule)

    pose_init = params0["pose"]

    def loss_fn(params):
        v, j = mano_forward(model, rodrigues(params["root"]), params["pose"],
                            params["shape"], center_idx=None, use_pca=False)
        j = j - j[:, :1]
        data = jnp.abs(j - tgt).mean()
        return (data + shape_reg * (params["shape"] ** 2).mean()
                + pose_reg * ((params["pose"] - pose_init) ** 2).mean())

    @jax.jit
    def run(params0):
        opt0 = tx.init(params0)

        def body(_, carry):
            params, opt = carry
            grads = jax.grad(loss_fn)(params)
            updates, opt = tx.update(grads, opt, params)
            return optax.apply_updates(params, updates), opt

        params, _ = jax.lax.fori_loop(0, iters, body, (params0, opt0))
        return params

    params = run(params0)
    err = _joint_residual(model, params["root"], params["pose"],
                          params["shape"], joints)
    return IKFit(params["root"], params["pose"], params["shape"], err)


def mano_from_fit(model: ManoModel, fit: IKFit, target_joints: jax.Array):
    """Run MANO on a fit and map the output back into the target frame.

    The IK works at template scale anchored at the template wrist;
    datasets want verts/joints in THEIR units and position. Undo the
    normalization: rescale by the target's |j9 - j0| and re-anchor at the
    target wrist. Returns (verts (B, 778, 3), joints (B, 21, 3)).
    """
    v, j = mano_forward(model, rodrigues(fit.root_aa), fit.pose_aa,
                        fit.shape, center_idx=None, use_pca=False)
    template = ik_template(model)
    t_len = jnp.linalg.norm(template[9] - template[0])
    tgt = target_joints.astype(jnp.float32)
    scale = (jnp.linalg.norm(tgt[:, 9] - tgt[:, 0], axis=-1)
             / (t_len + 1e-9))[:, None, None]
    v = (v - j[:, :1]) * scale + tgt[:, :1]
    j = (j - j[:, :1]) * scale + tgt[:, :1]
    return v, j
