"""MANO-parameter losses for the `mano` decoder variant.

Parity target: `ManoLoss` / `mano_loss_GCN` (`core/Loss_mano.py:62-335`)
— everything in `two_hand_graph_loss` plus:

  * pose loss: MSE between rotation matrices of predicted and GT pose
    (both via Rodrigues, 16 joints including the root).
  * shape loss: MSE on the 10 betas.
  * shape L2 regularizer x 0.005.
  * root_rel loss: MSE on the inter-hand root offset.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from renderih_tpu.ops.rotation import rodrigues, rot6d_to_rotmat


def pose_rotmat_loss(pred_pose_aa: jax.Array, gt_pose_aa: jax.Array) -> jax.Array:
    """MSE between Rodrigues matrices. poses: (..., 48) axis-angle."""
    pr = rodrigues(pred_pose_aa.reshape(-1, 3))
    gr = rodrigues(gt_pose_aa.reshape(-1, 3))
    return jnp.mean((pr - gr) ** 2)


def pose6d_rotmat_loss(pred_pose6d: jax.Array, gt_pose_aa: jax.Array) -> jax.Array:
    """MSE between 6D-predicted and GT rotation matrices.

    pred: (B, 96) = 16 x 6D; gt: (B, 48) axis-angle (root + 15 joints).
    """
    pr = rot6d_to_rotmat(pred_pose6d.reshape(-1, 6))
    gr = rodrigues(gt_pose_aa.reshape(-1, 3))
    return jnp.mean((pr - gr) ** 2)


def mano_param_losses(
    out,                 # DecoderOutput with mano_pose/mano_shape
    batch: dict,         # needs pose_left/right (B,48), shape_left/right (B,10)
    shape_reg: float = 0.005,
) -> dict:
    """Per-term MANO parameter losses, averaged over hands."""
    terms = {"pose": 0.0, "shape": 0.0, "shape_reg": 0.0}
    for hand in ("left", "right"):
        terms["pose"] += 0.5 * pose6d_rotmat_loss(
            out.mano_pose[hand], batch[f"pose_{hand}"]
        )
        terms["shape"] += 0.5 * jnp.mean(
            (out.mano_shape[hand] - batch[f"shape_{hand}"]) ** 2
        )
        terms["shape_reg"] += 0.5 * shape_reg * jnp.mean(
            out.mano_shape[hand] ** 2
        )
    return terms


def root_rel_loss(pred_root_rel: jax.Array, gt_root_rel: jax.Array) -> jax.Array:
    return jnp.mean((pred_root_rel - gt_root_rel) ** 2)
