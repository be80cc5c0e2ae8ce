"""Evaluation metrics, fully batched in JAX.

Parity targets in the reference:
  * Procrustes alignment `batch_compute_similarity_transform_torch`
    (`apps/eval_interhand.py:28-79`) — batched SVD on TPU instead of the
    per-sample numpy loop used for the "double" metrics
    (`apps/eval_interhand.py:130-135`).
  * MPJPE/MPVPE root-relative ("ori") and length-normalized variants
    (`apps/eval_interhand.py:334-386`).
  * MRRPE (`utils/eval_metrics.py:21-29`, `apps/eval_interhand.py:418-419,
    468-474`).
  * CDev contact deviation via KNN (`utils/eval_metrics.py:36-50`) — the
    pytorch3d `knn_points` is replaced with a dense pairwise-distance
    argmin: 778x778 distances per sample is a single MXU-friendly matmul.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _umeyama_rotation(k: jax.Array) -> tuple:
    """Proper rotation maximizing trace(R K), without an SVD custom call.

    k: (B, 3, 3) cross-covariance K = sum x1 (x) x2. Returns
    (r, sv_trace): the constrained-Procrustes rotation (identical to
    Umeyama's V Z U^T with the reflection fix) and
    sv_trace = max_R trace(R K) = s0 + s1 + sign(det K) * s2, which feeds
    the Umeyama scale.

    Method: Horn's quaternion formulation — the optimal q is the dominant
    eigenvector of the symmetric 4x4 Davenport matrix N(K), which is
    LINEAR in K (no K^T K squaring, so near-planar point sets keep full
    f32 precision). The dominant eigenvector is extracted branchlessly by
    repeated squaring of N + c I (c = ||N||_F bounds |lambda_min|, making
    lambda_max + c strictly dominant): 9 squarings = power 512, after
    which every column of the power lies in the dominant eigenspace; we
    take the largest column. Everything is elementwise/4x4-matmul math —
    VPU-friendly, no LAPACK-style loop, which is the TPU eval-throughput
    fix over jnp.linalg.svd.
    """
    s = k  # S_ab = sum x1_a * x2_b (Horn 1987 closed-form solution)
    sxx, sxy, sxz = s[:, 0, 0], s[:, 0, 1], s[:, 0, 2]
    syx, syy, syz = s[:, 1, 0], s[:, 1, 1], s[:, 1, 2]
    szx, szy, szz = s[:, 2, 0], s[:, 2, 1], s[:, 2, 2]
    n = jnp.stack([
        jnp.stack([sxx + syy + szz, syz - szy, szx - sxz, sxy - syx], -1),
        jnp.stack([syz - szy, sxx - syy - szz, sxy + syx, szx + sxz], -1),
        jnp.stack([szx - sxz, sxy + syx, -sxx + syy - szz, syz + szy], -1),
        jnp.stack([sxy - syx, szx + sxz, syz + szy, -sxx - syy + szz], -1),
    ], axis=-2)  # (B, 4, 4) symmetric

    fro = jnp.sqrt(jnp.sum(n * n, axis=(-2, -1), keepdims=True))
    m = n / jnp.maximum(fro, 1e-30) + jnp.eye(4, dtype=k.dtype)
    for _ in range(9):  # m <- m^2, renormalized: power 512 of (N+cI)
        m = jnp.einsum("bij,bjk->bik", m, m)
        m = m / jnp.maximum(
            jnp.sqrt(jnp.sum(m * m, axis=(-2, -1), keepdims=True)), 1e-30)
    col_norms = jnp.sum(m * m, axis=-2)  # (B, 4)
    best = jnp.argmax(col_norms, axis=-1)
    q = jnp.take_along_axis(m, best[:, None, None], axis=-1)[..., 0]
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-30)

    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    r = jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                   2 * (x * z + w * y)], -1),
        jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                   2 * (y * z - w * x)], -1),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
                   1 - 2 * (x * x + y * y)], -1),
    ], axis=-2)  # (B, 3, 3): rotation taking x1 onto x2

    # max trace(R K) = q^T N q (Rayleigh quotient of the exact N)
    sv_trace = jnp.einsum("bi,bij,bj->b", q, n, q)
    return r, sv_trace


def batch_similarity_align(s1: jax.Array, s2: jax.Array,
                           method: str = "analytic") -> jax.Array:
    """Align s1 to s2 with per-sample similarity transform (s, R, t).

    s1, s2: (B, N, 3). Returns aligned s1. Solves orthogonal Procrustes
    with scale (Umeyama), matching the reference
    `batch_compute_similarity_transform_torch`
    (`apps/eval_interhand.py:28-79`). method='analytic' (default) uses the
    closed-form 3x3 path (no SVD custom call — the TPU eval-throughput
    fix); method='svd' keeps the jnp.linalg.svd formulation as the
    equivalence oracle.
    """
    mu1 = s1.mean(axis=1, keepdims=True)
    mu2 = s2.mean(axis=1, keepdims=True)
    x1 = s1 - mu1
    x2 = s2 - mu2
    var1 = jnp.sum(x1**2, axis=(1, 2))  # (B,)

    k = jnp.einsum("bni,bnj->bij", x1, x2)  # (B, 3, 3)
    if method == "svd":
        u, _, vt = jnp.linalg.svd(k)
        v = jnp.swapaxes(vt, -1, -2)
        det = jnp.linalg.det(jnp.einsum("bij,bkj->bik", u, v))  # det(U V^T)
        z = jnp.broadcast_to(jnp.eye(3), u.shape).at[:, -1, -1].multiply(det)
        r = jnp.einsum("bij,bjk,blk->bil", v, z, u)  # V Z U^T
        scale = jnp.einsum(
            "bii->b", jnp.einsum("bij,bjk->bik", r, k)) / (var1 + 1e-12)
    else:
        r, sv_trace = _umeyama_rotation(k)
        scale = sv_trace / (var1 + 1e-12)

    t = mu2 - scale[:, None, None] * jnp.einsum("bij,bnj->bni", r, mu1)
    return scale[:, None, None] * jnp.einsum("bij,bnj->bni", r, s1) + t


def mpjpe(pred: jax.Array, gt: jax.Array) -> jax.Array:
    """Mean per-joint position error per sample. (B, N, 3) -> (B,)."""
    return jnp.linalg.norm(pred - gt, axis=-1).mean(axis=-1)


def pa_mpjpe(pred: jax.Array, gt: jax.Array) -> jax.Array:
    """Procrustes-aligned MPJPE per sample."""
    return mpjpe(batch_similarity_align(pred, gt), gt)


def compute_mrrpe(
    root_left_pred, root_right_pred, root_left_gt, root_right_gt
) -> jax.Array:
    """Relative-root position error: || (l-r)_pred - (l-r)_gt ||. (B,)."""
    rel_pred = root_left_pred - root_right_pred
    rel_gt = root_left_gt - root_right_gt
    return jnp.linalg.norm(rel_pred - rel_gt, axis=-1)


def _nn_right_to_left(gt_right: jax.Array, gt_left: jax.Array):
    """For each right-hand vertex, nearest GT left-hand vertex (dist, idx)."""
    # (B, Vr, Vl) pairwise distances via the |a|^2 - 2ab + |b|^2 expansion.
    d2 = (
        jnp.sum(gt_right**2, -1)[:, :, None]
        - 2.0 * jnp.einsum("bnd,bmd->bnm", gt_right, gt_left)
        + jnp.sum(gt_left**2, -1)[:, None, :]
    )
    idx = jnp.argmin(d2, axis=-1)
    dist = jnp.sqrt(jnp.maximum(jnp.take_along_axis(d2, idx[..., None], -1)[..., 0], 0.0))
    return dist, idx


def compute_cdev(
    pred_left: jax.Array,
    pred_right: jax.Array,
    gt_left: jax.Array,
    gt_right: jax.Array,
    contact_thresh: float = 3e-3,
) -> jax.Array:
    """Contact deviation (m) per sample; NaN when no GT contact exists.

    For GT-contact vertex pairs (right vertex + nearest left vertex within
    3 mm), measures how far the *predicted* pair has drifted apart.
    """
    dist, idx = _nn_right_to_left(gt_right, gt_left)
    corres = jnp.take_along_axis(pred_left, idx[..., None], axis=1)
    disp = jnp.linalg.norm(corres - pred_right, axis=-1)  # (B, Vr)
    in_contact = dist <= contact_thresh
    num = jnp.sum(jnp.where(in_contact, disp, 0.0), axis=-1)
    den = jnp.sum(in_contact, axis=-1)
    return jnp.where(den > 0, num / jnp.maximum(den, 1), jnp.nan)


def two_hand_metrics(
    verts_pred: dict,
    verts_gt: dict,
    j_reg_21: dict,
    root_idx: int = 0,
    length_joints: tuple = (0, 1),
) -> dict:
    """Per-batch metric vectors matching the reference eval loop.

    Args:
      verts_pred / verts_gt: {'left','right'}: (B, 778, 3). GT in absolute
        (camera) frame; predictions in the network output frame.
      j_reg_21: {'left','right'}: (21, 778) regressors.
      root_idx / length_joints: metric convention.
        * default  — root = joint 0, length = |j1 - j0|
          (`apps/eval_interhand.py:323-351`)
        * newmpjpe — root_idx=9, length_joints=(0, 9): root = joint 9
          (middle MCP), length = |j9 - j0|
          (`apps/eval_interhand_newmpjpe.py:323-351`)

    Returns dict of per-sample vectors (B,), all in meters:
      ori_mpjpe/ori_mpvpe  — root-relative
      mpjpe/mpvpe          — additionally length-normalized
      pa_mpjpe/pa_mpvpe    — Procrustes-aligned
      mrrpe                — relative-root error
      cdev                 — contact deviation
      double_*             — two-hand-frame metrics (see double_metrics)
    """
    out = {}
    roots_pred, roots_gt = {}, {}
    j_pred_all, j_gt_all = {}, {}
    la, lb = length_joints
    for hand in ("left", "right"):
        jr = j_reg_21[hand]
        j_gt = jnp.einsum("jv,bvc->bjc", jr, verts_gt[hand])
        j_pred = jnp.einsum("jv,bvc->bjc", jr, verts_pred[hand])
        j_pred_all[hand], j_gt_all[hand] = j_pred, j_gt
        root_gt = j_gt[:, root_idx : root_idx + 1]
        root_pred = j_pred[:, root_idx : root_idx + 1]
        roots_pred[hand] = j_pred[:, root_idx]
        roots_gt[hand] = j_gt[:, root_idx]

        jr_gt = j_gt - root_gt
        vr_gt = verts_gt[hand] - root_gt
        jr_pred = j_pred - root_pred
        vr_pred = verts_pred[hand] - root_pred

        out[f"ori_mpjpe_{hand}"] = mpjpe(jr_pred, jr_gt)
        out[f"ori_mpvpe_{hand}"] = mpjpe(vr_pred, vr_gt)

        len_gt = jnp.linalg.norm(j_gt[:, lb] - j_gt[:, la], axis=-1)
        len_pred = jnp.linalg.norm(j_pred[:, lb] - j_pred[:, la], axis=-1)
        s = (len_gt / (len_pred + 1e-12))[:, None, None]
        out[f"mpjpe_{hand}"] = mpjpe(jr_pred * s, jr_gt)
        out[f"mpvpe_{hand}"] = mpjpe(vr_pred * s, vr_gt)

        out[f"pa_mpjpe_{hand}"] = pa_mpjpe(jr_pred, jr_gt)
        out[f"pa_mpvpe_{hand}"] = pa_mpjpe(vr_pred, vr_gt)

    out["mrrpe"] = compute_mrrpe(
        roots_pred["left"], roots_pred["right"],
        roots_gt["left"], roots_gt["right"],
    )
    out["cdev"] = compute_cdev(
        verts_pred["left"], verts_pred["right"],
        verts_gt["left"], verts_gt["right"],
    )
    out.update(double_metrics(
        verts_pred, verts_gt, j_pred_all, j_gt_all, root_idx=root_idx))
    return out


def double_metrics(
    verts_pred: dict,
    verts_gt: dict,
    j_pred: dict,
    j_gt: dict,
    root_idx: int = 0,
) -> dict:
    """Two-hand-frame ("double") metrics over the concatenated
    42-joint / 1556-vertex frame, both hands expressed relative to the
    RIGHT-hand root.

    Reference: `apps/eval_interhand.py:417-436` (accumulation) and
    `:539-552` (aggregation; per-sample Umeyama via `get_alignMesh`
    `:137-145`); root convention at `apps/eval_interhand_newmpjpe.py:419-436`
    (root = joint 9).

    Documented divergence: the reference's shipped accumulation multiplies
    the left-hand block by `length_left = pred_j[:, r:r+1] - root_pred`
    and `gt_length_left = gt_j[:, r:r+1] - gt_j[:, r:r+1]` — both
    *self-subtractions that are identically zero* (eval_interhand.py:423-425,
    newmpjpe:423-425), which silently zeroes the left half of the frame so
    the left hand never contributes. We implement the evident intent
    (left in the right-root frame; the `(x - r_root)/(trans+1e-8)*trans`
    normalization cancels to identity when the typo is corrected), which
    is also what the paper describes for interacting-hand metrics.
    """
    rr_pred = j_pred["right"][:, root_idx : root_idx + 1]
    rr_gt = j_gt["right"][:, root_idx : root_idx + 1]
    dj_pred = jnp.concatenate(
        [j_pred["left"] - rr_pred, j_pred["right"] - rr_pred], axis=1)
    dj_gt = jnp.concatenate(
        [j_gt["left"] - rr_gt, j_gt["right"] - rr_gt], axis=1)
    dv_pred = jnp.concatenate(
        [verts_pred["left"] - rr_pred, verts_pred["right"] - rr_pred], axis=1)
    dv_gt = jnp.concatenate(
        [verts_gt["left"] - rr_gt, verts_gt["right"] - rr_gt], axis=1)
    return {
        "double_mpjpe": mpjpe(dj_pred, dj_gt),
        "double_mpvpe": mpjpe(dv_pred, dv_gt),
        "double_pa_mpjpe": pa_mpjpe(dj_pred, dj_gt),
        "double_pa_mpvpe": pa_mpjpe(dv_pred, dv_gt),
    }


def nanmean(x: jax.Array) -> jax.Array:
    mask = ~jnp.isnan(x)
    return jnp.sum(jnp.where(mask, x, 0.0)) / jnp.maximum(mask.sum(), 1)
