"""Two-hand mesh supervision (pure JAX).

Parity target: `GraphLoss` / `calc_loss_GCN` in the reference
(`core/Loss.py:20-277`) — the same loss terms, semantics and default
weights, expressed as pure functions over the decoder output:

  * vert2d: MSE on pixels normalized to [-1, 1] (/img_size*2-1).
  * vert3d + regressed-joint: SmoothL1 (beta=1, torch default).
  * face-normal: |cos| between predicted edges and GT face normals.
  * edge length: SmoothL1 on per-edge lengths.
  * coarse multi-level: per-stage SmoothL1/MSE against avg-pool-downsampled
    GT vertices in the GCN layout.
  * upsample-weight anchor: SmoothL1 between the learned 252->778 weight
    and its initializer.
  * right-hand GT is shifted by `root_rel` before supervision
    (`core/Loss.py:213-214`) so the prediction carries the inter-hand
    offset.

Everything is batched over both hands by stacking along a leading axis —
one kernel for L+R rather than two calls.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from renderih_tpu.graph.ops import graph_pool_avg, vert_to_gcn


class GraphLossWeights(NamedTuple):
    label_3d: float = 100.0
    label_2d: float = 50.0
    normal: float = 10.0
    edge: float = 2000.0
    norm_epoch: int = 50
    upsample: float = 1.0
    # Epoch before which the normal loss is OFF (0 = always on, the
    # reference behavior - its normal term is ungated, `core/Loss.py:262`).
    # From-scratch divergence lever: normalized-edge directions have
    # ~1/|e| gradient amplification, and early training's shrunken
    # predicted mesh turns the normal term into a firehose of
    # degenerate-geometry gradient noise that can drown the image-
    # conditioning signal (round-5 probe bisect: the 2D-only and
    # 2D+3D-Huber probes learn; every run with the normal term on from
    # step 0 collapsed to the mean pose).
    normal_epoch: int = 0
    # Direct camera supervision (0 = off = reference parity; the
    # reference supervises the camera only through vert2d). From-scratch
    # divergence lever for the scale->0 attractor documented in
    # runs/convergence_r5/RECEIPT.md: with a shrunken mesh the 2D loss
    # degenerates to hand-center matching and the predicted scale
    # collapses. The GT camera needs no stored labels - labels are
    # exactly self-consistent, so the per-sample (scale, trans) is
    # recovered in closed form from (v3d, v2d) by least squares
    # (`fit_orthographic_cam`), which survives any label-preserving
    # augmentation including flips.
    camera: float = 0.0


def smooth_l1(pred: jax.Array, target: jax.Array, beta: float = 1.0) -> jax.Array:
    """torch.nn.SmoothL1Loss with reduction='mean'."""
    d = jnp.abs(pred - target)
    loss = jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)
    return loss.mean()


def _safe_norm(x: jax.Array, axis: int = -1, keepdims: bool = False,
               eps: float = 1e-12) -> jax.Array:
    """sqrt(sum(x^2) + eps): well-defined gradient at ||x|| = 0.

    Plain `jnp.linalg.norm` has a NaN gradient at exactly zero, which real
    training hits (e.g. coincident predicted vertices make zero-length
    edges) — the NaN then poisons the whole step even through
    zero-weighted terms.
    """
    return jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=keepdims) + eps)


def fit_orthographic_cam(v3d: jax.Array, v2d: jax.Array,
                         img_size: float) -> tuple[jax.Array, jax.Array]:
    """Per-sample closed-form orthographic camera from consistent labels.

    Solves min_{s,t} || s*S*xy + (t*S/2 + S/2) - uv ||^2 (the projection
    family of `ops/projection.orthographic_project`): scalar scale from
    the covariance/variance ratio of centered xy vs centered uv, trans
    from the means. Exact (zero residual) whenever v2d really is an
    orthographic projection of v3d - which `tools/inspect_synth.py`
    verifies holds for the synthetic data through every augmentation.

    Args: v3d (B, V, 3), v2d (B, V, 2). Returns (scale (B,), trans (B, 2)).
    """
    xy = v3d[..., :2]
    xym = xy - xy.mean(axis=-2, keepdims=True)
    uvm = v2d - v2d.mean(axis=-2, keepdims=True)
    s_pix = (jnp.sum(xym * uvm, axis=(-2, -1))
             / jnp.maximum(jnp.sum(xym * xym, axis=(-2, -1)), 1e-12))
    scale = s_pix / img_size
    c = v2d.mean(axis=-2) - s_pix[..., None] * xy.mean(axis=-2)
    trans = (c - img_size / 2.0) / (img_size / 2.0)
    return scale, trans


def _face_edges(verts: jax.Array, faces: jax.Array) -> jax.Array:
    """(..., V, 3), (F, 3) -> (..., F, 3 edges, 3) edge vectors."""
    tri = verts[..., faces, :]  # (..., F, 3, 3)
    e0 = tri[..., 0, :] - tri[..., 1, :]
    e1 = tri[..., 1, :] - tri[..., 2, :]
    e2 = tri[..., 2, :] - tri[..., 0, :]
    return jnp.stack([e0, e1, e2], axis=-2)


def normal_loss(verts_pred: jax.Array, verts_gt: jax.Array,
                faces: jax.Array) -> jax.Array:
    """SmoothL1 of |cos| between predicted edges and GT face normals."""
    edge_gt = _face_edges(verts_gt, faces)
    edge_pred = _face_edges(verts_pred, faces)
    n_gt = jnp.cross(edge_gt[..., 0, :], edge_gt[..., 1, :])
    n_gt = n_gt / _safe_norm(n_gt, axis=-1, keepdims=True)
    e_pred = edge_pred / _safe_norm(edge_pred, axis=-1, keepdims=True)
    cos = jnp.einsum("...ed,...d->...e", e_pred, n_gt)
    return smooth_l1(cos, jnp.zeros_like(cos))


def edge_length_loss(verts_pred: jax.Array, verts_gt: jax.Array,
                     faces: jax.Array) -> jax.Array:
    len_gt = _safe_norm(_face_edges(verts_gt, faces), axis=-1)
    len_pred = _safe_norm(_face_edges(verts_pred, faces), axis=-1)
    return smooth_l1(len_pred, len_gt)


def mesh_downsample(feat: jax.Array, p: int = 2) -> jax.Array:
    return graph_pool_avg(feat, p)


def _norm2d(x: jax.Array, img_size: float) -> jax.Array:
    return x / img_size * 2.0 - 1.0


def _single_hand_loss(
    v3d_pred, v2d_pred, v3d_gt, v2d_gt, j_reg_21, faces, img_size
) -> dict:
    j_pred = jnp.einsum("jv,bvc->bjc", j_reg_21, v3d_pred)
    j_gt = jnp.einsum("jv,bvc->bjc", j_reg_21, v3d_gt)
    return {
        "vert2d": jnp.mean((_norm2d(v2d_pred, img_size) - _norm2d(v2d_gt, img_size)) ** 2),
        "vert3d": smooth_l1(v3d_pred, v3d_gt),
        # Diagnostic only (not in `total`): the same 3D error in
        # physical units. smooth_l1's quadratic region makes `vert3d`
        # ~0.5*err^2 for sub-meter errors — a 100 mm/coord error reads
        # as 0.005 and was once misread as convergence. This is the
        # number to watch.
        "vert3d_mm": 1000.0 * jnp.mean(_safe_norm(v3d_pred - v3d_gt)),
        "joint": smooth_l1(j_pred, j_gt),
        "normal": normal_loss(v3d_pred, v3d_gt, faces),
        "edge": edge_length_loss(v3d_pred, v3d_gt, faces),
    }


def _coarse_losses(
    coarse3d_list, coarse2d_list, v3d_gt, v2d_gt, perm, img_size, num_levels=5
):
    """Match each predicted coarse level against pooled GT by node count."""
    v3d_gcn = vert_to_gcn(v3d_gt, perm)
    v2d_gcn = vert_to_gcn(v2d_gt, perm)
    gt3d_by_count = {}
    gt2d_by_count = {}
    for level in range(num_levels):
        gt3d_by_count[v3d_gcn.shape[1]] = v3d_gcn
        gt2d_by_count[v2d_gcn.shape[1]] = v2d_gcn
        if level < num_levels - 1:
            v3d_gcn = mesh_downsample(v3d_gcn)
            v2d_gcn = mesh_downsample(v2d_gcn)

    l3d, l2d = [], []
    for p3d, p2d in zip(coarse3d_list, coarse2d_list):
        g3d = gt3d_by_count[p3d.shape[1]]
        g2d = gt2d_by_count[p2d.shape[1]]
        l3d.append(smooth_l1(p3d, g3d))
        l2d.append(jnp.mean((_norm2d(p2d, img_size) - _norm2d(g2d, img_size)) ** 2))
    return l3d, l2d


def two_hand_graph_loss(
    out,                      # DecoderOutput
    batch: dict,              # v3d/v2d/j3d/j2d per hand + root_rel
    assets,                   # Assets (left/right HandAssets)
    epoch: jax.Array | int,
    weights: GraphLossWeights = GraphLossWeights(),
    upsample_weight: jax.Array | None = None,
    img_size: float = 256.0,
):
    """Total training loss + per-term dict.

    `batch` keys: 'v3d_left', 'v2d_left', 'v3d_right', 'v2d_right',
    'root_rel' (B, 3). Right-hand GT is expressed root-relative and gets
    `root_rel` added, as in `calc_loss_GCN` (`core/Loss.py:213-214`).
    """
    v3d_gt = {
        "left": batch["v3d_left"],
        "right": batch["v3d_right"] + batch["root_rel"][:, None, :],
    }
    v2d_gt = {"left": batch["v2d_left"], "right": batch["v2d_right"]}

    terms = {}
    coarse3d_terms, coarse2d_terms = [], []
    for hand, hand_assets in (("left", assets.left), ("right", assets.right)):
        h = _single_hand_loss(
            out.verts3d[hand], out.verts2d[hand],
            v3d_gt[hand], v2d_gt[hand],
            hand_assets.j_reg_21, hand_assets.mano.faces, img_size,
        )
        for k, v in h.items():
            terms[k] = terms.get(k, 0.0) + 0.5 * v
        c3d, c2d = _coarse_losses(
            out.coarse_verts3d[hand], out.coarse_verts2d[hand],
            v3d_gt[hand], v2d_gt[hand], hand_assets.perm, img_size,
        )
        if not coarse3d_terms:
            coarse3d_terms = [0.5 * x for x in c3d]
            coarse2d_terms = [0.5 * x for x in c2d]
        else:
            coarse3d_terms = [a + 0.5 * b for a, b in zip(coarse3d_terms, c3d)]
            coarse2d_terms = [a + 0.5 * b for a, b in zip(coarse2d_terms, c2d)]

    if upsample_weight is not None:
        terms["upsample_norm"] = smooth_l1(
            upsample_weight, assets.left.upsample_init
        )
    else:
        terms["upsample_norm"] = jnp.zeros(())

    # Direct camera supervision (off at weight 0 = reference parity):
    # GT (scale, trans) recovered per sample from the labels themselves.
    if weights.camera > 0.0:
        cam = 0.0
        for hand in ("left", "right"):
            s_gt, t_gt = fit_orthographic_cam(
                v3d_gt[hand], v2d_gt[hand], img_size)
            cam = cam + 0.5 * (
                jnp.mean((out.scale[hand] - s_gt) ** 2)
                + jnp.mean((out.trans2d[hand] - t_gt) ** 2))
        terms["camera"] = cam
    else:
        terms["camera"] = jnp.zeros(())

    # Edge loss gated by epoch (reference alpha, `core/Loss.py:251`);
    # normal optionally gated too (normal_epoch, from-scratch lever).
    alpha = jnp.where(jnp.asarray(epoch) < weights.norm_epoch, 0.0, 1.0)
    alpha_n = jnp.where(jnp.asarray(epoch) < weights.normal_epoch, 0.0, 1.0)

    total = (
        weights.label_3d * terms["vert3d"]
        + weights.label_2d * terms["vert2d"]
        + weights.label_3d * terms["joint"]
        + alpha_n * weights.normal * terms["normal"]
        + alpha * weights.edge * terms["edge"]
        + weights.upsample * terms["upsample_norm"]
        + weights.camera * terms["camera"]
    )
    for l3, l2 in zip(coarse3d_terms, coarse2d_terms):
        total = total + weights.label_3d * l3 + weights.label_2d * l2

    terms["coarse3d"] = sum(coarse3d_terms)
    terms["coarse2d"] = sum(coarse2d_terms)
    terms["total"] = total
    return total, terms


def aux_losses(aux: dict, batch: dict, w_mask: float = 500.0,
               w_dense: float = 30.0, w_hms: float = 100.0) -> dict:
    """Auxiliary head supervision (`calc_aux_loss`, `core/Loss.py:180-198`).

    Expects targets in `batch`: 'hms' (B, 64, 64, 42), 'mask' (B, 64, 64),
    'dense' (B, 64, 64, 6). Disabled in the flagship recipe; weights match
    `LOSS_WEIGHT.AUX` (`utils/defaults.yaml:51-54`).
    """
    terms = {}
    total = 0.0
    if "mask" in batch and aux.get("mask") is not None:
        terms["mask"] = smooth_l1(aux["mask"], batch["mask"], beta=0.05)
        total = total + w_mask * terms["mask"]
    if "dense" in batch and aux.get("dense") is not None:
        pred, tgt = aux["dense"], batch["dense"]
        # Per-hand gating: each hand's 3 dense channels are supervised
        # only inside that hand's own silhouette. The reference intends
        # this (`core/Loss.py:186-189` slices mask[:, :1]/mask[:, 1:]) but
        # its predicted mask is (B, H, W) so the slicing takes rows and
        # the whole aux path is dead there (`core/Loss.py:210`); we
        # implement the intent with per-hand target masks, falling back
        # to the combined silhouette when only that is available.
        m_l = batch.get("mask_left", batch.get("mask"))
        m_r = batch.get("mask_right", batch.get("mask"))
        if m_l is not None:
            d_l = smooth_l1(pred[..., :3] * m_l[..., None],
                            tgt[..., :3] * m_l[..., None], beta=0.05)
            d_r = smooth_l1(pred[..., 3:] * m_r[..., None],
                            tgt[..., 3:] * m_r[..., None], beta=0.05)
            terms["dense"] = 0.5 * (d_l + d_r)
        else:
            terms["dense"] = smooth_l1(pred, tgt, beta=0.05)
        total = total + w_dense * terms["dense"]
    if "hms" in batch and aux.get("hms") is not None:
        terms["hms"] = jnp.mean((aux["hms"] - batch["hms"]) ** 2)
        total = total + w_hms * terms["hms"]
    terms["total"] = total
    return terms
