"""MANO surface anchors + the reference's anchor-based contact search.

The reference's pose optimizer drives its contact loss through ~108
surface anchors per hand, recovered barycentrically from designated
triangles (`pose_data_optimize/manopth/manopth/anchorutils.py:38-65`),
and matches sub-hand anchors to main-hand anchors with
normal-compatibility gating + a cosine elasticity window + 4-nearest
re-matching (`batch_optimize_mocap_origin.py:62-132` `search_anchors`).

TPU-first re-design: the per-anchor python loops become one masked
(A_sub, A_main) distance matrix + `lax.top_k` — a single fused XLA
computation that jits into the optimizer loop.

Fidelity notes (vs the shipped reference assets):
  * `merged_vertex_assignment.txt` ships ALL-ZERO classes, so the
    class-compatibility logic (`check_contact_type`, the class-4 boost)
    degenerates to a uniform `elasti *= 0.3`; we reproduce that uniform
    factor and keep `classes` in the spec for converted real assets.
  * normals: per-anchor triangle normals; the sub hand's are negated
    (`update_scene`, `batch_optimize_mocap_origin.py:263-270`).
  * re-match hysteresis: with `prev_idx`, distances are evaluated only
    on the previously matched ids with a wider 0.02 radius (`:77-93`).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class AnchorSpec(NamedTuple):
    tri_idx: jax.Array   # (A, 3) int32 — vertex ids of the defining tri
    weights: jax.Array   # (A, 2) f32 — barycentric edge weights
    classes: jax.Array   # (A,) int32 — region class per anchor


def load_anchor_txt(anchor_dir: str) -> AnchorSpec:
    """Load the reference's anchor asset directory
    (face_vertex_idx.txt / anchor_weight.txt / merged_vertex_assignment.txt,
    `anchorutils.py:17-35`)."""
    import os

    tri = np.loadtxt(os.path.join(anchor_dir, "face_vertex_idx.txt"),
                     dtype=np.int64)
    w = np.loadtxt(os.path.join(anchor_dir, "anchor_weight.txt"))
    cls = np.loadtxt(os.path.join(anchor_dir, "merged_vertex_assignment.txt"),
                     dtype=np.int64)
    return AnchorSpec(jnp.asarray(tri, jnp.int32),
                      jnp.asarray(w, jnp.float32),
                      jnp.asarray(cls, jnp.int32))


def make_synthetic_anchors(faces: np.ndarray, verts: np.ndarray,
                           n_anchors: int = 108) -> AnchorSpec:
    """Deterministic anchors for the synthetic hand: `n_anchors` faces
    spread by farthest-point sampling over face centers, anchor at the
    centroid (weights 1/3, 1/3). Classes zero like the shipped asset."""
    faces = np.asarray(faces)
    verts = np.asarray(verts)
    centers = verts[faces].mean(axis=1)
    chosen = [0]
    d = np.linalg.norm(centers - centers[0], axis=-1)
    for _ in range(n_anchors - 1):
        nxt = int(np.argmax(d))
        chosen.append(nxt)
        d = np.minimum(d, np.linalg.norm(centers - centers[nxt], axis=-1))
    tri = faces[np.asarray(chosen)]
    w = np.full((n_anchors, 2), 1.0 / 3.0, np.float32)
    return AnchorSpec(jnp.asarray(tri, jnp.int32), jnp.asarray(w),
                      jnp.zeros((n_anchors,), jnp.int32))


def recover_anchors(verts: jax.Array, spec: AnchorSpec) -> jax.Array:
    """(V, 3) -> (A, 3): o + w1*(v1-o) + w2*(v2-o) (`recover_anchor`)."""
    tri = verts[spec.tri_idx]  # (A, 3, 3)
    o = tri[:, 0]
    return (o + spec.weights[:, 0:1] * (tri[:, 1] - o)
            + spec.weights[:, 1:2] * (tri[:, 2] - o))


def anchor_normals(verts: jax.Array, spec: AnchorSpec,
                   flip: bool = False) -> jax.Array:
    """Unit normal of each anchor's defining triangle; `flip` for the sub
    hand (the reference negates its normals)."""
    tri = verts[spec.tri_idx]
    n = jnp.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    n = n / (jnp.linalg.norm(n, axis=-1, keepdims=True) + 1e-12)
    return -n if flip else n


class AnchorMatch(NamedTuple):
    idx: jax.Array       # (A_sub, K) matched main-anchor ids
    elasti: jax.Array    # (A_sub, K) cosine-window elasticity (masked)
    mask: jax.Array      # (A_sub, K) f32 validity
    vertex_contact: jax.Array  # (A_sub,) f32 any-contact flag


_BIG = 1e3


def search_anchor_pairs(
    main_anchors: jax.Array,
    sub_anchors: jax.Array,
    main_normals: jax.Array,
    sub_normals: jax.Array,
    radius: float = 0.015,
    k: int = 4,
    prev: AnchorMatch | None = None,
) -> AnchorMatch:
    """Jittable `search_anchors`: normal-gated K-nearest anchor matching.

    Pairs whose normals are not opposed (dot > -0.6) are excluded; pairs
    within `radius` get elasticity 0.5*cos(pi*d/radius)+0.5; the K nearest
    per sub anchor are kept. With `prev`, only previously matched ids are
    considered at the wider 0.02 hysteresis radius, keeping the pairing
    stable across re-optimization attempts.
    """
    d = jnp.linalg.norm(
        sub_anchors[:, None, :] - main_anchors[None, :, :], axis=-1)
    if prev is not None:
        radius = 0.02
        idx = prev.idx
        dk = jnp.take_along_axis(d, idx, axis=1)
        # only previously valid pairings participate (`:77-93` keeps
        # dis=1000 everywhere except prev ids != -1)
        dk = jnp.where(prev.mask > 0, dk, _BIG)
    else:
        against = jnp.einsum("ad,bd->ab", sub_normals, main_normals) > -0.6
        d = jnp.where(against, _BIG, d)
        neg, idx = jax.lax.top_k(-d, k)
        dk = -neg
    contact_able = dk < radius
    elasti = jnp.where(
        contact_able, 0.5 * jnp.cos(jnp.pi * dk / radius) + 0.5, 0.0)
    # shipped reference classes are all zero -> uniform 0.3 factor
    # (`batch_optimize_mocap_origin.py:131`)
    elasti = elasti * 0.3
    mask = (elasti > 0.0).astype(jnp.float32)
    vertex_contact = (mask.sum(-1) > 0).astype(jnp.float32)
    return AnchorMatch(idx=idx, elasti=elasti, mask=mask,
                       vertex_contact=vertex_contact)


def anchor_contact_loss(verts_main: jax.Array, verts_sub: jax.Array,
                        spec_main: AnchorSpec, spec_sub: AnchorSpec,
                        match: AnchorMatch) -> jax.Array:
    """`FieldLoss.batch_contact_loss`: sum(e * ||sub_a - main_a[idx]||^2)
    / max(sum(mask), 1), with anchors recovered from the LIVE vertices so
    gradients flow into both hands."""
    a_main = recover_anchors(verts_main, spec_main)
    a_sub = recover_anchors(verts_sub, spec_sub)
    diff = a_sub[:, None, :] - a_main[match.idx]  # (A_sub, K, 3)
    per = jnp.sum(diff * diff, axis=-1)
    return jnp.sum(match.elasti * match.mask * per) / jnp.maximum(
        match.mask.sum(), 1.0)
