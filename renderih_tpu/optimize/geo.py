"""Two-hand pose refinement: contact + anti-penetration optimization.

TPU-native equivalent of the reference's offline pose-optimization
toolchain (`pose_data_optimize/hocontact/postprocess/
geo_optimizer_both_batch.py` + `geo_loss.py` + the CUDA SDF): given two
MANO parameter sets (e.g. from random augmentation), refine them so the
hands stay in contact without interpenetration while preserving pose
plausibility. Loss terms mirror the reference:

  * contact: attract matched anchor pairs (`FieldLoss.contact_loss`).
  * repulsion: exponential penalty for hand-B vertices behind hand-A's
    surface along its normals (`FieldLoss.repulsion_loss`).
  * SDF anti-penetration: `ops/sdf.sdf_penetration_loss` (CUDA `NewLoss`).
  * edge preservation (`HandLoss.edge_len_loss`).
  * pose/shape regularization toward the initialization
    (`HandLoss.pose_reg_loss` / `shape_reg_loss`).
  * per-joint rotation-angle limit (`HandLoss.rotation_angle_loss`).
  * optional naturalness prior via `pose_prior_fn` — the reference scores
    augmented poses with a pretrained 2D-pose GAN discriminator
    (`pose_data_optimize/Ver2Code/Discriminator/discrim.py:66-105`, whose
    weights are not shipped); we accept any differentiable
    `pose_aa -> scalar` callable instead. `make_gaussian_pose_prior`
    builds the analytic equivalent (Mahalanobis energy under a fitted
    Gaussian of plausible poses).

The optimizer is Adam over (pose, shape, trans) of both hands in one
jitted `lax.fori_loop` — the reference's 2500-iteration python loop
becomes a single XLA computation. Pose is axis-angle (we regularize in
axis-angle space rather than the reference's quaternion parametrization;
same constraint surface, simpler geometry on TPU).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from renderih_tpu.assets import Assets
from renderih_tpu.mano.layer import mano_forward
from renderih_tpu.ops.rotation import rodrigues
from renderih_tpu.ops.sdf import sdf_penetration_loss


class GeoWeights(NamedTuple):
    contact: float = 10.0      # reference: contact x 10
    repulsion: float = 0.5     # reference: repulsion x 0.5
    sdf: float = 100.0
    edge: float = 100.0
    pose_reg: float = 1.0
    shape_reg: float = 0.1
    angle_limit: float = 10.0
    prior: float = 0.01        # naturalness prior (pose_prior_fn) weight


def anchor_pairs(verts_a: jax.Array, verts_b: jax.Array,
                 thresh: float = 0.01) -> tuple[jax.Array, jax.Array]:
    """For each A-vertex, its nearest B-vertex + a contact weight.

    Equivalent of `search_anchors` (`batch_optimize_mocap_origin.py:62-132`)
    in its effect: pairs closer than `thresh` get elasticity weight 1, the
    rest 0. Returns (idx_b (V,), weight (V,)).
    """
    d2 = (
        jnp.sum(verts_a**2, -1)[:, None]
        - 2.0 * verts_a @ verts_b.T
        + jnp.sum(verts_b**2, -1)[None, :]
    )
    idx = jnp.argmin(d2, axis=-1)
    dist = jnp.sqrt(jnp.maximum(jnp.take_along_axis(d2, idx[:, None], 1)[:, 0], 0))
    return idx, (dist < thresh).astype(jnp.float32)


def contact_loss(verts_a, verts_b, idx_b, weight) -> jax.Array:
    """Attract matched pairs: mean_w ||v_a - v_b[idx]||^2."""
    diff = verts_a - verts_b[idx_b]
    per = jnp.sum(diff * diff, -1)
    return jnp.sum(weight * per) / jnp.maximum(weight.sum(), 1.0)


def _vertex_normals(verts, faces):
    tri = verts[faces]
    fn = jnp.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    vn = jnp.zeros_like(verts)
    for i in range(3):
        vn = vn.at[faces[:, i]].add(fn)
    return vn / (jnp.linalg.norm(vn, axis=-1, keepdims=True) + 1e-9)


def repulsion_loss(verts_a, faces_a, verts_b, constant: float = 0.05,
                   threshold: float = 0.015) -> jax.Array:
    """Push B-vertices out along A's surface normals.

    For each B-vertex, the offset to its nearest A-vertex dotted with A's
    normal; negative inner product (= behind the surface) is penalized via
    exp^2 with clamping, as in `FieldLoss.repulsion_loss`.
    """
    idx_a, _ = anchor_pairs(verts_b, verts_a, thresh=jnp.inf)
    normals_a = _vertex_normals(verts_a, faces_a)
    offset = verts_b - verts_a[idx_a]
    inner = jnp.sum(offset * normals_a[idx_a], -1)
    val = constant * jnp.exp(jnp.clip(-inner, -threshold, threshold)) ** 2
    return jnp.sum(val)


def edge_preserve_loss(verts, faces, ref_edge_len) -> jax.Array:
    tri = verts[faces]
    e = jnp.stack([tri[:, 0] - tri[:, 1], tri[:, 1] - tri[:, 2],
                   tri[:, 2] - tri[:, 0]], 1)
    length = jnp.sqrt(jnp.sum(e * e, -1) + 1e-12)
    return jnp.mean((length - ref_edge_len) ** 2)


def pose_angle_limit_loss(pose_aa: jax.Array,
                          limit: float = jnp.pi / 2) -> jax.Array:
    """Penalize per-joint rotation angles beyond `limit`
    (`HandLoss.rotation_angle_loss`)."""
    angles = jnp.sqrt(
        jnp.sum(pose_aa.reshape(-1, 3) ** 2, -1) + 1e-12
    )
    return jnp.sum(jnp.maximum(angles - limit, 0.0) ** 2)


def make_gaussian_pose_prior(poses_aa: jax.Array, eps: float = 1e-3):
    """Fit a Gaussian to a (N, 45) set of plausible poses; return a
    differentiable energy `pose_aa -> scalar` (Mahalanobis distance).

    Analytic stand-in for the reference's GAN-discriminator naturalness
    score — monotone in implausibility, zero-gradient at the mean pose.
    """
    mean = jnp.mean(poses_aa, axis=0)
    centered = poses_aa - mean
    cov = centered.T @ centered / max(len(poses_aa) - 1, 1)
    prec = jnp.linalg.inv(cov + eps * jnp.eye(cov.shape[0]))

    def prior(pose_aa: jax.Array) -> jax.Array:
        d = pose_aa - mean
        return d @ prec @ d

    return prior


def make_gan_pose_prior(params):
    """Trained-discriminator naturalness energy (reference
    `pose_data_optimize/Ver2Code/Discriminator/discrim.py:66-105` — the
    reference ships only the architecture; the weights come from
    `tools/train_pose_prior.py`, trained real-vs-randomized on the
    synthetic plausible-pose corpus).

    Returns a differentiable energy `pose_aa (45,) -> scalar`: softplus
    of the negated realism logits, so plausible poses sit near zero and
    gradients always point toward higher realism.
    """
    from renderih_tpu.models.aux_nets import PoseDiscriminator
    from renderih_tpu.ops.rotation import rodrigues

    disc = PoseDiscriminator()

    def prior(pose_aa: jax.Array) -> jax.Array:
        rotmats = rodrigues(pose_aa.reshape(1, 15, 3))
        per_joint, overall = disc.apply({"params": params}, rotmats)
        logit = per_joint.mean() + overall.mean()
        return jax.nn.softplus(-logit)

    return prior


def save_pose_prior(params, path: str) -> None:
    """Flatten discriminator params into an npz artifact."""
    flat = {}

    def walk(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(f"{prefix}/{k}" if prefix else k, v)
        else:
            flat[prefix] = np.asarray(node)

    walk("", params)
    np.savez(path, **flat)


def load_pose_prior(path: str):
    """Load an npz artifact back into the nested flax params dict."""
    flat = np.load(path)
    params: dict = {}
    for key in flat.files:
        node = params
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(flat[key])
    return params


class HandVars(NamedTuple):
    pose: jax.Array     # (45,) axis-angle
    shape: jax.Array    # (10,)
    trans: jax.Array    # (3,)
    root_aa: jax.Array  # (3,)


# (repulsion_mult, contact_mult, n_iter) per attempt; anchors re-searched
# fresh before attempts 0 and 3, hysteresis-rechecked before 1 and 2
# (`batch_optimize_mocap_origin.py:460-506`).
REFERENCE_SCHEDULE = ((1.0, 1.0, 50), (0.1, 15.0, 40),
                      (30.0, 0.1, 75), (1.0, 5.0, 50))


def optimize_two_hands(
    assets: Assets,
    left: HandVars,
    right: HandVars,
    n_iter: int = 300,
    lr: float = 1e-2,
    weights: GeoWeights = GeoWeights(),
    sdf_grid_size: int = 24,
    pose_prior_fn=None,
    anchors=None,
    schedule=None,
):
    """Jointly refine both hands. Returns (left', right', final_losses).

    `pose_prior_fn`: optional differentiable naturalness energy
    `(45,) axis-angle -> scalar`, weighted by `weights.prior` (see
    `make_gaussian_pose_prior`).

    `anchors`: optional (AnchorSpec_left, AnchorSpec_right) — switches the
    contact term to the reference's anchor-based contact search
    (`optimize/anchors.py`): right hand is the main hand, left the sub
    hand, matched by normal-gated 4-NN with cosine elasticity. With
    `schedule` (default REFERENCE_SCHEDULE when anchors are given), runs
    the reference's 4-attempt coefficient schedule with fresh anchor
    re-search before attempts 0/3 and hysteresis re-matching before 1/2.
    """
    faces_l = assets.left.mano.faces
    faces_r = assets.right.mano.faces

    def fwd(model, hv: HandVars):
        v, j = mano_forward(
            model, rodrigues(hv.root_aa[None]), hv.pose[None],
            hv.shape[None], trans=hv.trans[None], center_idx=None,
            use_pca=False,
        )
        return v[0], j[0]

    v_l0, _ = fwd(assets.left.mano, left)
    v_r0, _ = fwd(assets.right.mano, right)

    def edge_len(verts, faces):
        tri = verts[faces]
        e = jnp.stack([tri[:, 0] - tri[:, 1], tri[:, 1] - tri[:, 2],
                       tri[:, 2] - tri[:, 0]], 1)
        return jnp.sqrt(jnp.sum(e * e, -1) + 1e-12)

    ref_edge_l = edge_len(v_l0, faces_l)
    ref_edge_r = edge_len(v_r0, faces_r)
    # vertex-pair fallback contact, fixed from the initial configuration
    idx_lr, w_lr = anchor_pairs(v_l0, v_r0, thresh=0.01)

    if anchors is not None:
        from renderih_tpu.optimize.anchors import (
            anchor_contact_loss,
            anchor_normals,
            recover_anchors,
            search_anchor_pairs,
        )

        spec_l, spec_r = anchors

        def match_fn(params, prev=None):
            l, r = params
            v_l, _ = fwd(assets.left.mano, l)
            v_r, _ = fwd(assets.right.mano, r)
            return search_anchor_pairs(
                recover_anchors(v_r, spec_r),            # main = right
                recover_anchors(v_l, spec_l),            # sub = left
                anchor_normals(v_r, spec_r),
                anchor_normals(v_l, spec_l, flip=True),
                prev=prev,
            )
    else:
        match_fn = None

    init = (left, right)

    def loss_fn(params, match=None, contact_mult=1.0, repulsion_mult=1.0):
        l, r = params
        v_l, _ = fwd(assets.left.mano, l)
        v_r, _ = fwd(assets.right.mano, r)

        if match is not None:
            contact = anchor_contact_loss(v_r, v_l, spec_r, spec_l, match)
        else:
            contact = contact_loss(v_l, v_r, idx_lr, w_lr)
        terms = {
            "contact": contact,
            "repulsion": repulsion_loss(v_l, faces_l, v_r)
            + repulsion_loss(v_r, faces_r, v_l),
            "sdf": sdf_penetration_loss(
                v_l[None], v_r[None], faces_l, grid_size=sdf_grid_size
            )
            + sdf_penetration_loss(
                v_r[None], v_l[None], faces_r, grid_size=sdf_grid_size
            ),
            "edge": edge_preserve_loss(v_l, faces_l, ref_edge_l)
            + edge_preserve_loss(v_r, faces_r, ref_edge_r),
            "pose_reg": jnp.sum((l.pose - left.pose) ** 2)
            + jnp.sum((r.pose - right.pose) ** 2),
            "shape_reg": jnp.sum((l.shape - left.shape) ** 2)
            + jnp.sum((r.shape - right.shape) ** 2),
            "angle": pose_angle_limit_loss(l.pose)
            + pose_angle_limit_loss(r.pose),
        }
        if pose_prior_fn is not None:
            terms["prior"] = pose_prior_fn(l.pose) + pose_prior_fn(r.pose)
        total = (
            weights.contact * contact_mult * terms["contact"]
            + weights.repulsion * repulsion_mult * terms["repulsion"]
            + weights.sdf * terms["sdf"]
            + weights.edge * terms["edge"]
            + weights.pose_reg * terms["pose_reg"]
            + weights.shape_reg * terms["shape_reg"]
            + weights.angle_limit * terms["angle"]
            + (weights.prior * terms["prior"]
               if pose_prior_fn is not None else 0.0)
        )
        return total, terms

    tx = optax.adam(lr)

    @jax.jit
    def run(params):
        opt_state = tx.init(params)

        def body(_, carry):
            params, opt_state = carry
            (_, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state

        params, _ = jax.lax.fori_loop(0, n_iter, body, (params, opt_state))
        _, terms = loss_fn(params)
        return params, terms

    if match_fn is None:
        (left_out, right_out), terms = run(init)
        return left_out, right_out, terms

    # anchor mode: 4-attempt coefficient schedule; n_iter/multipliers are
    # traced scalars so the whole schedule reuses ONE compiled step loop
    @jax.jit
    def run_anchored(params, match, contact_mult, repulsion_mult, iters):
        opt_state = tx.init(params)

        def body(_, carry):
            params, opt_state = carry
            (_, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, match, contact_mult, repulsion_mult)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state

        params, _ = jax.lax.fori_loop(0, iters, body, (params, opt_state))
        _, terms = loss_fn(params, match, contact_mult, repulsion_mult)
        return params, terms

    match_fresh = jax.jit(match_fn)
    match_prev = jax.jit(lambda p, prev: match_fn(p, prev))

    params = init
    match = None
    terms = None
    sched = schedule if schedule is not None else REFERENCE_SCHEDULE
    for attempt, (rep_mult, con_mult, iters) in enumerate(sched):
        if attempt in (0, 3) or match is None:
            match = match_fresh(params)
        else:
            match = match_prev(params, match)
        params, terms = run_anchored(
            params, match,
            jnp.asarray(con_mult, jnp.float32),
            jnp.asarray(rep_mult, jnp.float32),
            jnp.asarray(iters, jnp.int32))
    left_out, right_out = params
    return left_out, right_out, terms
