"""MANO model parameters: loading, conversion, and synthetic fixtures.

The official MANO pickles (MANO_LEFT.pkl / MANO_RIGHT.pkl) are distributed
under the MPI license and are *not* shipped with this repo (nor with the
reference). Users convert them once with `convert_mano_pkl` into a plain
`.npz`; everything downstream consumes the npz.

For tests and benchmarks we provide `make_synthetic_mano`: a deterministic
random hand model with the *exact* MANO shapes (778 verts, 16-joint tree,
45-dim PCA pose space, convex-hull triangulation with ~1540 faces) so that
every downstream component — kinematics, skinning, graph coarsening,
losses, renderer — runs with production shapes without the licensed asset.

Reference behaviours reproduced here:
  * chumpy `shapedirs` unwrap (`models/manolayer.py:7-17`).
  * the left-hand `shapedirs[:, 0, :] *= -1` sign fix, which the reference
    applies as a *stateful mutation* at dataset-construction time
    (`dataset/interhand.py:22-25`); here it is an explicit, pure load-time
    transform (`fix_left_shapedirs`).
  * fingertip vertex ids + 21-joint reorder (`models/manolayer.py:110-115,
    296-299`).
"""

from __future__ import annotations

import pickle
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# Kinematic tree: 16 joints (root + 3 per finger x 5). Same layout as the
# MANO kintree_table (reference `models/manolayer.py:150-152`).
MANO_PARENTS: tuple = (-1, 0, 1, 2, 0, 4, 5, 0, 7, 8, 0, 10, 11, 0, 13, 14)

# Joints grouped by depth in the tree; each level's parents are the whole
# previous level. This is what lets us compose the SE(3) chain with three
# batched (B, 5, 4, 4) matmuls instead of a 16-step sequential loop.
KINEMATIC_LEVELS: tuple = ((1, 4, 7, 10, 13), (2, 5, 8, 11, 14), (3, 6, 9, 12, 15))

# Fingertip vertices appended after the 16 skeleton joints
# (reference `models/manolayer.py:296`).
TIP_VERTEX_IDS: tuple = (745, 317, 444, 556, 673)

# Reorder (16 joints + 5 tips) into the 21-joint convention used by the
# whole pipeline (reference `models/manolayer.py:110-115`).
NEW_JOINT_ORDER: tuple = (
    0,
    13, 14, 15, 16,
    1, 2, 3, 17,
    4, 5, 6, 18,
    10, 11, 12, 19,
    7, 8, 9, 20,
)

NUM_VERTS = 778
NUM_JOINTS = 21
NUM_SKEL_JOINTS = 16
NUM_POSE_DIMS = 45  # 15 joints x 3 (axis-angle), root handled separately.


class ManoModel(NamedTuple):
    """MANO parameters as a pytree of arrays.

    All fields are jnp arrays so the model can live on device and be a
    closure constant of jitted functions. `faces` is int32 and only used
    for losses/rendering, never for autodiff.
    """

    v_template: jax.Array        # (778, 3)
    shapedirs: jax.Array         # (778, 3, 10)
    posedirs: jax.Array          # (778, 3, 135)
    J_regressor: jax.Array       # (16, 778) dense
    weights: jax.Array           # (778, 16) LBS weights
    hands_components: jax.Array  # (45, 45) PCA basis (rows are components)
    hands_components_inv: jax.Array  # (45, 45)
    hands_mean: jax.Array        # (45,)
    faces: jax.Array             # (F, 3) int32
    is_right: jax.Array          # () bool


def fix_left_shapedirs(left: ManoModel, right: ManoModel) -> ManoModel:
    """Apply the well-known MANO left-hand shapedirs sign bug fix.

    The released MANO_LEFT.pkl shares shapedirs[:, 0, :] with the right
    hand; the x-component must be negated. The reference mutates the torch
    buffer in place when the L/R difference is below a threshold
    (`dataset/interhand.py:22-25`); we return a corrected copy.
    """
    need_fix = jnp.sum(jnp.abs(left.shapedirs[:, 0, :] - right.shapedirs[:, 0, :])) < 1
    sign = jnp.where(need_fix, -1.0, 1.0)
    fixed = left.shapedirs.at[:, 0, :].multiply(sign)
    return left._replace(shapedirs=fixed)


def convert_mano_pkl(pkl_path: str, npz_path: str) -> None:
    """One-time conversion of an official MANO pickle to a plain npz.

    Unwraps the chumpy `shapedirs` (reference `models/manolayer.py:7-17`)
    and densifies the scipy-sparse J_regressor.
    """
    with open(pkl_path, "rb") as f:
        data = pickle.load(f, encoding="latin1")

    shapedirs = data["shapedirs"]
    if not isinstance(shapedirs, np.ndarray):
        shapedirs = np.asarray(shapedirs.r if hasattr(shapedirs, "r") else shapedirs)

    j_reg = data["J_regressor"]
    if hasattr(j_reg, "todense"):
        j_reg = np.asarray(j_reg.todense())

    np.savez(
        npz_path,
        v_template=np.asarray(data["v_template"], np.float32),
        shapedirs=np.asarray(shapedirs, np.float32),
        posedirs=np.asarray(data["posedirs"], np.float32),
        J_regressor=np.asarray(j_reg, np.float32),
        weights=np.asarray(data["weights"], np.float32),
        hands_components=np.asarray(data["hands_components"], np.float32),
        hands_mean=np.asarray(data["hands_mean"], np.float32),
        faces=np.asarray(data["f"], np.int32),
        kintree_parents=np.asarray(
            [-1] + [int(data["kintree_table"][0, i]) for i in range(1, 16)], np.int32
        ),
        is_right=np.asarray("RIGHT" in pkl_path.upper(), np.bool_),
    )


def load_mano_npz(npz_path: str, is_right: bool | None = None) -> ManoModel:
    """Load a converted MANO npz into a `ManoModel`."""
    data = np.load(npz_path)
    parents = tuple(int(p) for p in data["kintree_parents"])
    if parents != MANO_PARENTS:
        raise ValueError(f"unexpected MANO kinematic tree: {parents}")
    hc = np.asarray(data["hands_components"], np.float32)
    right = bool(data["is_right"]) if is_right is None else is_right
    return ManoModel(
        v_template=jnp.asarray(data["v_template"], jnp.float32),
        shapedirs=jnp.asarray(data["shapedirs"], jnp.float32),
        posedirs=jnp.asarray(data["posedirs"], jnp.float32),
        J_regressor=jnp.asarray(data["J_regressor"], jnp.float32),
        weights=jnp.asarray(data["weights"], jnp.float32),
        hands_components=jnp.asarray(hc),
        hands_components_inv=jnp.asarray(np.linalg.inv(hc), jnp.float32),
        hands_mean=jnp.asarray(data["hands_mean"], jnp.float32),
        faces=jnp.asarray(data["faces"], jnp.int32),
        is_right=jnp.asarray(right),
    )


def _fibonacci_sphere(n: int) -> np.ndarray:
    """Deterministic, well-spread points on the unit sphere."""
    i = np.arange(n, dtype=np.float64) + 0.5
    phi = np.arccos(1.0 - 2.0 * i / n)
    golden = np.pi * (1.0 + 5.0**0.5)
    theta = golden * i
    return np.stack(
        [np.cos(theta) * np.sin(phi), np.sin(theta) * np.sin(phi), np.cos(phi)],
        axis=-1,
    )


def make_synthetic_mano(seed: int = 0, is_right: bool = True) -> ManoModel:
    """Deterministic random hand model with exact MANO shapes.

    The mesh is a convex-hull triangulation of 778 well-spread sphere
    points (every vertex is on the hull, giving a watertight manifold with
    2V-4 = 1552 faces, close to MANO's 1538). The left hand is the mirror
    image of the right (x negated, faces rewound) — like real MANO, both
    hands share mesh topology, so their graph coarsenings have identical
    level sizes (the dual-graph decoder relies on this,
    `DualGraph_lijun.py:104,130-136`). Blend shapes, skinning weights and
    the PCA pose basis are random but structurally valid: weights are a
    smooth partition of unity over 16 joint centers and the pose basis is
    orthogonal, so kinematics/inverse-PCA round-trips hold.
    """
    rng = np.random.default_rng(seed + (1000 if is_right else 0))
    scale = 0.1  # ~10 cm hand
    # Mesh geometry depends only on `seed` so L/R are exact mirrors.
    pts = _fibonacci_sphere(NUM_VERTS) * scale
    from scipy.spatial import ConvexHull

    hull = ConvexHull(pts)
    faces = np.asarray(hull.simplices, np.int32)
    # Orient faces outward (hull simplices have arbitrary winding).
    tri = pts[faces]
    normals = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    centers = tri.mean(axis=1)
    flip = (normals * centers).sum(-1) < 0
    faces[flip] = faces[flip][:, ::-1]

    # 16 joint centers inside the ball.
    j_centers = _fibonacci_sphere(NUM_SKEL_JOINTS) * (scale * 0.5)
    j_centers[0] = 0.0

    if not is_right:  # mirror geometry for the left hand
        pts = pts * np.array([-1.0, 1.0, 1.0])
        faces = faces[:, ::-1].copy()
        j_centers = j_centers * np.array([-1.0, 1.0, 1.0])

    # Smooth LBS weights: softmax over negative distance to joint centers.
    d = np.linalg.norm(pts[:, None, :] - j_centers[None, :, :], axis=-1)
    logits = -d / (0.25 * scale)
    weights = np.exp(logits - logits.max(axis=1, keepdims=True))
    weights /= weights.sum(axis=1, keepdims=True)

    # J_regressor: normalized weights of each joint's nearest 20 vertices.
    j_reg = np.zeros((NUM_SKEL_JOINTS, NUM_VERTS))
    for j in range(NUM_SKEL_JOINTS):
        nearest = np.argsort(d[:, j])[:20]
        w = 1.0 / (d[nearest, j] + 1e-3)
        j_reg[j, nearest] = w / w.sum()

    shapedirs = rng.normal(0.0, 0.02 * scale, (NUM_VERTS, 3, 10))
    posedirs = rng.normal(0.0, 0.002 * scale, (NUM_VERTS, 3, 135))
    hands_components = np.linalg.qr(rng.normal(size=(45, 45)))[0] * 2.0
    hands_mean = rng.normal(0.0, 0.1, (45,))

    return ManoModel(
        v_template=jnp.asarray(pts, jnp.float32),
        shapedirs=jnp.asarray(shapedirs, jnp.float32),
        posedirs=jnp.asarray(posedirs, jnp.float32),
        J_regressor=jnp.asarray(j_reg, jnp.float32),
        weights=jnp.asarray(weights, jnp.float32),
        hands_components=jnp.asarray(hands_components, jnp.float32),
        hands_components_inv=jnp.asarray(
            np.linalg.inv(hands_components), jnp.float32
        ),
        hands_mean=jnp.asarray(hands_mean, jnp.float32),
        faces=jnp.asarray(faces, jnp.int32),
        is_right=jnp.asarray(is_right),
    )


def joint_regressor_21(J_regressor: jax.Array | np.ndarray) -> jnp.ndarray:
    """Extend the (16, 778) regressor with fingertip one-hots and reorder.

    Produces the (21, 778) vertex->joint regressor used by losses and eval
    (reference `common/utils/mano.py:14-37`, `apps/eval_interhand.py:147-170`).
    """
    j = np.asarray(J_regressor)
    tips = np.zeros((5, j.shape[1]), j.dtype)
    for row, vid in enumerate(TIP_VERTEX_IDS):
        tips[row, vid] = 1.0
    full = np.concatenate([j, tips], axis=0)
    return jnp.asarray(full[list(NEW_JOINT_ORDER)])
