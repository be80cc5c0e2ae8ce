"""Joints -> MANO analytic IK (mano/ik.py) round-trip tests.

Reference capability: `utils/mano_from_3djoint/AIK.py` +
`convert2mano.py` (twist-swing IK + Adam refinement). Ground truth here
comes from our own `mano_forward` on the deterministic synthetic MANO
model, so every assertion is a true round trip.

Twist caveat (inherent to the method, `AIK.py:17-22` "the twist of hand
bone could be omitted"): joints-only IK cannot observe twist about the
bone axis, so VERTEX round-trip is only exact when the ground-truth pose
is itself swing-only. We therefore check (a) skeleton-joint round-trip on
fully random poses, and (b) vertex round-trip on swing-only poses
(constructed by projecting a random pose through the IK once).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from renderih_tpu.assets import make_synthetic_assets
from renderih_tpu.mano.ik import (
    adaptive_ik,
    fit_mano_to_joints,
    ik_from_joints,
    ik_template,
)
from renderih_tpu.mano.layer import mano_forward
from renderih_tpu.ops.rotation import rodrigues

# Skeleton-joint rows of the 21-joint output (tips are LBS vertices and
# carry pose-blendshape offsets the swing-only IK cannot represent).
_SKEL_ROWS = [0, 1, 2, 3, 5, 6, 7, 9, 10, 11, 13, 14, 15, 17, 18, 19]


@pytest.fixture(scope="module")
def mano():
    return make_synthetic_assets(seed=0).right.mano


def _random_gt(mano, seed, b=4, pose_scale=0.4, shape_scale=0.0):
    k = jax.random.split(jax.random.PRNGKey(seed), 3)
    root = rodrigues(jax.random.normal(k[0], (b, 3)) * 0.5)
    pose = jax.random.normal(k[1], (b, 45)) * pose_scale
    shape = jax.random.normal(k[2], (b, 10)) * shape_scale
    v, j = mano_forward(mano, root, pose, shape, center_idx=None,
                        use_pca=False)
    return root, pose, shape, v, j


def test_aik_zero_pose_is_identity(mano):
    template = ik_template(mano)
    r0, rotmats = adaptive_ik(template, template[None])
    np.testing.assert_allclose(np.asarray(r0[0]), np.eye(3), atol=1e-4)
    # atol 2e-3: arccos near cos=1 amplifies the 1e-8 norm epsilons into
    # ~1e-3 rad swings — a sub-0.06-degree artifact, not a logic error.
    np.testing.assert_allclose(
        np.asarray(rotmats[0]), np.broadcast_to(np.eye(3), (15, 3, 3)),
        atol=2e-3)


def test_aik_skeleton_joint_roundtrip_random_pose(mano):
    """Swing-only IK must reproduce skeleton joint positions exactly."""
    _, _, _, _, j_gt = _random_gt(mano, seed=1)
    template = ik_template(mano)
    r0, rotmats = adaptive_ik(template, j_gt)
    _, j_rec = mano_forward(mano, r0, rotmats, jnp.zeros((4, 10)),
                            center_idx=None, use_pca=False)
    # IK output lives at the template anchor; compare root-relative.
    err = np.asarray(jnp.abs((j_rec - j_rec[:, :1]) - (j_gt - j_gt[:, :1])))
    assert err[:, _SKEL_ROWS].max() < 1e-3, err[:, _SKEL_ROWS].max()


def test_fit_vertex_roundtrip_swing_only_pose(mano):
    """Vertex round-trip via the full fit, swing-only ground truth.

    Bars (measured floor + margin on the synthetic sphere-hull hand):
    joint max <= 0.5 mm, vertex mean <= 0.6 mm, vertex max <= 3 mm.
    Sub-mm MAX vertex error is not attainable from 21 joints on this
    geometry: the synthetic "fingertips" are heavily-blended LBS
    vertices (unlike real MANO's near-rigid tips), so parts of the
    pose space are near-null for all 21 joints while still moving other
    vertices — no joints-only method can pin those directions (the
    reference's convert2mano.py has the same limit and no regularizer;
    our pose_reg toward the zero-twist analytic init is what gets the
    max from ~5 mm down to ~2 mm)."""
    _, _, _, _, j_seed = _random_gt(mano, seed=2)
    template = ik_template(mano)
    r0, rotmats = adaptive_ik(template, j_seed)  # swing-only GT pose
    v_gt, j_gt = mano_forward(mano, r0, rotmats, jnp.zeros((4, 10)),
                              center_idx=None, use_pca=False)
    fit = fit_mano_to_joints(mano, j_gt, iters=300)
    v_rec, j_rec = mano_forward(mano, rodrigues(fit.root_aa), fit.pose_aa,
                                fit.shape, center_idx=None, use_pca=False)
    err_v = np.asarray(jnp.abs((v_rec - j_rec[:, :1]) - (v_gt - j_gt[:, :1])))
    err_j = np.asarray(jnp.abs((j_rec - j_rec[:, :1]) - (j_gt - j_gt[:, :1])))
    assert err_j.max() < 0.5e-3, err_j.max()
    assert err_v.mean() < 0.6e-3, err_v.mean()
    assert err_v.max() < 3e-3, err_v.max()


def test_ik_from_joints_unit_invariance(mano):
    """The fit is unit/offset agnostic (reference rescales by |j9-j0|)."""
    _, _, _, _, j_gt = _random_gt(mano, seed=3, b=2)
    fit_m = ik_from_joints(mano, j_gt)
    fit_mm = ik_from_joints(mano, j_gt * 1000.0 + 5.0)
    np.testing.assert_allclose(np.asarray(fit_m.pose_aa),
                               np.asarray(fit_mm.pose_aa), atol=1e-4)


def test_fit_refinement_improves_and_recovers_shape(mano):
    """Adam refinement beats analytic-only on a shaped hand."""
    _, _, shape_gt, _, j_gt = _random_gt(mano, seed=4, b=2,
                                         pose_scale=0.3, shape_scale=0.8)
    analytic = ik_from_joints(mano, j_gt)
    fit = fit_mano_to_joints(mano, j_gt, iters=150)
    a_err = float(analytic.joint_err.mean())
    f_err = float(fit.joint_err.mean())
    assert f_err < a_err, (f_err, a_err)
    assert f_err < 1.5e-3, f_err  # < 1.5 mm mean joint residual
