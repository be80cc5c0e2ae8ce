import jax
import jax.numpy as jnp
import numpy as np
import pytest

from renderih_tpu.assets import make_synthetic_assets
from renderih_tpu.mano.layer import mano_forward
from renderih_tpu.ops.rotation import rodrigues
from renderih_tpu.ops.sdf import sdf_penetration_loss
from renderih_tpu.optimize import (
    GeoWeights,
    anchor_pairs,
    contact_loss,
    edge_preserve_loss,
    optimize_two_hands,
    pose_angle_limit_loss,
)
from renderih_tpu.optimize.geo import HandVars


@pytest.fixture(scope="module")
def assets():
    return make_synthetic_assets(seed=0)


def test_anchor_pairs_thresholding():
    a = jnp.asarray([[0.0, 0, 0], [1.0, 0, 0]])
    b = jnp.asarray([[0.005, 0, 0], [5.0, 0, 0]])
    idx, w = anchor_pairs(a, b, thresh=0.01)
    assert int(idx[0]) == 0
    np.testing.assert_allclose(np.asarray(w), [1.0, 0.0])


def test_contact_loss_zero_when_touching():
    a = jnp.asarray([[0.0, 0, 0]])
    b = jnp.asarray([[0.0, 0, 0]])
    idx, w = anchor_pairs(a, b)
    assert float(contact_loss(a, b, idx, w)) == 0.0


def test_pose_angle_limit():
    ok = jnp.zeros(45)
    assert float(pose_angle_limit_loss(ok)) < 1e-6
    bad = jnp.zeros(45).at[0].set(3.0)  # 3 rad > pi/2
    assert float(pose_angle_limit_loss(bad)) > 0.1


def test_optimize_reduces_penetration(assets):
    """Two overlapping hands separate under the optimizer."""
    left = HandVars(pose=jnp.zeros(45), shape=jnp.zeros(10),
                    trans=jnp.zeros(3), root_aa=jnp.zeros(3))
    # right hand placed almost on top of left -> heavy interpenetration
    right = HandVars(pose=jnp.zeros(45), shape=jnp.zeros(10),
                     trans=jnp.asarray([0.02, 0.0, 0.0]),
                     root_aa=jnp.zeros(3))

    def penetration(l, r):
        vl, _ = mano_forward(
            assets.left.mano, rodrigues(l.root_aa[None]), l.pose[None],
            l.shape[None], trans=l.trans[None], center_idx=None,
            use_pca=False)
        vr, _ = mano_forward(
            assets.right.mano, rodrigues(r.root_aa[None]), r.pose[None],
            r.shape[None], trans=r.trans[None], center_idx=None,
            use_pca=False)
        return float(sdf_penetration_loss(
            vl, vr, assets.left.mano.faces, grid_size=16))

    pen0 = penetration(left, right)
    assert pen0 > 0.01, "setup should start interpenetrating"

    l2, r2, terms = optimize_two_hands(
        assets, left, right, n_iter=60, lr=5e-3, sdf_grid_size=16,
    )
    pen1 = penetration(l2, r2)
    assert np.isfinite(pen1)
    assert pen1 < pen0 * 0.7, (pen0, pen1)
    # pose stays plausible
    assert float(pose_angle_limit_loss(l2.pose)) < 1.0


def test_gaussian_pose_prior(assets):
    """The analytic naturalness prior: zero at the mean, positive away
    from it, and it steers the optimizer toward plausible poses."""
    from renderih_tpu.optimize.geo import make_gaussian_pose_prior

    rng = np.random.default_rng(0)
    poses = jnp.asarray(rng.normal(0, 0.3, (200, 45)), jnp.float32)
    prior = make_gaussian_pose_prior(poses)
    mean = jnp.mean(poses, axis=0)
    assert float(prior(mean)) < 1e-3
    far = mean + 2.0
    assert float(prior(far)) > float(prior(mean)) + 1.0

    # with a heavy prior weight, the optimized pose ends closer to the
    # prior mean than without it
    from renderih_tpu.optimize.geo import GeoWeights

    start_pose = jnp.asarray(rng.normal(0, 0.8, (45,)), jnp.float32)
    left = HandVars(pose=start_pose, shape=jnp.zeros(10),
                    trans=jnp.zeros(3), root_aa=jnp.zeros(3))
    right = HandVars(pose=start_pose, shape=jnp.zeros(10),
                     trans=jnp.asarray([0.05, 0.0, 0.0]),
                     root_aa=jnp.zeros(3))
    w = GeoWeights(prior=10.0, pose_reg=0.0)
    l_p, _, terms = optimize_two_hands(
        assets, left, right, n_iter=40, lr=5e-3, sdf_grid_size=16,
        weights=w, pose_prior_fn=prior)
    l_np, _, _ = optimize_two_hands(
        assets, left, right, n_iter=40, lr=5e-3, sdf_grid_size=16,
        weights=GeoWeights(pose_reg=0.0))
    assert "prior" in terms
    d_with = float(jnp.linalg.norm(l_p.pose - mean))
    d_without = float(jnp.linalg.norm(l_np.pose - mean))
    assert d_with < d_without
