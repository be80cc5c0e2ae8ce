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


def test_synthetic_anchors_on_surface(assets):
    from renderih_tpu.optimize.anchors import (
        anchor_normals,
        make_synthetic_anchors,
        recover_anchors,
    )

    mano = assets.right.mano
    spec = make_synthetic_anchors(np.asarray(mano.faces),
                                  np.asarray(mano.v_template), n_anchors=32)
    a = np.asarray(recover_anchors(mano.v_template, spec))
    assert a.shape == (32, 3)
    # anchors are barycentric points of their triangles -> inside the
    # triangle plane: distance to the plane is ~0
    tri = np.asarray(mano.v_template)[np.asarray(spec.tri_idx)]
    n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    plane_dist = np.abs(np.sum((a - tri[:, 0]) * n, -1))
    assert plane_dist.max() < 1e-6
    nn = np.asarray(anchor_normals(mano.v_template, spec))
    np.testing.assert_allclose(np.linalg.norm(nn, axis=-1), 1.0, atol=1e-5)
    # FPS spreads anchors: pairwise min distance is a decent fraction of
    # the hand size
    d = np.linalg.norm(a[:, None] - a[None, :], axis=-1)
    np.fill_diagonal(d, np.inf)
    assert d.min() > 0.005


def test_search_anchor_pairs_gating_and_elasticity():
    from renderih_tpu.optimize.anchors import AnchorMatch, search_anchor_pairs

    # main anchors on a line along +x with normals +x; sub anchors nearby
    # with normals -x (opposed -> allowed) except one facing +x (gated out)
    main = jnp.asarray([[0.0, 0, 0], [0.01, 0, 0], [0.1, 0, 0]])
    main_n = jnp.asarray([[1.0, 0, 0]] * 3)
    sub = jnp.asarray([[0.004, 0, 0], [0.004, 0.001, 0]])
    sub_n = jnp.asarray([[-1.0, 0, 0], [1.0, 0, 0]])  # second not opposed
    m = search_anchor_pairs(main, sub, main_n, sub_n, radius=0.015, k=2)
    assert isinstance(m, AnchorMatch)
    m_idx, m_el, m_mask = (np.asarray(m.idx), np.asarray(m.elasti),
                           np.asarray(m.mask))
    # sub 0: matched to the two near main anchors, both within radius
    assert m_mask[0].sum() == 2
    assert set(m_idx[0]) == {0, 1}
    # normal gating: sub 1 has no valid pairs despite being close
    assert m_mask[1].sum() == 0
    assert float(np.asarray(m.vertex_contact)[1]) == 0.0
    # elasticity decreases with distance (nearest pair has larger k)
    d0 = np.abs(0.004 - np.asarray([0.0, 0.01]))
    order = np.argsort(d0)
    els = {int(i): e for i, e in zip(m_idx[0], m_el[0])}
    assert els[int(order[0])] > els[int(order[1])] > 0


def test_search_anchor_pairs_hysteresis():
    from renderih_tpu.optimize.anchors import search_anchor_pairs

    main = jnp.asarray([[0.0, 0, 0], [0.018, 0, 0], [0.3, 0, 0]])
    main_n = jnp.asarray([[1.0, 0, 0]] * 3)
    sub = jnp.asarray([[0.005, 0, 0]])
    sub_n = jnp.asarray([[-1.0, 0, 0]])
    fresh = search_anchor_pairs(main, sub, main_n, sub_n, radius=0.015, k=2)
    # re-match with hysteresis: only prev ids participate, wider 0.02
    # radius keeps the pairing alive after slight motion
    sub2 = jnp.asarray([[0.017, 0, 0]])  # moved: now 0.017 from main 0
    again = search_anchor_pairs(main, sub2, main_n, sub_n, radius=0.015,
                                k=2, prev=fresh)
    assert set(np.asarray(again.idx)[0]) == set(np.asarray(fresh.idx)[0])
    assert np.asarray(again.mask)[0].sum() >= 1  # 0.017 < 0.02 hysteresis


def test_optimize_anchored_reduces_penetration(assets):
    """The anchor-mode optimizer (reference 4-attempt schedule) separates
    interpenetrating hands at least as well as the vertex-pair mode."""
    from renderih_tpu.optimize.anchors import make_synthetic_anchors

    spec_l = make_synthetic_anchors(np.asarray(assets.left.mano.faces),
                                    np.asarray(assets.left.mano.v_template),
                                    n_anchors=32)
    spec_r = make_synthetic_anchors(np.asarray(assets.right.mano.faces),
                                    np.asarray(assets.right.mano.v_template),
                                    n_anchors=32)
    left = HandVars(pose=jnp.zeros(45), shape=jnp.zeros(10),
                    trans=jnp.zeros(3), root_aa=jnp.zeros(3))
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
    assert pen0 > 0.01
    # shortened schedule (same structure: fresh/prev/prev/fresh)
    sched = ((1.0, 1.0, 15), (0.1, 15.0, 10), (30.0, 0.1, 20), (1.0, 5.0, 15))
    l2, r2, terms = optimize_two_hands(
        assets, left, right, lr=5e-3, sdf_grid_size=16,
        anchors=(spec_l, spec_r), schedule=sched)
    pen1 = penetration(l2, r2)
    assert np.isfinite(pen1)
    assert pen1 < pen0 * 0.7, (pen0, pen1)
    assert "contact" in terms and np.isfinite(float(terms["contact"]))


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
