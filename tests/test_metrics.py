import jax
import jax.numpy as jnp
import numpy as np
import pytest

from renderih_tpu.eval.metrics import (
    batch_similarity_align,
    compute_cdev,
    compute_mrrpe,
    mpjpe,
    nanmean,
    pa_mpjpe,
    two_hand_metrics,
)
from renderih_tpu.mano import joint_regressor_21, make_synthetic_mano
from tests.reference_numpy import np_similarity_align


def _random_rigid(rng, n=21):
    pts = rng.normal(size=(n, 3))
    # random rotation
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    return pts, q


def test_procrustes_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    s1 = rng.normal(size=(6, 21, 3)).astype(np.float32)
    s2 = rng.normal(size=(6, 21, 3)).astype(np.float32)
    got = np.asarray(batch_similarity_align(jnp.asarray(s1), jnp.asarray(s2)))
    want = np.stack([np_similarity_align(a, b) for a, b in zip(s1, s2)])
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_analytic_procrustes_matches_svd():
    """The quaternion (Horn) closed-form path must agree with the SVD
    formulation to f32 precision, including degenerate geometry: mirror
    targets (reflection fix), exactly planar point sets (rank-2 K, where
    a K^T-K-based method loses half the significand), near-identity."""
    rng = np.random.default_rng(11)
    s1 = rng.normal(size=(8, 21, 3)).astype(np.float32)
    s2 = rng.normal(size=(8, 21, 3)).astype(np.float32)
    planar = s1.copy()
    planar[..., 2] = 0.0
    cases = [
        (s1, s2),
        (s1, s1 * np.array([-1.0, 1.0, 1.0], np.float32)),
        (planar, s2),
        (s1, s1 + 1e-4 * rng.normal(size=s1.shape).astype(np.float32)),
    ]
    for a, b in cases:
        got = np.asarray(batch_similarity_align(jnp.asarray(a), jnp.asarray(b)))
        want = np.asarray(
            batch_similarity_align(jnp.asarray(a), jnp.asarray(b), method="svd"))
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_procrustes_exact_recovery():
    rng = np.random.default_rng(1)
    pts, q = _random_rigid(rng)
    s2 = pts @ q.T * 1.7 + np.array([0.1, -0.2, 0.3])
    aligned = batch_similarity_align(
        jnp.asarray(pts[None], jnp.float32), jnp.asarray(s2[None], jnp.float32)
    )
    np.testing.assert_allclose(np.asarray(aligned[0]), s2, atol=1e-4)
    assert float(pa_mpjpe(jnp.asarray(pts[None], jnp.float32),
                          jnp.asarray(s2[None], jnp.float32))[0]) < 1e-4


def test_procrustes_reflection_handled():
    rng = np.random.default_rng(2)
    pts = rng.normal(size=(21, 3))
    mirrored = pts * np.array([-1.0, 1.0, 1.0])
    aligned = np.asarray(
        batch_similarity_align(
            jnp.asarray(pts[None], jnp.float32),
            jnp.asarray(mirrored[None], jnp.float32),
        )
    )[0]
    # R must be a proper rotation: alignment error stays > 0 for a mirror.
    err = np.linalg.norm(aligned - mirrored, axis=-1).mean()
    assert err > 1e-3


def test_mpjpe_simple():
    a = jnp.zeros((2, 4, 3))
    b = jnp.ones((2, 4, 3))
    np.testing.assert_allclose(np.asarray(mpjpe(a, b)), np.sqrt(3) * np.ones(2),
                               rtol=1e-6)


def test_mrrpe():
    rl_p = jnp.asarray([[0.0, 0, 0]])
    rr_p = jnp.asarray([[1.0, 0, 0]])
    rl_g = jnp.asarray([[0.0, 0, 0]])
    rr_g = jnp.asarray([[0.0, 0, 0]])
    np.testing.assert_allclose(
        np.asarray(compute_mrrpe(rl_p, rr_p, rl_g, rr_g)), [1.0]
    )


def test_cdev_nan_when_no_contact_and_zero_when_perfect():
    rng = np.random.default_rng(3)
    left = rng.normal(size=(1, 50, 3)).astype(np.float32)
    right_far = left + 10.0
    # no contact -> NaN
    cd = compute_cdev(
        jnp.asarray(left), jnp.asarray(right_far),
        jnp.asarray(left), jnp.asarray(right_far),
    )
    assert np.isnan(np.asarray(cd)[0])
    # touching hands, perfect prediction: cdev equals the GT contact pair
    # distance (|offset| = 1e-4 * sqrt(3)), not zero — CDev measures the
    # *predicted* distance of GT-contact pairs (`utils/eval_metrics.py:36-50`).
    right_touch = left + 1e-4
    cd2 = compute_cdev(
        jnp.asarray(left), jnp.asarray(right_touch),
        jnp.asarray(left), jnp.asarray(right_touch),
    )
    expected = 1e-4 * np.sqrt(3)
    assert abs(float(np.asarray(cd2)[0]) - expected) < 3e-5
    assert abs(float(nanmean(cd2)) - expected) < 3e-5


def test_two_hand_metrics_zero_for_perfect_prediction():
    model_r = make_synthetic_mano(seed=0, is_right=True)
    model_l = make_synthetic_mano(seed=1, is_right=False)
    jr = {
        "left": joint_regressor_21(model_l.J_regressor),
        "right": joint_regressor_21(model_r.J_regressor),
    }
    rng = np.random.default_rng(4)
    verts = {
        "left": jnp.asarray(rng.normal(size=(2, 778, 3)).astype(np.float32) * 0.1),
        "right": jnp.asarray(rng.normal(size=(2, 778, 3)).astype(np.float32) * 0.1),
    }
    m = two_hand_metrics(verts, verts, jr)
    for k, v in m.items():
        if k == "cdev":
            continue
        assert float(np.asarray(v).max()) < 1e-4, k


def _np_double_oracle(vp, vg, jp, jg, root_idx):
    """Independent NumPy oracle for the double two-hand-frame metrics:
    concat(left, right) both relative to the right root, per-sample
    MPJPE/MPVPE + Umeyama-aligned PA variants."""
    rr_p = jp["right"][:, root_idx : root_idx + 1]
    rr_g = jg["right"][:, root_idx : root_idx + 1]
    dj_p = np.concatenate([jp["left"] - rr_p, jp["right"] - rr_p], axis=1)
    dj_g = np.concatenate([jg["left"] - rr_g, jg["right"] - rr_g], axis=1)
    dv_p = np.concatenate([vp["left"] - rr_p, vp["right"] - rr_p], axis=1)
    dv_g = np.concatenate([vg["left"] - rr_g, vg["right"] - rr_g], axis=1)

    def _err(a, b):
        return np.linalg.norm(a - b, axis=-1).mean(axis=-1)

    def _pa(a, b):
        al = np.stack([np_similarity_align(x, y) for x, y in zip(a, b)])
        return _err(al, b)

    return {
        "double_mpjpe": _err(dj_p, dj_g),
        "double_mpvpe": _err(dv_p, dv_g),
        "double_pa_mpjpe": _pa(dj_p, dj_g),
        "double_pa_mpvpe": _pa(dv_p, dv_g),
    }


@pytest.mark.parametrize("convention", ["default", "newmpjpe"])
def test_double_metrics_match_numpy_oracle(convention):
    root_idx, length_joints = (0, (0, 1)) if convention == "default" else (9, (0, 9))
    model_r = make_synthetic_mano(seed=0, is_right=True)
    model_l = make_synthetic_mano(seed=1, is_right=False)
    jr = {
        "left": np.asarray(joint_regressor_21(model_l.J_regressor)),
        "right": np.asarray(joint_regressor_21(model_r.J_regressor)),
    }
    rng = np.random.default_rng(7)
    vg = {h: rng.normal(size=(3, 778, 3)).astype(np.float32) * 0.1
          for h in ("left", "right")}
    vp = {h: vg[h] + rng.normal(size=(3, 778, 3)).astype(np.float32) * 0.01
          for h in ("left", "right")}
    jp = {h: np.einsum("jv,bvc->bjc", jr[h], vp[h]) for h in jr}
    jg = {h: np.einsum("jv,bvc->bjc", jr[h], vg[h]) for h in jr}

    m = two_hand_metrics(
        {h: jnp.asarray(vp[h]) for h in vp}, {h: jnp.asarray(vg[h]) for h in vg},
        {h: jnp.asarray(jr[h]) for h in jr},
        root_idx=root_idx, length_joints=length_joints)
    want = _np_double_oracle(vp, vg, jp, jg, root_idx)
    for k, w in want.items():
        np.testing.assert_allclose(np.asarray(m[k]), w, atol=1e-5, err_msg=k)


def test_newmpjpe_convention_changes_root():
    """root=9 vs root=0 must produce different ori metrics when the
    prediction errs by a rotation (root-relative error depends on the
    pivot), and identical PA metrics (alignment removes the frame)."""
    model_r = make_synthetic_mano(seed=0, is_right=True)
    jr21 = joint_regressor_21(model_r.J_regressor)
    jr = {"left": jr21, "right": jr21}
    rng = np.random.default_rng(8)
    base = rng.normal(size=(2, 778, 3)).astype(np.float32) * 0.1
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    vg = {"left": jnp.asarray(base), "right": jnp.asarray(base + 0.2)}
    vp = {h: jnp.asarray(np.asarray(v) @ q.T.astype(np.float32)) for h, v in vg.items()}
    m0 = two_hand_metrics(vp, vg, jr, root_idx=0, length_joints=(0, 1))
    m9 = two_hand_metrics(vp, vg, jr, root_idx=9, length_joints=(0, 9))
    assert not np.allclose(np.asarray(m0["ori_mpjpe_left"]),
                           np.asarray(m9["ori_mpjpe_left"]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(m0["pa_mpjpe_left"]),
                               np.asarray(m9["pa_mpjpe_left"]), atol=1e-6)


def test_two_hand_metrics_translation_invariance():
    """Root-relative metrics ignore a global per-hand translation."""
    model_r = make_synthetic_mano(seed=0, is_right=True)
    jr21 = joint_regressor_21(model_r.J_regressor)
    jr = {"left": jr21, "right": jr21}
    rng = np.random.default_rng(5)
    base = rng.normal(size=(2, 778, 3)).astype(np.float32) * 0.1
    verts_gt = {"left": jnp.asarray(base), "right": jnp.asarray(base + 0.2)}
    shift = jnp.asarray([0.3, -0.1, 0.05])
    verts_pred = {
        "left": verts_gt["left"] + shift,
        "right": verts_gt["right"] + shift,
    }
    m = two_hand_metrics(verts_pred, verts_gt, jr)
    assert float(np.asarray(m["ori_mpjpe_left"]).max()) < 1e-4
    assert float(np.asarray(m["ori_mpvpe_right"]).max()) < 1e-4
    # equal shift on both hands leaves the relative root unchanged
    assert float(np.asarray(m["mrrpe"]).max()) < 1e-4
