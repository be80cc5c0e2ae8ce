"""KTD (kinematics-aware MANO head) tests."""

import jax
import jax.numpy as jnp
import numpy as np

from renderih_tpu.mano.params import make_synthetic_mano
from renderih_tpu.models.ktd import HAND_ANCESTORS, KTDHead, ktd_mano_outputs


def test_ancestor_table_is_a_valid_dag():
    for j, anc in enumerate(HAND_ANCESTORS):
        assert all(a < j for a in anc)  # ancestors already predicted
    assert len(HAND_ANCESTORS) == 16


def test_ktd_forward_shapes_and_mano():
    b = 4
    rng = np.random.default_rng(0)
    feat = jnp.asarray(rng.normal(size=(b, 2048)).astype(np.float32))
    head = KTDHead(hidden_dim=256)
    variables = head.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        feat, deterministic=True,
    )
    pose6d, shape, cam = head.apply(variables, feat, deterministic=True)
    assert pose6d.shape == (b, 96)
    assert shape.shape == (b, 10) and cam.shape == (b, 3)

    model = make_synthetic_mano(seed=0, is_right=True)
    out = ktd_mano_outputs(model, pose6d, shape, cam)
    assert out["verts3d"].shape == (b, 778, 3)
    assert out["joints3d"].shape == (b, 21, 3)
    assert out["joints2d"].shape == (b, 21, 2)
    assert out["rotmats"].shape == (b, 16, 3, 3)
    # valid rotations: R R^T = I
    rr = np.einsum("bjmn,bjkn->bjmk", np.asarray(out["rotmats"]),
                   np.asarray(out["rotmats"]))
    # atol 1e-4: the tiny-init 6D vectors are near the Gram-Schmidt
    # epsilon floor, so orthogonality holds only to ~1e-5.
    np.testing.assert_allclose(rr, np.broadcast_to(np.eye(3), rr.shape),
                               atol=1e-4)
    assert np.all(np.isfinite(np.asarray(out["verts3d"])))


def test_ktd_chain_conditioning():
    # Perturbing the root joint regressor's parameters must change every
    # descendant's prediction (information flows down the chain).
    b = 2
    feat = jnp.ones((b, 128))
    head = KTDHead(hidden_dim=64)
    variables = head.init(
        {"params": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3)},
        feat, deterministic=True,
    )
    pose, _, _ = head.apply(variables, feat, deterministic=True)

    params = jax.tree_util.tree_map(lambda x: x, variables["params"])
    params["joint_reg0"]["bias"] = params["joint_reg0"]["bias"] + 1.0
    pose2, _, _ = head.apply({"params": params}, feat, deterministic=True)
    d = np.abs(np.asarray(pose2 - pose)).reshape(b, 16, 6).max(axis=(0, 2))
    assert d[0] > 0  # root changed
    assert np.all(d[1:] > 0)  # every joint conditions on joint 0
