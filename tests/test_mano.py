import jax
import jax.numpy as jnp
import numpy as np
import pytest

from renderih_tpu.mano import (
    ManoModel,
    NUM_VERTS,
    make_synthetic_mano,
    mano_forward,
    joint_regressor_21,
    fix_left_shapedirs,
)
from renderih_tpu.mano.layer import axis_to_pca, pca_to_axis
from renderih_tpu.ops.rotation import rodrigues
from tests.reference_numpy import np_mano_forward


@pytest.fixture(scope="module")
def model():
    return make_synthetic_mano(seed=0, is_right=True)


def _model_np(model: ManoModel):
    return {k: np.asarray(v) for k, v in model._asdict().items()}


def test_forward_matches_sequential_oracle(model):
    rng = np.random.default_rng(0)
    bs = 4
    pose = rng.normal(size=(bs, 30)).astype(np.float32) * 0.5
    shape = rng.normal(size=(bs, 10)).astype(np.float32) * 0.5
    root_axis = rng.normal(size=(bs, 3)).astype(np.float32)
    trans = rng.normal(size=(bs, 3)).astype(np.float32) * 0.1
    scale = rng.uniform(0.8, 1.2, size=(bs,)).astype(np.float32)

    root_rot = rodrigues(jnp.asarray(root_axis))
    v, j = mano_forward(
        model, root_rot, jnp.asarray(pose), jnp.asarray(shape),
        trans=jnp.asarray(trans), scale=jnp.asarray(scale), center_idx=9,
    )
    v_ref, j_ref = np_mano_forward(
        _model_np(model), np.asarray(root_rot), pose, shape,
        trans=trans, scale=scale, center_idx=9,
    )
    np.testing.assert_allclose(np.asarray(v), v_ref, atol=2e-5)
    np.testing.assert_allclose(np.asarray(j), j_ref, atol=2e-5)


def test_forward_shapes_and_jit(model):
    bs = 2
    root = jnp.tile(jnp.eye(3), (bs, 1, 1))
    pose = jnp.zeros((bs, 45))
    shape = jnp.zeros((bs, 10))
    fwd = jax.jit(lambda r, p, s: mano_forward(model, r, p, s))
    v, j = fwd(root, pose, shape)
    assert v.shape == (bs, NUM_VERTS, 3)
    assert j.shape == (bs, 21, 3)
    assert np.all(np.isfinite(np.asarray(v)))


def test_center_idx_centres_joint(model):
    bs = 3
    rng = np.random.default_rng(1)
    root = rodrigues(jnp.asarray(rng.normal(size=(bs, 3)).astype(np.float32)))
    pose = jnp.asarray(rng.normal(size=(bs, 45)).astype(np.float32) * 0.3)
    shape = jnp.zeros((bs, 10))
    _, j = mano_forward(model, root, pose, shape, use_pca=True, center_idx=9)
    np.testing.assert_allclose(np.asarray(j[:, 9]), 0.0, atol=1e-6)


def test_rotmat_pose_input_equivalent(model):
    rng = np.random.default_rng(2)
    bs = 2
    pose = jnp.asarray(rng.normal(size=(bs, 45)).astype(np.float32) * 0.4)
    shape = jnp.asarray(rng.normal(size=(bs, 10)).astype(np.float32) * 0.3)
    root = jnp.tile(jnp.eye(3), (bs, 1, 1))

    v1, j1 = mano_forward(model, root, pose, shape, use_pca=False)
    rotmats = rodrigues(pose.reshape(bs, 15, 3))
    v2, j2 = mano_forward(model, root, rotmats, shape)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(j1), np.asarray(j2), atol=1e-6)


def test_pca_roundtrip(model):
    rng = np.random.default_rng(3)
    axis = jnp.asarray(rng.normal(size=(4, 45)).astype(np.float32))
    back = pca_to_axis(model, axis_to_pca(model, axis))
    np.testing.assert_allclose(np.asarray(back), np.asarray(axis), atol=1e-4)


def test_grad_flows(model):
    def loss(pose):
        root = jnp.eye(3)[None]
        v, _ = mano_forward(model, root, pose, jnp.zeros((1, 10)))
        return jnp.sum(v**2)

    g = jax.grad(loss)(jnp.zeros((1, 45)) + 0.1)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).sum()) > 0


def test_joint_regressor_21(model):
    jr = joint_regressor_21(model.J_regressor)
    assert jr.shape == (21, NUM_VERTS)
    # Rows sum to 1 (16 skeleton rows are convex weights; tips are one-hots).
    np.testing.assert_allclose(np.asarray(jr.sum(-1)), np.ones(21), atol=1e-5)


def test_fix_left_shapedirs():
    right = make_synthetic_mano(seed=0, is_right=True)
    # Simulate the MANO bug: left shares shapedirs with right.
    left = make_synthetic_mano(seed=0, is_right=False)._replace(
        shapedirs=right.shapedirs
    )
    fixed = fix_left_shapedirs(left, right)
    np.testing.assert_allclose(
        np.asarray(fixed.shapedirs[:, 0, :]),
        -np.asarray(right.shapedirs[:, 0, :]),
        atol=0,
    )
    # Distinct shapedirs are untouched.
    left2 = make_synthetic_mano(seed=7, is_right=False)
    fixed2 = fix_left_shapedirs(left2, right)
    np.testing.assert_allclose(
        np.asarray(fixed2.shapedirs), np.asarray(left2.shapedirs), atol=0
    )


def test_synthetic_mesh_valid(model):
    faces = np.asarray(model.faces)
    assert faces.min() >= 0 and faces.max() < NUM_VERTS
    # watertight convex hull: 2V - 4 faces
    assert faces.shape == (2 * NUM_VERTS - 4, 3)
    # every vertex appears in some face
    assert len(np.unique(faces)) == NUM_VERTS
