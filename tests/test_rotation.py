import jax
import jax.numpy as jnp
import numpy as np

from renderih_tpu.ops.rotation import (
    rodrigues,
    rodrigues_inverse,
    rot6d_to_rotmat,
    rotmat_z,
)
from tests.reference_numpy import np_rodrigues


def test_rodrigues_matches_oracle():
    rng = np.random.default_rng(0)
    axes = rng.normal(size=(64, 3)).astype(np.float32)
    got = np.asarray(rodrigues(jnp.asarray(axes)))
    want = np.stack([np_rodrigues(a) for a in axes])
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_rodrigues_small_angle_stable():
    axes = jnp.asarray([[0.0, 0.0, 0.0], [1e-9, 0.0, 0.0]])
    R = rodrigues(axes)
    np.testing.assert_allclose(np.asarray(R), np.stack([np.eye(3)] * 2), atol=1e-6)
    # differentiable at zero
    g = jax.grad(lambda a: rodrigues(a).sum())(jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(g)))


def test_rodrigues_roundtrip():
    rng = np.random.default_rng(1)
    axes = rng.normal(size=(32, 3)).astype(np.float32) * 0.8
    R = rodrigues(jnp.asarray(axes))
    back = rodrigues_inverse(R)
    np.testing.assert_allclose(np.asarray(back), axes, atol=2e-3)


def test_rodrigues_is_rotation():
    rng = np.random.default_rng(2)
    axes = rng.normal(size=(16, 3)).astype(np.float32) * 2.0
    R = np.asarray(rodrigues(jnp.asarray(axes)))
    eye = np.einsum("bij,bkj->bik", R, R)
    np.testing.assert_allclose(eye, np.stack([np.eye(3)] * 16), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), np.ones(16), atol=1e-5)


def test_rot6d_orthonormal():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(8, 6)).astype(np.float32)
    R = np.asarray(rot6d_to_rotmat(jnp.asarray(x)))
    eye = np.einsum("bij,bkj->bik", R, R)
    np.testing.assert_allclose(eye, np.stack([np.eye(3)] * 8), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), np.ones(8), atol=1e-5)


def test_rot6d_identity_recovery():
    # 6D rep of identity under the reference layout (reshape(3, 2) with
    # a1 = column 0, a2 = column 1): rows are (r_i1, r_i2) pairs.
    x = jnp.asarray([[1.0, 0.0, 0.0, 1.0, 0.0, 0.0]])
    R = np.asarray(rot6d_to_rotmat(x))[0]
    np.testing.assert_allclose(R, np.eye(3), atol=1e-6)


def test_rot6d_roundtrip_from_rotmat():
    """Columns of a rotation matrix, interleaved, recover the matrix."""
    rng = np.random.default_rng(9)
    axes = rng.normal(size=(4, 3)).astype(np.float32)
    R = np.asarray(rodrigues(jnp.asarray(axes)))
    six = np.stack([R[..., 0], R[..., 1]], axis=-1).reshape(4, 6)
    back = np.asarray(rot6d_to_rotmat(jnp.asarray(six)))
    np.testing.assert_allclose(back, R, atol=1e-5)


def test_rotmat_z_matches_reference_convention():
    R = np.asarray(rotmat_z(jnp.asarray(90.0)))
    want = np.array(
        [
            [np.cos(np.pi / 2), -np.sin(np.pi / 2), 0],
            [np.sin(np.pi / 2), np.cos(np.pi / 2), 0],
            [0, 0, 1],
        ]
    )
    np.testing.assert_allclose(R, want, atol=1e-5)
