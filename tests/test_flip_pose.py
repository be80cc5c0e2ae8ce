"""Flip-augmentation pose-label correctness.

The reference fixes up MANO pose labels on horizontal flip with a
PCA→axis→mirror→PCA round-trip (`core/loader_mano.py:145-200`). Our packed
format stores 48-d axis-angle directly, so the fixup reduces to the
axis-angle mirror (negate y/z components), which is conjugation by
M = diag(-1, 1, 1). These tests pin down that identity and the pipeline
wiring that applies it.
"""

import jax
import jax.numpy as jnp
import numpy as np

from renderih_tpu.data.pipeline import device_augment
from renderih_tpu.ops.rotation import rodrigues, rodrigues_inverse, rotmat_z

M = np.diag([-1.0, 1.0, 1.0]).astype(np.float32)


def test_axis_angle_mirror_is_conjugation():
    # rodrigues(aa * (1,-1,-1)) == M . rodrigues(aa) . M — the identity the
    # flip fixup relies on. With the left template being the x-mirror of
    # the right (v_L = M v_R), this gives verts_L(mirror(aa)) = M verts_R(aa).
    rng = np.random.default_rng(0)
    aa = jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32))
    mirrored = aa * jnp.asarray([1.0, -1.0, -1.0])
    lhs = rodrigues(mirrored)
    rhs = jnp.einsum("ij,bjk,kl->bil", M, rodrigues(aa), M)
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-5)


def test_mirror_commutes_with_inplane_rotation():
    # mirror(R_z(t) . R) = R_z(-t) . mirror(R): flipping after the in-plane
    # augmentation rotation is the same as rotating the flipped image the
    # other way — i.e. composing the rotation BEFORE mirroring (as
    # device_augment does) keeps pose labels consistent with the image.
    rng = np.random.default_rng(1)
    aa = jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32))
    theta = jnp.asarray(rng.uniform(-1.5, 1.5, (8,)).astype(np.float32))
    r = rodrigues(aa)
    rz = rotmat_z(theta)
    lhs = jnp.einsum("ij,bjk,kl->bil", M, jnp.einsum("bij,bjk->bik", rz, r), M)
    rhs = jnp.einsum(
        "bij,bjk->bik", rotmat_z(-theta),
        jnp.einsum("ij,bjk,kl->bil", M, r, M),
    )
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-5)


def test_pipeline_flip_branch_mirrors_and_swaps_pose():
    # Both branches of the flip `where` must appear in a large batch, and
    # each sample's output pose must be exactly one of:
    #   no flip: rotate_root(pose_h)
    #   flip:    mirror(rotate_root(pose_other))
    b = 32
    rng = np.random.default_rng(2)
    theta_deg = 37.0
    batch = {
        "img_u8": jnp.zeros((b, 256, 256, 3), jnp.uint8),
        "pose_left": jnp.asarray(
            rng.normal(size=(b, 48)).astype(np.float32) * 0.4),
        "pose_right": jnp.asarray(
            rng.normal(size=(b, 48)).astype(np.float32) * 0.4),
        "shape_left": jnp.zeros((b, 10)),
        "shape_right": jnp.ones((b, 10)),
    }
    for h in ("left", "right"):
        batch[f"v3d_{h}"] = jnp.asarray(
            rng.normal(size=(b, 778, 3)).astype(np.float32) * 0.05)
        batch[f"j3d_{h}"] = jnp.asarray(
            rng.normal(size=(b, 21, 3)).astype(np.float32) * 0.05)
        batch[f"v2d_{h}"] = jnp.asarray(
            rng.uniform(0, 256, (b, 778, 2)).astype(np.float32))
        batch[f"j2d_{h}"] = jnp.asarray(
            rng.uniform(0, 256, (b, 21, 2)).astype(np.float32))

    out = device_augment(
        batch, jax.random.PRNGKey(5), train=True,
        theta_range=(theta_deg, theta_deg),  # pin the rotation
        scale_range=(1.0, 1.0), flip=True,
    )

    def rotate_root(pose48):
        root = pose48[:, :3]
        new_root = rodrigues_inverse(
            jnp.einsum("bij,bjk->bik",
                       rotmat_z(jnp.full((b,), theta_deg)), rodrigues(root))
        )
        return jnp.concatenate([new_root, pose48[:, 3:]], -1)

    def mirror(pose48):
        p = pose48.reshape(b, 16, 3) * jnp.asarray([1.0, -1.0, -1.0])
        return p.reshape(b, 48)

    noflip = np.asarray(rotate_root(batch["pose_left"]))
    flipped = np.asarray(mirror(rotate_root(batch["pose_right"])))
    got = np.asarray(out["pose_left"])
    err_noflip = np.abs(got - noflip).max(axis=1)
    err_flip = np.abs(got - flipped).max(axis=1)
    is_flip = err_flip < err_noflip
    per_sample = np.where(is_flip, err_flip, err_noflip)
    assert per_sample.max() < 1e-4
    assert is_flip.any() and (~is_flip).any()
    # shape labels swap with the same mask
    shape_l = np.asarray(out["shape_left"])
    np.testing.assert_allclose(shape_l[is_flip], 1.0)
    np.testing.assert_allclose(shape_l[~is_flip], 0.0)
