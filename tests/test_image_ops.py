import jax
import jax.numpy as jnp
import numpy as np
import pytest

from renderih_tpu.ops.image import (
    affine_mat,
    add_noise,
    normalize_imagenet,
    transform_points2d,
    warp_affine_bilinear,
)

cv = pytest.importorskip("cv2")


def _ref_affine_mat(theta, scale, u, v, size):
    """Mirror of imgUtils.get_affine_mat for oracle checks."""
    import math

    center = np.array([size / 2, size / 2, 1], dtype="float32")
    t = theta * (3.14159 / 180)
    rot = np.zeros((3, 3), "float32")
    rot[0, 0] = math.cos(t); rot[0, 1] = -math.sin(t)
    rot[1, 0] = math.sin(t); rot[1, 1] = math.cos(t)
    rot[2, 2] = 1.0
    tt = (np.identity(3, "float32") - rot) @ center
    rot[0, 2], rot[1, 2] = tt[0], tt[1]
    sc = np.zeros((3, 3), "float32")
    sc[0, 0] = scale; sc[1, 1] = scale; sc[2, 2] = 1.0
    tt = (np.identity(3, "float32") - sc) @ center
    sc[0, 2], sc[1, 2] = tt[0], tt[1]
    tr = np.identity(3, "float32")
    tr[0, 2], tr[1, 2] = u, v
    return tr @ (sc @ rot)


def test_affine_mat_matches_reference():
    for theta, scale, u, v in [(30.0, 1.1, 3.0, -2.0), (-75.0, 0.8, 0.0, 5.0)]:
        got = np.asarray(affine_mat(theta, scale, u, v, 256.0))
        want = _ref_affine_mat(theta, scale, u, v, 256)
        np.testing.assert_allclose(got, want, atol=1e-4)


def test_warp_matches_cv2():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (1, 64, 64, 3)).astype(np.float32)
    mat = _ref_affine_mat(25.0, 1.05, 2.0, -1.0, 64)
    got = np.asarray(
        warp_affine_bilinear(jnp.asarray(img), jnp.asarray(mat[None]), 64)
    )[0]
    want = cv.warpAffine(img[0], mat[:2], dsize=(64, 64), flags=cv.INTER_LINEAR,
                         borderMode=cv.BORDER_CONSTANT, borderValue=0)
    # interior pixels match bilinear cv2 closely
    diff = np.abs(got - want)
    assert np.quantile(diff, 0.99) < 1.0
    assert diff.mean() < 0.2


def test_transform_points_matches_mat():
    rng = np.random.default_rng(1)
    pts = rng.uniform(0, 256, (2, 10, 2)).astype(np.float32)
    mat = np.stack([
        _ref_affine_mat(30.0, 1.1, 3.0, -2.0, 256),
        _ref_affine_mat(-10.0, 0.95, 0.0, 1.0, 256),
    ])
    got = np.asarray(transform_points2d(jnp.asarray(pts), jnp.asarray(mat)))
    want = np.einsum("bij,bnj->bni", mat[:, :2, :2], pts) + mat[:, None, :2, 2]
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_warp_then_points_consistent():
    """A label point warps to where its pixel lands."""
    img = np.zeros((1, 64, 64, 3), np.float32)
    img[0, 40, 24] = 255.0  # point at (x=24, y=40)
    mat = _ref_affine_mat(45.0, 1.0, 0.0, 0.0, 64)
    warped = np.asarray(
        warp_affine_bilinear(jnp.asarray(img), jnp.asarray(mat[None]), 64)
    )[0].sum(-1)
    pt = np.asarray(
        transform_points2d(jnp.asarray([[[24.0, 40.0]]]), jnp.asarray(mat[None]))
    )[0, 0]
    yy, xx = np.unravel_index(np.argmax(warped), warped.shape)
    assert abs(xx - pt[0]) <= 1.5 and abs(yy - pt[1]) <= 1.5


def test_u8_warp_matches_float_path():
    """uint8 fast path is bit-identical to float32-first warping.

    Covers border clipping on all four sides: rotation + downscale +
    translation push sample coords well outside [0, W) so every clip
    branch and validity mask fires.
    """
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (3, 48, 48, 3), dtype=np.uint8)
    mats = np.stack([
        _ref_affine_mat(37.0, 0.6, 9.0, -11.0, 48),
        _ref_affine_mat(-120.0, 1.7, -5.0, 3.0, 48),
        _ref_affine_mat(0.0, 1.0, 40.0, 40.0, 48),  # mostly border
    ])
    fast = np.asarray(
        warp_affine_bilinear(jnp.asarray(img), jnp.asarray(mats), 48))
    ref = np.asarray(
        warp_affine_bilinear(jnp.asarray(img, jnp.float32), jnp.asarray(mats), 48))
    np.testing.assert_array_equal(fast, ref)
    assert fast.dtype == np.float32


def test_add_noise_bounds():
    img = jnp.full((2, 8, 8, 3), 128.0)
    out = np.asarray(add_noise(img, jax.random.PRNGKey(0), noise=0.01))
    assert out.min() >= 0.0 and out.max() <= 255.0
    assert np.abs(out - 128.0).max() > 0


def test_normalize_imagenet():
    img = jnp.ones((1, 2, 2, 3)) * 0.5
    out = np.asarray(normalize_imagenet(img))
    want = (0.5 - np.array([0.485, 0.456, 0.406])) / np.array(
        [0.229, 0.224, 0.225]
    )
    np.testing.assert_allclose(out[0, 0, 0], want, rtol=1e-5)
