"""Pinhole (perspective) camera path: projection oracle + rendering.

Reference behavior being matched: `utils/compute_maskiou.py:190-198`
projects camera-space verts through the per-frame `cameraIn` intrinsics
(`p = v @ K.T; uv = p[:, :2] / p[:, 2:]`) and renders masks with
`PerspectiveCameras` built from the same matrix
(`utils/vis_utils.py:72-80`).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from renderih_tpu.assets import make_synthetic_assets
from renderih_tpu.ops.projection import orthographic_project, pinhole_project
from renderih_tpu.render.renderer import TwoHandRenderer

RES = 64


@pytest.fixture(scope="module")
def assets():
    return make_synthetic_assets(seed=0)


def _intrinsics(f, c):
    return np.array([[f, 0.0, c], [0.0, f, c], [0.0, 0.0, 1.0]], np.float32)


def test_pinhole_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    b, n = 3, 50
    pts = rng.normal(size=(b, n, 3)).astype(np.float32)
    pts[..., 2] = np.abs(pts[..., 2]) + 0.5  # in front of the camera
    K = np.stack([_intrinsics(100.0 + 20 * i, 32.0 + i) for i in range(b)])
    # skewless but non-centered variant with fx != fy
    K[:, 0, 0] *= 1.1

    uv, depth = pinhole_project(jnp.asarray(pts), jnp.asarray(K))

    # NumPy oracle, written exactly like the reference
    # (`utils/compute_maskiou.py:193-197`)
    for i in range(b):
        p = pts[i] @ K[i].T
        ref = p[:, :2] / p[:, 2:]
        np.testing.assert_allclose(np.asarray(uv[i]), ref, rtol=1e-5,
                                   atol=1e-5)
    np.testing.assert_allclose(np.asarray(depth), pts[..., 2], atol=1e-7)


def _hand_pair_at_depth(assets, z0):
    """Both template hands, side by side, centered at camera depth z0."""
    vl = np.asarray(assets.left.mano.v_template, np.float32).copy()
    vr = np.asarray(assets.right.mano.v_template, np.float32).copy()
    for v, dx in ((vl, -0.06), (vr, 0.06)):
        v -= v.mean(axis=0, keepdims=True)
        v[:, 0] += dx
        v[:, 2] += z0
    return vl[None], vr[None]


def test_perspective_mask_shrinks_with_depth(assets):
    """Pushing the scene away shrinks the pinhole mask ~quadratically;
    the orthographic camera (same scale) is depth-invariant — the
    'expected direction' check for the perspective/orthographic split."""
    r = TwoHandRenderer(assets, img_size=RES)
    K = jnp.asarray(_intrinsics(120.0, RES / 2.0)[None])

    areas = {}
    for name, z0 in (("near", 0.4), ("far", 0.8)):
        vl, vr = _hand_pair_at_depth(assets, z0)
        mask = r.render_mask_perspective(K, jnp.asarray(vl), jnp.asarray(vr))
        areas[name] = float(np.asarray(mask).sum())
    assert areas["near"] > 0 and areas["far"] > 0
    ratio = areas["near"] / areas["far"]
    assert 2.5 < ratio < 6.0, ratio  # ~ (0.8/0.4)^2 = 4

    # Orthographic masks of the same two scenes are identical: depth
    # only enters the z-buffer, not the footprint.
    sc = {"left": jnp.full((1,), 0.5), "right": jnp.full((1,), 0.5)}
    tr = {"left": jnp.zeros((1, 2)), "right": jnp.zeros((1, 2))}
    orth = {}
    for name, z0 in (("near", 0.4), ("far", 0.8)):
        vl, vr = _hand_pair_at_depth(assets, z0)
        orth[name] = np.asarray(
            r.render_mask(sc, tr, jnp.asarray(vl), jnp.asarray(vr)))
    np.testing.assert_array_equal(orth["near"], orth["far"])


def test_perspective_agrees_with_orth_at_matched_scale(assets):
    """At the reference depth, a pinhole camera with f = s*S*z0 and
    centered principal point produces (to first order in extent/z0) the
    same footprint as the orthographic camera with scale s — IoU must be
    high but < 1 (perspective foreshortening is real)."""
    r = TwoHandRenderer(assets, img_size=RES)
    z0, s = 0.5, 1.5  # template z spans z0 +- 0.1 -> +-20% foreshortening
    vl, vr = _hand_pair_at_depth(assets, z0)
    K = jnp.asarray(_intrinsics(s * RES * z0, RES / 2.0)[None])
    mp = np.asarray(
        r.render_mask_perspective(K, jnp.asarray(vl), jnp.asarray(vr)))[0]

    sc = {"left": jnp.full((1,), s), "right": jnp.full((1,), s)}
    tr = {"left": jnp.zeros((1, 2)), "right": jnp.zeros((1, 2))}
    # orthographic projection ignores z; recenter verts around z=0 depth
    mo = np.asarray(r.render_mask(sc, tr, jnp.asarray(vl),
                                  jnp.asarray(vr)))[0]
    inter = np.logical_and(mp > 0, mo > 0).sum()
    union = np.logical_or(mp > 0, mo > 0).sum()
    assert union > 0
    iou = inter / union
    # high overlap, but strictly < 1: at this focal length the template's
    # +-0.1 depth extent foreshortens footprints by +-20%, which must
    # move mask pixels that the orthographic camera cannot
    assert 0.6 < iou < 0.999, iou


def test_render_rgb_perspective_shades(assets):
    r = TwoHandRenderer(assets, img_size=RES)
    vl, vr = _hand_pair_at_depth(assets, 0.5)
    K = jnp.asarray(_intrinsics(60.0, RES / 2.0)[None])
    rgb, mask = r.render_rgb_perspective(K, jnp.asarray(vl), jnp.asarray(vr))
    rgb, mask = np.asarray(rgb), np.asarray(mask)
    assert rgb.shape == (1, RES, RES, 3) and mask.shape == (1, RES, RES)
    assert mask.sum() > 0
    assert np.all(rgb >= 0) and np.all(rgb <= 1)
    # foreground pixels carry the hand base colors, background is black
    assert rgb[0][mask[0] > 0].mean() > 0.05
    assert np.abs(rgb[0][mask[0] == 0]).max() == 0.0
