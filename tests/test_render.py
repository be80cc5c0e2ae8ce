import jax
import jax.numpy as jnp
import numpy as np
import pytest

from renderih_tpu.render.rasterize import rasterize_orthographic


def test_single_triangle_coverage():
    # Right triangle covering the lower-left half of a 32x32 image.
    verts2d = jnp.asarray([[0.0, 0.0], [31.0, 0.0], [0.0, 31.0]])
    z = jnp.zeros(3)
    attrs = jnp.asarray([[1.0], [1.0], [1.0]])
    faces = jnp.asarray([[0, 1, 2]], jnp.int32)
    attr, mask, zbuf = rasterize_orthographic(
        verts2d, z, attrs, faces, height=32, width=32, row_block=8
    )
    m = np.asarray(mask)
    assert m[1, 1]  # inside
    assert not m[31, 31]  # outside (diagonal)
    # roughly half the pixels covered
    assert 0.4 < m.mean() < 0.6


def test_depth_test_picks_nearer():
    verts2d = jnp.asarray(
        [[0.0, 0.0], [31.0, 0.0], [0.0, 31.0],
         [0.0, 0.0], [31.0, 0.0], [0.0, 31.0]]
    )
    z = jnp.asarray([1.0, 1.0, 1.0, 0.0, 0.0, 0.0])  # second tri nearer
    attrs = jnp.asarray([[1.0, 0.0]] * 3 + [[0.0, 1.0]] * 3)
    faces = jnp.asarray([[0, 1, 2], [3, 4, 5]], jnp.int32)
    attr, mask, _ = rasterize_orthographic(
        verts2d, z, attrs, faces, height=32, width=32, row_block=8
    )
    a = np.asarray(attr)
    assert a[4, 4, 1] == pytest.approx(1.0)
    assert a[4, 4, 0] == pytest.approx(0.0)


def test_barycentric_interpolation():
    verts2d = jnp.asarray([[0.0, 0.0], [30.0, 0.0], [0.0, 30.0]])
    z = jnp.zeros(3)
    attrs = jnp.asarray([[0.0], [30.0], [0.0]])  # attr = x along the edge
    faces = jnp.asarray([[0, 1, 2]], jnp.int32)
    attr, mask, _ = rasterize_orthographic(
        verts2d, z, attrs, faces, height=32, width=32, row_block=8
    )
    a = np.asarray(attr)[0]  # row y=0
    for x in (5, 10, 20):
        assert a[x, 0] == pytest.approx(x, abs=0.5)


def test_two_hand_renderer_mask():
    from renderih_tpu.assets import make_synthetic_assets
    from renderih_tpu.render.renderer import TwoHandRenderer

    assets = make_synthetic_assets(seed=0)
    r = TwoHandRenderer(assets, img_size=64)
    b = 1
    vl = jnp.broadcast_to(assets.left.mano.v_template, (b, 778, 3))
    vr = jnp.broadcast_to(assets.right.mano.v_template, (b, 778, 3))
    scale = {"left": jnp.full((b,), 0.8), "right": jnp.full((b,), 0.8)}
    trans2d = {
        "left": jnp.asarray([[-0.4, 0.0]]),
        "right": jnp.asarray([[0.4, 0.0]]),
    }
    rgb, mask = jax.jit(r.render_rgb_orth)(scale, trans2d, vl, vr)
    m = np.asarray(mask[0])
    assert rgb.shape == (b, 64, 64, 3)
    # the synthetic hands are ~0.1-radius spheres: small but present
    assert 0.003 < m.mean() < 0.95
    # left sphere is left of center
    left_half = m[:, :32].mean()
    right_half = m[:, 32:].mean()
    assert left_half > 0.01 and right_half > 0.01
