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


def test_ao_and_soft_shadow_shading():
    """AO/soft-shadow terms (Bunnell disk occlusion): with two meshes
    close together, occlusion must darken the lit render without touching
    coverage, and the raw per-vertex terms must dip where the meshes
    face each other."""
    from renderih_tpu.assets import make_synthetic_assets
    from renderih_tpu.render.renderer import (
        TwoHandRenderer,
        _occlusion_terms,
        _vertex_areas,
        _vertex_normals,
    )

    assets = make_synthetic_assets(seed=0)
    r = TwoHandRenderer(assets, img_size=64)
    b = 1
    vl = jnp.broadcast_to(assets.left.mano.v_template, (b, 778, 3))
    # overlapping: right sphere shifted only slightly in x and toward
    # the camera so the two surfaces nearly touch
    vr = jnp.broadcast_to(
        assets.right.mano.v_template
        + jnp.asarray([0.12, 0.0, -0.05]), (b, 778, 3))
    scale = {"left": jnp.full((b,), 0.8), "right": jnp.full((b,), 0.8)}
    trans2d = {"left": jnp.asarray([[-0.15, 0.0]]),
               "right": jnp.asarray([[0.15, 0.0]])}
    light = jnp.asarray([[0.6, 0.0, -0.8]])

    rgb0, mask0 = jax.jit(
        lambda *a: r.render_rgb_orth(*a, light_dir=light,
                                     ambient=jnp.full((b, 3), 0.3)))(
        scale, trans2d, vl, vr)
    rgb1, mask1 = jax.jit(
        lambda *a: r.render_rgb_orth(*a, light_dir=light,
                                     ambient=jnp.full((b, 3), 0.3),
                                     ao=0.8, soft_shadow=0.8))(
        scale, trans2d, vl, vr)
    np.testing.assert_array_equal(np.asarray(mask0), np.asarray(mask1))
    m = np.asarray(mask0[0]) > 0
    lit0 = np.asarray(rgb0[0])[m].mean()
    lit1 = np.asarray(rgb1[0])[m].mean()
    assert lit1 < lit0, (lit1, lit0)  # occlusion darkens
    assert lit1 > 0.1 * lit0  # ...but doesn't black out the render

    # raw terms: in [0, 1], and genuinely active (some vertex occluded)
    verts = jnp.concatenate([vl[0], vr[0]], axis=0)
    normals = _vertex_normals(verts, r.faces)
    areas = _vertex_areas(verts, r.faces)
    ao_v, sh_v = _occlusion_terms(verts, normals, areas, light[0])
    ao_v, sh_v = np.asarray(ao_v), np.asarray(sh_v)
    assert ao_v.min() >= 0.0 and ao_v.max() <= 1.0
    assert sh_v.min() >= 0.0 and sh_v.max() <= 1.0
    assert ao_v.min() < 0.98  # something is occluded
    assert sh_v.min() < 0.98  # something is shadowed


def test_pick_row_block_bounds_memory_and_divides_height():
    from renderih_tpu.render.rasterize import pick_row_block

    for batch, height, width, faces in [
        (1, 256, 256, 3076), (8, 256, 256, 3076), (64, 256, 256, 3076),
        (128, 64, 64, 1538), (512, 256, 256, 3076), (2, 100, 100, 10),
    ]:
        rb = pick_row_block(batch, height, width, faces)
        assert 1 <= rb <= 16
        assert height % rb == 0
        # the budget holds whenever a conforming block exists at all
        if batch * width * faces <= 100_000_000:
            assert batch * rb * width * faces <= 100_000_000
    # the OOM shape that motivated this: 64 vmapped 256^2 scenes must
    # not get the old fixed row_block=16 (3.2 GB per intermediate)
    assert pick_row_block(64, 256, 256, 3076) <= 2


def test_rasterize_invariant_to_row_block():
    from renderih_tpu.render.rasterize import rasterize_orthographic as rast

    key = jax.random.PRNGKey(0)
    v2d = jax.random.uniform(key, (12, 2)) * 30.0
    z = jax.random.uniform(jax.random.fold_in(key, 1), (12,))
    attrs = jax.random.uniform(jax.random.fold_in(key, 2), (12, 3))
    faces = jnp.array([[0, 1, 2], [3, 4, 5], [6, 7, 8], [9, 10, 11]])
    outs = [rast(v2d, z, attrs, faces, height=32, width=32, row_block=rb)
            for rb in (1, 4, 16)]
    for a, m, zb in outs[1:]:
        np.testing.assert_array_equal(np.asarray(m), np.asarray(outs[0][1]))
        np.testing.assert_allclose(np.asarray(a), np.asarray(outs[0][0]),
                                   atol=1e-6)
