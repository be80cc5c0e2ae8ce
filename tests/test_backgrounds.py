"""Procedural backgrounds + randomized Phong lighting (synthetic-data
appearance randomization, standing in for the reference Blender pipeline's
random materials/lights/backgrounds, `rendering_code/steps.md` step 4)."""

import jax
import jax.numpy as jnp
import numpy as np

from renderih_tpu.render.backgrounds import (
    random_background,
    random_lighting,
    random_skin_albedo,
)


def test_background_corpus_samples_real_images(tmp_path):
    """--backgrounds path: corpus loads a directory of images and sampling
    returns augmented (flip/gain) variants of them."""
    import cv2

    from renderih_tpu.render.backgrounds import BackgroundCorpus

    rng = np.random.default_rng(0)
    for i in range(3):
        img = rng.integers(0, 255, (40 + 10 * i, 70, 3), np.uint8)
        cv2.imwrite(str(tmp_path / f"bg{i}.png"), img)
    corpus = BackgroundCorpus(str(tmp_path), size=32)
    assert corpus.images.shape == (3, 32, 32, 3)

    bg = jax.jit(lambda k: random_background(
        k, 8, 32, corpus=corpus))(jax.random.PRNGKey(1))
    b = np.asarray(bg)
    assert b.shape == (8, 32, 32, 3)
    assert b.min() >= 0.0 and b.max() <= 1.0 + 1e-6
    # each sample matches one corpus image up to flip + gain: check
    # correlation against the best corpus candidate
    imgs = np.asarray(corpus.images)
    cands = np.concatenate([imgs, imgs[:, :, ::-1]], axis=0)  # + flips
    for s in b:
        ratios = []
        for c in cands:
            denom = np.maximum(c, 1e-3)
            r = s / denom
            ratios.append(np.std(r[c > 0.05]))
        assert min(ratios) < 0.05  # near-constant gain vs one candidate


def test_random_background_shape_range():
    bg = jax.jit(lambda k: random_background(k, 4, 64))(jax.random.PRNGKey(0))
    b = np.asarray(bg)
    assert b.shape == (4, 64, 64, 3)
    assert b.min() >= 0.0 and b.max() <= 1.0 + 1e-6
    # samples differ from each other (mix of kinds / colors)
    assert np.std([b[i].mean() for i in range(4)]) > 1e-3


def test_random_background_deterministic():
    k = jax.random.PRNGKey(7)
    a = np.asarray(random_background(k, 2, 32))
    b = np.asarray(random_background(k, 2, 32))
    np.testing.assert_array_equal(a, b)


def test_random_skin_albedo():
    alb = random_skin_albedo(jax.random.PRNGKey(1), 3, 778)
    a = np.asarray(alb)
    assert a.shape == (3, 2 * 778, 3)
    assert a.min() >= 0.05 and a.max() <= 1.0
    # skin locus: red channel >= blue channel on average
    assert a[..., 0].mean() > a[..., 2].mean()


def test_random_lighting():
    d, color, amb = random_lighting(jax.random.PRNGKey(2), 5)
    d, color, amb = np.asarray(d), np.asarray(color), np.asarray(amb)
    assert d.shape == (5, 3) and color.shape == (5, 3) and amb.shape == (5, 3)
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
    assert (d[:, 2] < 0).all()  # camera-hemisphere light
    assert (amb > 0).all()


def test_renderer_lit_path():
    """The Phong-lit path renders, obeys the mask, and default (unlit)
    behavior is unchanged by the new kwargs."""
    from renderih_tpu.assets import make_synthetic_assets
    from renderih_tpu.render.renderer import TwoHandRenderer

    assets = make_synthetic_assets(seed=0)
    r = TwoHandRenderer(assets, img_size=64)
    b = 2
    vl = jnp.broadcast_to(assets.left.mano.v_template, (b, 778, 3))
    vr = jnp.broadcast_to(assets.right.mano.v_template, (b, 778, 3))
    scale = {"left": jnp.full((b,), 0.8), "right": jnp.full((b,), 0.8)}
    trans2d = {
        "left": jnp.broadcast_to(jnp.asarray([-0.4, 0.0]), (b, 2)),
        "right": jnp.broadcast_to(jnp.asarray([0.4, 0.0]), (b, 2)),
    }

    key = jax.random.PRNGKey(3)
    albedo = random_skin_albedo(key, b, r.num_verts)
    light_dir, light_color, ambient = random_lighting(jax.random.fold_in(key, 1), b)
    rgb, mask = jax.jit(
        lambda s, t, a, b_, alb, ld, lc, amb: r.render_rgb_orth(
            s, t, a, b_, albedo=alb, light_dir=ld, light_color=lc,
            ambient=amb, specular=0.15)
    )(scale, trans2d, vl, vr, albedo, light_dir, light_color, ambient)
    assert rgb.shape == (b, 64, 64, 3)
    m = np.asarray(mask)
    assert m.mean() > 0.003
    a = np.asarray(rgb)
    assert a.min() >= 0.0 and a.max() <= 1.0 + 1e-6
    # foreground pixels are non-black (ambient floor guarantees light)
    fg = a[m > 0]
    assert fg.mean() > 0.02

    # default path: same result with and without the new kwargs
    rgb0, _ = r.render_rgb_orth(scale, trans2d, vl, vr)
    rgb1, _ = r.render_rgb_orth(scale, trans2d, vl, vr, albedo=None,
                                light_dir=None)
    np.testing.assert_allclose(np.asarray(rgb0), np.asarray(rgb1), atol=1e-6)
