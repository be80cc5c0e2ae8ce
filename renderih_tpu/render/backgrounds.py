"""Random backgrounds for synthetic data generation.

The reference's Blender pipeline composites rendered hands over random
background *images* and randomizes materials/lighting
(`rendering_code/step4_load_mano_diffbg.py`, `steps.md` step 4). Two
modes here:

  * `BackgroundCorpus` — a directory of real images, preloaded to a
    device-resident (N, S, S, 3) stack; sampling gathers random images
    with on-device flip/color jitter. This matches the reference's
    corpus randomization when the user supplies images
    (`tools/synth_gen.py --backgrounds DIR`).
  * procedural fallback (`random_background` without a corpus):
    multi-octave value noise, linear gradients, and solid colors, mixed
    per sample — used when no corpus is available (e.g. CI).

Everything after loading is jittable and batched.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np


def _value_noise(key: jax.Array, bs: int, size: int,
                 octaves: int = 4, base: int = 4) -> jax.Array:
    """Multi-octave value noise in [0, 1], shape (bs, size, size, 3).

    Each octave is a coarse random grid bilinearly upsampled to full
    resolution; amplitudes halve per octave.
    """
    keys = jax.random.split(key, octaves)
    img = jnp.zeros((bs, size, size, 3))
    amp_total = 0.0
    for i in range(octaves):
        res = base * (2 ** i)
        amp = 0.5 ** i
        grid = jax.random.uniform(keys[i], (bs, res, res, 3))
        up = jax.image.resize(grid, (bs, size, size, 3), method="linear")
        img = img + amp * up
        amp_total += amp
    return img / amp_total


def _gradient(key: jax.Array, bs: int, size: int) -> jax.Array:
    """Random linear two-color gradient, shape (bs, size, size, 3)."""
    k1, k2, k3 = jax.random.split(key, 3)
    c0 = jax.random.uniform(k1, (bs, 1, 1, 3))
    c1 = jax.random.uniform(k2, (bs, 1, 1, 3))
    theta = jax.random.uniform(k3, (bs,), minval=0.0, maxval=2 * jnp.pi)
    yy, xx = jnp.meshgrid(jnp.linspace(0, 1, size), jnp.linspace(0, 1, size),
                          indexing="ij")
    t = (xx[None] * jnp.cos(theta)[:, None, None]
         + yy[None] * jnp.sin(theta)[:, None, None])
    t = (t - t.min(axis=(1, 2), keepdims=True)) / (
        t.max(axis=(1, 2), keepdims=True)
        - t.min(axis=(1, 2), keepdims=True) + 1e-9)
    return c0 + (c1 - c0) * t[..., None]


class BackgroundCorpus:
    """Directory of background images -> device-resident sampler.

    Images are center-cropped to square and resized to `size` at load
    time (cv2, host-side, once); `sample` is pure-jax: random image pick
    + random horizontal flip + brightness jitter per sample.
    """

    EXTS = (".jpg", ".jpeg", ".png", ".bmp")

    def __init__(self, directory: str, size: int = 256, limit: int = 4096):
        import cv2

        paths = sorted(
            os.path.join(directory, f) for f in os.listdir(directory)
            if f.lower().endswith(self.EXTS))[:limit]
        if not paths:
            raise ValueError(f"no background images in {directory}")
        imgs = []
        for p in paths:
            img = cv2.imread(p, cv2.IMREAD_COLOR)
            if img is None:
                continue
            h, w = img.shape[:2]
            s = min(h, w)
            y0, x0 = (h - s) // 2, (w - s) // 2
            img = cv2.resize(img[y0:y0 + s, x0:x0 + s],
                             (size, size), interpolation=cv2.INTER_AREA)
            imgs.append(img[..., ::-1])  # BGR -> RGB
        if not imgs:
            raise ValueError(f"no readable background images in {directory}")
        self.size = size
        self.images = jnp.asarray(
            np.stack(imgs).astype(np.float32) / 255.0)  # (N, S, S, 3)

    def sample(self, key: jax.Array, bs: int) -> jax.Array:
        """(bs, size, size, 3) in [0, 1], randomized per sample."""
        k_idx, k_flip, k_gain = jax.random.split(key, 3)
        idx = jax.random.randint(k_idx, (bs,), 0, self.images.shape[0])
        imgs = self.images[idx]
        flip = jax.random.bernoulli(k_flip, 0.5, (bs,))
        imgs = jnp.where(flip[:, None, None, None], imgs[:, :, ::-1], imgs)
        gain = jax.random.uniform(k_gain, (bs, 1, 1, 1),
                                  minval=0.7, maxval=1.2)
        return jnp.clip(imgs * gain, 0.0, 1.0)


def random_background(key: jax.Array, bs: int, size: int,
                      corpus: BackgroundCorpus | None = None) -> jax.Array:
    """Batched random background in [0, 1], shape (bs, size, size, 3).

    With `corpus`, samples augmented real images (the reference's
    Blender-pipeline behavior); otherwise per sample randomly one of:
    solid color, linear gradient, value-noise texture, or
    gradient x texture blend.
    """
    if corpus is not None:
        assert corpus.size == size, (corpus.size, size)
        return corpus.sample(key, bs)
    k_kind, k_solid, k_grad, k_noise, k_tint = jax.random.split(key, 5)
    solid = jnp.broadcast_to(
        jax.random.uniform(k_solid, (bs, 1, 1, 3)), (bs, size, size, 3))
    grad = _gradient(k_grad, bs, size)
    noise = _value_noise(k_noise, bs, size)
    # tinted noise reads as a natural texture more than raw RGB noise
    tint = jax.random.uniform(k_tint, (bs, 1, 1, 3), minval=0.3, maxval=1.0)
    textured = noise * tint
    blend = 0.5 * grad + 0.5 * textured

    kind = jax.random.randint(k_kind, (bs,), 0, 4)
    stack = jnp.stack([solid, grad, textured, blend], axis=1)  # (bs,4,H,W,3)
    return jnp.take_along_axis(
        stack, kind[:, None, None, None, None], axis=1
    )[:, 0]


def random_skin_albedo(key: jax.Array, bs: int, num_verts: int) -> jax.Array:
    """Per-hand randomized skin-tone albedo, shape (bs, 2*num_verts, 3).

    Skin tones sampled along a dark-to-light melanin axis with small
    channel jitter and low-frequency per-vertex variation; the two hands
    of one sample share a tone (one subject), matching the reference's
    per-body material sampling.
    """
    k_tone, k_jit, k_var = jax.random.split(key, 3)
    # base skin locus: interpolate dark <-> light
    dark = jnp.array([0.35, 0.22, 0.15])
    light = jnp.array([0.95, 0.78, 0.67])
    t = jax.random.uniform(k_tone, (bs, 1))
    base = dark[None] + (light - dark)[None] * t          # (bs, 3)
    base = base + jax.random.normal(k_jit, (bs, 3)) * 0.03
    # low-frequency vertex variation (knuckle/palm shading stand-in)
    var = jax.random.normal(k_var, (bs, 16, 3)) * 0.04
    var = jax.image.resize(var, (bs, 2 * num_verts, 3), method="linear")
    return jnp.clip(base[:, None, :] + var, 0.05, 1.0)


def random_lighting(key: jax.Array, bs: int):
    """Random directional light: (dir (bs,3) unit, color (bs,3), ambient
    (bs,3)). Direction is biased toward the camera hemisphere (z < 0)."""
    k_dir, k_col, k_amb = jax.random.split(key, 3)
    d = jax.random.normal(k_dir, (bs, 3))
    d = d.at[:, 2].set(-jnp.abs(d[:, 2]) - 0.5)
    d = d / (jnp.linalg.norm(d, axis=-1, keepdims=True) + 1e-9)
    color = jax.random.uniform(k_col, (bs, 1), minval=0.5, maxval=1.1)
    color = jnp.broadcast_to(color, (bs, 3)) * jax.random.uniform(
        jax.random.fold_in(k_col, 1), (bs, 3), minval=0.9, maxval=1.0)
    ambient = jax.random.uniform(k_amb, (bs, 1), minval=0.15, maxval=0.45)
    return d, color, jnp.broadcast_to(ambient, (bs, 3))
