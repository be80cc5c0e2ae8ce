"""Device-side image ops: affine augmentation, noise, normalization.

The reference does augmentation on CPU in DataLoader workers with
`cv.warpAffine` (`utils/manoutils.py:196-260`); here the same transforms
run *on device, batched* inside the jitted input step, keeping host CPUs
free for IO:

  * `affine_mat` reproduces `imgUtils.get_affine_mat` exactly — rotation
    about the image center (same 3.14159 pi), scale about the center,
    then pixel translation.
  * `warp_affine_bilinear` matches cv.warpAffine(INTER_LINEAR,
    BORDER_CONSTANT=0) semantics: output pixel (x, y) samples the input at
    M^-1 (x, y), bilinear, zeros outside.
  * `add_noise` matches `imgUtils.add_noise`: per-channel brightness gain,
    scalar offset, additive gaussian, clip to [0, 255].
  * ImageNet normalization matches torchvision
    (`core/loader.py:49-50`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

_PI = 3.14159  # reference's pi approximation (`utils/manoutils.py:159`)


def affine_mat(theta_deg, scale, u, v, size: float) -> jax.Array:
    """Forward 3x3 affine: rotate by theta about center, scale, translate.

    Matches `imgUtils.get_affine_mat` (`utils/manoutils.py:183-194`) with
    height = width = size. All args are scalars or (B,) arrays.
    """
    theta_deg, scale, u, v = jnp.broadcast_arrays(
        jnp.asarray(theta_deg, jnp.float32), jnp.asarray(scale, jnp.float32),
        jnp.asarray(u, jnp.float32), jnp.asarray(v, jnp.float32),
    )
    t = theta_deg * (_PI / 180.0)
    c, s = jnp.cos(t), jnp.sin(t)
    half = size / 2.0
    zeros = jnp.zeros_like(t)
    ones = jnp.ones_like(t)

    # rotation about center
    rot = jnp.stack([
        jnp.stack([c, -s, half - (c * half - s * half)], -1),
        jnp.stack([s, c, half - (s * half + c * half)], -1),
        jnp.stack([zeros, zeros, ones], -1),
    ], -2)
    # scale about center
    sc = jnp.stack([
        jnp.stack([scale, zeros, half * (1 - scale)], -1),
        jnp.stack([zeros, scale, half * (1 - scale)], -1),
        jnp.stack([zeros, zeros, ones], -1),
    ], -2)
    # translation
    tr = jnp.stack([
        jnp.stack([ones, zeros, u], -1),
        jnp.stack([zeros, ones, v], -1),
        jnp.stack([zeros, zeros, ones], -1),
    ], -2)
    return tr @ (sc @ rot)


def warp_affine_bilinear(img: jax.Array, mat: jax.Array,
                         out_size: int | None = None) -> jax.Array:
    """Batched cv.warpAffine(INTER_LINEAR, BORDER_CONSTANT=0) equivalent.

    Args:
      img: (B, H, W, C) float images.
      mat: (B, 3, 3) *forward* affine matrices (as cv.warpAffine takes).
      out_size: output side length (defaults to H).
    """
    b, h, w, c = img.shape
    out = out_size or h
    inv = jnp.linalg.inv(mat)  # sample input at inv @ output coords

    ys = jnp.arange(out, dtype=jnp.float32)
    xs = jnp.arange(out, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)  # (out, out)
    ones = jnp.ones_like(gx)
    coords = jnp.stack([gx, gy, ones], axis=-1)  # (out, out, 3)
    src = jnp.einsum("bij,hwj->bhwi", inv[:, :2, :], coords)  # (B,out,out,2)
    sx, sy = src[..., 0], src[..., 1]

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0

    def gather(yy, xx):
        valid = (xx >= 0) & (xx < w) & (yy >= 0) & (yy < h)
        xi = jnp.clip(xx, 0, w - 1).astype(jnp.int32)
        yi = jnp.clip(yy, 0, h - 1).astype(jnp.int32)
        flat = img.reshape(b, h * w, c)
        idx = yi * w + xi  # (B, out, out)
        vals = jnp.take_along_axis(
            flat, idx.reshape(b, -1, 1), axis=1
        ).reshape(b, out, out, c)
        return jnp.where(valid[..., None], vals, 0.0)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    fx = fx[..., None]
    fy = fy[..., None]
    return (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )


def transform_points2d(pts: jax.Array, mat: jax.Array) -> jax.Array:
    """Apply (B, 3, 3) forward affines to (B, N, 2) points."""
    return jnp.einsum("bij,bnj->bni", mat[:, :2, :2], pts) + mat[:, None, :2, 2]


def add_noise(img: jax.Array, rng: jax.Array, noise: float = 0.0,
              scale: float = 255.0, alpha: float = 0.3,
              beta: float = 0.05) -> jax.Array:
    """Brightness + gaussian noise (`imgUtils.add_noise`). img: (B,H,W,C)."""
    b = img.shape[0]
    k1, k2, k3 = jax.random.split(rng, 3)
    gain = jax.random.uniform(k1, (b, 1, 1, img.shape[-1]),
                              minval=1 - alpha, maxval=1 + alpha)
    offset = scale * beta * (
        2.0 * jax.random.uniform(k2, (b, 1, 1, 1)) - 1.0
    )
    gauss = scale * noise * jax.random.normal(k3, img.shape)
    return jnp.clip(gain * img + offset + gauss, 0.0, scale)


def normalize_imagenet(img01: jax.Array) -> jax.Array:
    """[0,1] RGB -> ImageNet-normalized."""
    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)
    return (img01 - mean) / std
