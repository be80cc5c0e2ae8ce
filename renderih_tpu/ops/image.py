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
      img: (B, H, W, C) float OR uint8 images. uint8 input takes a TPU
        fast path (see `_warp_u8_stacked`) and returns float32; results
        are bit-identical to converting to float32 first.
      mat: (B, 3, 3) *forward* affine matrices (as cv.warpAffine takes).
      out_size: output side length (defaults to H).
    """
    b, h, w, c = img.shape
    out = out_size or h
    if img.dtype == jnp.uint8:
        return _warp_u8_stacked(img, mat, out)
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


def _warp_u8_stacked(img: jax.Array, mat: jax.Array, out: int) -> jax.Array:
    """uint8 warp via ONE gather of all four bilinear taps.

    The float path's four per-pixel `take_along_axis` gathers are the
    dominant cost of on-device augmentation on TPU (measured 462 ms for
    bs128 @ 256^2 on v5e — 3x the train step itself; XLA lowers each
    (B, H*W, C=3) gather with a padded minor dim and pays per-index
    overhead 4 times). Instead: pad the image, stack the four shifted
    neighbor views on the channel axis, and gather 4*C contiguous bytes
    per output pixel with a SINGLE index set — 1/4 the indices, 1/4 the
    gathers, uint8 instead of float32 (measured 3.4x: 462 -> ~135 ms).

    Exactness: the padded border supplies the same zeros the float
    path's validity masks produce for the -1/H/W edge taps, the
    per-tap masks below are the float path's masks verbatim, and uint8
    values convert to float32 exactly — so the result is bit-identical
    to `warp_affine_bilinear(img.astype(float32), mat)`
    (tests/test_image_ops.py::test_u8_warp_matches_float_path).
    """
    b, h, w, c = img.shape
    inv = jnp.linalg.inv(mat)
    ys = jnp.arange(out, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(ys, ys)
    coords = jnp.stack([gx, gy, jnp.ones_like(gx)], axis=-1)
    src = jnp.einsum("bij,hwj->bhwi", inv[:, :2, :], coords)
    sx, sy = src[..., 0], src[..., 1]
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = (sx - x0)[..., None]
    fy = (sy - y0)[..., None]

    # (h+3, w+3) zero border; four (h+1, w+1) shifted views on channels.
    p = jnp.pad(img, ((0, 0), (1, 2), (1, 2), (0, 0)))
    stk = jnp.concatenate(
        [p[:, :h + 1, :w + 1], p[:, :h + 1, 1:w + 2],
         p[:, 1:h + 2, :w + 1], p[:, 1:h + 2, 1:w + 2]], axis=-1)
    xi = jnp.clip(x0, -1, w - 1).astype(jnp.int32) + 1  # [0, w]
    yi = jnp.clip(y0, -1, h - 1).astype(jnp.int32) + 1  # [0, h]
    idx = (yi * (w + 1) + xi).reshape(b, -1, 1)
    flat = stk.reshape(b, (h + 1) * (w + 1), 4 * c)
    g = jnp.take_along_axis(flat, idx, axis=1) \
           .reshape(b, out, out, 4, c).astype(jnp.float32)

    # Same validity masks as the float path's four gathers; the padded
    # border already matches them at the -1/H/W edges, so the masks only
    # rewrite values where clipping pulled an interior pixel.
    def m(yy, xx):
        return ((xx >= 0) & (xx < w) & (yy >= 0) & (yy < h))[..., None]

    v00 = jnp.where(m(y0, x0), g[..., 0, :], 0.0)
    v01 = jnp.where(m(y0, x0 + 1), g[..., 1, :], 0.0)
    v10 = jnp.where(m(y0 + 1, x0), g[..., 2, :], 0.0)
    v11 = jnp.where(m(y0 + 1, x0 + 1), g[..., 3, :], 0.0)
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
