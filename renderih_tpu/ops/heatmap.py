"""Joint heatmaps: Gaussian generation + DARK sub-pixel decoding.

Parity targets: `HeatmapGenerator` (`dataset/heatmap.py:11-39`) and the
DARK-style decoder `get_max_preds`/`taylor`/`get_final_preds2`
(`dataset/inference.py:20-127`). Both are batched pure-JAX.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

HEATMAP_SIZE = 64   # reference `dataset/dataset_utils.py:6`
HEATMAP_SIGMA = 2.0


def gaussian_heatmaps(
    joints2d: jax.Array,    # (B, J, 2) in heatmap pixel coords
    size: int = HEATMAP_SIZE,
    sigma: float = HEATMAP_SIGMA,
) -> jax.Array:
    """Render (B, J, size, size) Gaussian heatmaps (peak = 1)."""
    xs = jnp.arange(size, dtype=jnp.float32)
    gx = joints2d[..., 0][..., None]  # (B, J, 1)
    gy = joints2d[..., 1][..., None]
    ex = jnp.exp(-((xs - gx) ** 2) / (2 * sigma**2))  # (B, J, size)
    ey = jnp.exp(-((xs - gy) ** 2) / (2 * sigma**2))
    hm = ey[..., :, None] * ex[..., None, :]          # (B, J, H, W)
    valid = (
        (joints2d[..., 0] >= 0) & (joints2d[..., 0] < size)
        & (joints2d[..., 1] >= 0) & (joints2d[..., 1] < size)
    )
    return hm * valid[..., None, None]


def heatmap_argmax(heatmaps: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(B, J, H, W) -> integer peaks (B, J, 2) xy + peak values (B, J)."""
    b, j, h, w = heatmaps.shape
    flat = heatmaps.reshape(b, j, h * w)
    idx = jnp.argmax(flat, axis=-1)
    vals = jnp.take_along_axis(flat, idx[..., None], -1)[..., 0]
    xy = jnp.stack([idx % w, idx // w], axis=-1).astype(jnp.float32)
    return xy, vals


def decode_heatmaps_dark(heatmaps: jax.Array) -> jax.Array:
    """Sub-pixel peak refinement via the DARK Taylor expansion.

    Matches `taylor` (`dataset/inference.py:34-59`): a second-order
    expansion of log-heatmap around the integer argmax; falls back to the
    integer peak near borders or at non-invertible Hessians.
    """
    b, j, h, w = heatmaps.shape
    xy, vals = heatmap_argmax(heatmaps)
    lh = jnp.log(jnp.maximum(heatmaps, 1e-10))

    px = xy[..., 0].astype(jnp.int32)
    py = xy[..., 1].astype(jnp.int32)
    inb = (px > 1) & (px < w - 2) & (py > 1) & (py < h - 2)
    pxc = jnp.clip(px, 2, w - 3)
    pyc = jnp.clip(py, 2, h - 3)

    def at(dy, dx):
        return lh[
            jnp.arange(b)[:, None], jnp.arange(j)[None, :], pyc + dy, pxc + dx
        ]

    dx = 0.5 * (at(0, 1) - at(0, -1))
    dy = 0.5 * (at(1, 0) - at(-1, 0))
    dxx = 0.25 * (at(0, 2) - 2 * at(0, 0) + at(0, -2))
    dxy = 0.25 * (at(1, 1) - at(-1, 1) - at(1, -1) + at(-1, -1))
    dyy = 0.25 * (at(2, 0) - 2 * at(0, 0) + at(-2, 0))

    det = dxx * dyy - dxy * dxy
    ok = inb & (jnp.abs(det) > 1e-12)
    inv_det = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
    # offset = -H^-1 grad
    off_x = -(dyy * dx - dxy * dy) * inv_det
    off_y = -(-dxy * dx + dxx * dy) * inv_det
    off = jnp.stack([off_x, off_y], -1)
    off = jnp.clip(off, -1.0, 1.0)
    return xy + jnp.where(ok[..., None], off, 0.0)
