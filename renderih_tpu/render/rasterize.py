"""Minimal orthographic z-buffer rasterizer in pure JAX.

Replaces the pytorch3d `MeshRasterizer` dependency of the reference
(`utils/vis_utils.py:14-57`) for the uses the pipeline actually has:
hard-shaded demo overlays, binary masks and densepose/vertex-color maps
(`utils/vis_utils.py:206-289`). Not a general renderer — one face per
pixel (hard z-test), flat (non-perspective-correct) barycentric
interpolation. The rasterizer itself is camera-agnostic: it consumes
already-projected pixel coords + a depth key, so both the orthographic
(`ops/projection.py:orthographic_project`) and pinhole
(`ops/projection.py:pinhole_project`) cameras feed it.

Formulation: per (pixel, face) edge-function test, vectorized as einsums,
processed in pixel-row blocks through `lax.map` to bound memory. For a
256^2 image and 3076 two-hand faces this is ~0.2 GFLOP — one MXU pass.
Smaller-z wins the depth test (camera looks along +z, matching the
reference's pytorch3d camera setup where the mesh z is negated,
`utils/vis_utils.py:75-77`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _raster_rows(
    verts2d: jax.Array,   # (V, 2) pixel coords
    z: jax.Array,         # (V,) depth (smaller = closer)
    attrs: jax.Array,     # (V, A) per-vertex attributes to interpolate
    faces: jax.Array,     # (F, 3)
    ys: jax.Array,        # (R,) row coordinates
    width: int,
):
    tri = verts2d[faces]               # (F, 3, 2)
    tz = z[faces]                      # (F, 3)
    ta = attrs[faces]                  # (F, 3, A)

    v0 = tri[:, 0]
    e1 = tri[:, 1] - v0                # (F, 2)
    e2 = tri[:, 2] - v0
    det = e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0]   # (F,)
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)

    xs = jnp.arange(width, dtype=jnp.float32)
    px, py = jnp.meshgrid(xs, ys)      # (R, W)
    p = jnp.stack([px, py], -1).reshape(-1, 2)  # (N, 2)

    d = p[:, None, :] - v0[None, :, :]          # (N, F, 2)
    # barycentric u (for e1), v (for e2)
    u = (d[..., 0] * e2[None, :, 1] - d[..., 1] * e2[None, :, 0]) * inv_det
    v = (-d[..., 0] * e1[None, :, 1] + d[..., 1] * e1[None, :, 0]) * inv_det
    w = 1.0 - u - v
    inside = (u >= 0) & (v >= 0) & (w >= 0) & (jnp.abs(det)[None, :] > 1e-12)

    zi = w * tz[None, :, 0] + u * tz[None, :, 1] + v * tz[None, :, 2]
    zi = jnp.where(inside, zi, jnp.inf)
    best = jnp.argmin(zi, axis=1)               # (N,)
    hit = jnp.take_along_axis(zi, best[:, None], 1)[:, 0] < jnp.inf

    idx = best
    ub = jnp.take_along_axis(u, idx[:, None], 1)[:, 0]
    vb = jnp.take_along_axis(v, idx[:, None], 1)[:, 0]
    wb = 1.0 - ub - vb
    fa = ta[idx]                                # (N, 3, A)
    attr = (
        wb[:, None] * fa[:, 0] + ub[:, None] * fa[:, 1] + vb[:, None] * fa[:, 2]
    )
    zbuf = jnp.take_along_axis(zi, idx[:, None], 1)[:, 0]
    # zero attributes on miss: barycentric extrapolation of the argmin face
    # would otherwise leave unbounded garbage in background pixels
    attr = jnp.where(hit[:, None], attr, 0.0)
    r = ys.shape[0]
    return (
        attr.reshape(r, width, -1),
        hit.reshape(r, width),
        jnp.where(hit, zbuf, jnp.inf).reshape(r, width),
    )


@partial(jax.jit, static_argnames=("height", "width", "row_block"))
def rasterize_orthographic(
    verts2d: jax.Array,
    z: jax.Array,
    attrs: jax.Array,
    faces: jax.Array,
    height: int = 256,
    width: int = 256,
    row_block: int = 16,
):
    """Rasterize one mesh. Returns (attr (H,W,A), mask (H,W), zbuf (H,W)).

    Batch with `jax.vmap` over (verts2d, z, attrs).
    """
    ys = jnp.arange(height, dtype=jnp.float32).reshape(-1, row_block)

    def do_rows(row_ys):
        return _raster_rows(verts2d, z, attrs, faces, row_ys, width)

    attr, mask, zbuf = jax.lax.map(do_rows, ys)
    a = attr.reshape(height, width, -1)
    return a, mask.reshape(height, width), zbuf.reshape(height, width)


def pick_row_block(batch: int, height: int, width: int, n_faces: int,
                   budget_elems: int = 100_000_000) -> int:
    """Largest divisor of `height` (<=16) whose per-`lax.map`-step
    rasterizer intermediates stay under `budget_elems` f32 elements
    when `batch` scenes are vmapped together.

    The hot buffers are (batch, row_block*width, n_faces) barycentrics
    (u/v/zi, plus the (…, 2) pixel-delta) — at the old fixed
    row_block=16, 64 vmapped 256^2 scenes against 3076 two-hand faces
    made each ~3.2 GB and OOM'd v5e HBM. 100M elements bounds each at
    ~400 MB regardless of batch.
    """
    per_row = max(1, batch) * width * max(1, n_faces)
    rb = max(1, min(16, int(budget_elems // per_row)))
    while height % rb:
        rb -= 1
    return rb
