"""Signed-distance-field voxelization + penetration loss (pure JAX).

TPU-native replacement for the reference CUDA extension
(`pose_data_optimize/sdf/sdf/csrc/sdf_cuda_kernel.cu:243-335`): for each
mesh in a batch, computes an unsigned distance field phi on a G^3 voxel
grid over a normalized bbox, with phi = 0 inside the mesh (parity
ray-cast). Used by:

  * the training-time penetration loss (`cfg.sdf`, plumbing at
    `common/myhand/lijun_model_graph.py:45-50`), where the gradient flows
    through trilinear sampling of phi — the field itself is built under
    stop_gradient, exactly like the reference's no-backward SDFFunction
    (`pose_data_optimize/sdf/sdf/sdf.py:8-30`);
  * the offline pose-optimization toolchain's anti-penetration term.

Formulation: exact point-triangle distances as a (voxels, faces) batched
computation (Eberly's region decomposition expressed as where-chains) and
Moller-Trumbore +x ray-casting for the inside test. XLA maps the
(32768 x 1538) pair grid onto the VPU/MXU in blocks via `lax.map`.
A Pallas kernel with on-chip face tiles lives in
`renderih_tpu/kernels/sdf_pallas.py` for the hot path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_EPS = 1e-12


def point_triangle_distance_sq(p: jax.Array, tri: jax.Array) -> jax.Array:
    """Squared distance from points to triangles, fully broadcast.

    p: (..., 3); tri: (..., 3, 3) — leading dims must broadcast.
    Eberly's algorithm: minimize |B + s e0 + t e1 - p|^2 over the simplex
    s >= 0, t >= 0, s + t <= 1, via closed-form region analysis.
    """
    b = tri[..., 0, :]
    e0 = tri[..., 1, :] - b
    e1 = tri[..., 2, :] - b
    d = b - p

    a00 = jnp.sum(e0 * e0, -1)
    a01 = jnp.sum(e0 * e1, -1)
    a11 = jnp.sum(e1 * e1, -1)
    b0 = jnp.sum(e0 * d, -1)
    b1 = jnp.sum(e1 * d, -1)
    det = jnp.maximum(a00 * a11 - a01 * a01, _EPS)

    s = a01 * b1 - a11 * b0
    t = a01 * b0 - a00 * b1

    # Region classification (s, t unnormalized by det).
    inside = (s + t <= det) & (s >= 0) & (t >= 0)

    # Helper clamps for the edge regions.
    def clamp01(x):
        return jnp.clip(x, 0.0, 1.0)

    # Region: interior
    s_in = s / det
    t_in = t / det

    # Edge s=0: minimize over t
    t_s0 = clamp01(-b1 / jnp.maximum(a11, _EPS))
    # Edge t=0: minimize over s
    s_t0 = clamp01(-b0 / jnp.maximum(a00, _EPS))
    # Edge s+t=1: parametrize s, t = 1-s
    numer = (a11 + b1) - (a01 + b0)
    denom = jnp.maximum(a00 - 2 * a01 + a11, _EPS)
    s_diag = clamp01(numer / denom)

    # Choose candidates: the true region logic reduces to evaluating the
    # three clamped edge minimizers + interior and taking the min — exact
    # for the convex quadratic.
    def dist_sq(ss, tt):
        diff = d + ss[..., None] * e0 + tt[..., None] * e1
        return jnp.sum(diff * diff, -1)

    cands = jnp.stack([
        jnp.where(inside, dist_sq(s_in, t_in), jnp.inf),
        dist_sq(jnp.zeros_like(t_s0), t_s0),
        dist_sq(s_t0, jnp.zeros_like(s_t0)),
        dist_sq(s_diag, 1.0 - s_diag),
    ], axis=0)
    return jnp.min(cands, axis=0)


# Generic ray direction for the parity test. Axis-aligned rays are
# degenerate for axis-aligned geometry (a +x ray from a cube center exits
# exactly through the diagonal edge shared by two face triangles and gets
# counted twice). The CUDA kernel dodges this by shooting each voxel's ray
# at the grid corner (`sdf_cuda_kernel.cu:284-288`); a fixed irrationally
# oriented direction achieves the same genericity with less math.
_RAY_DIR = (0.801783726, 0.534522484, 0.267261242)  # normalized (3, 2, 1)


def ray_crossings_x(p: jax.Array, tri: jax.Array) -> jax.Array:
    """Number of ray/triangle crossings along the generic ray, per point.

    p: (N, 3); tri: (F, 3, 3). Returns (N,) int32 counts
    (Moller-Trumbore, same test as `intersect_triangle` in the CUDA
    kernel).
    """
    v0 = tri[:, 0]
    e1 = tri[:, 1] - v0
    e2 = tri[:, 2] - v0
    dir_x = jnp.asarray(_RAY_DIR)

    pvec = jnp.cross(jnp.broadcast_to(dir_x, e2.shape), e2)  # (F, 3)
    det = jnp.sum(e1 * pvec, -1)  # (F,)
    inv_det = jnp.where(jnp.abs(det) > 1e-10, 1.0 / det, 0.0)

    tvec = p[:, None, :] - v0[None, :, :]          # (N, F, 3)
    u = jnp.sum(tvec * pvec[None], -1) * inv_det   # (N, F)
    qvec = jnp.cross(tvec, jnp.broadcast_to(e1, tvec.shape))
    v = jnp.sum(qvec * dir_x, -1) * inv_det
    t = jnp.sum(qvec * e2[None], -1) * inv_det

    hit = (
        (jnp.abs(det)[None] > 1e-10)
        & (u >= 0.0) & (u <= 1.0)
        & (v >= 0.0) & (u + v <= 1.0)
        & (t > 1e-9)
    )
    return jnp.sum(hit, axis=-1).astype(jnp.int32)


@partial(jax.jit, static_argnames=("grid_size", "block"))
def sdf_grid(
    verts: jax.Array,      # (V, 3) one mesh
    faces: jax.Array,      # (F, 3)
    grid_size: int = 32,
    block: int = 1024,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Penetration field on a normalized bbox grid.

    Returns (phi (G, G, G), bbox_min (3,), bbox_scale ()). Matching the
    CUDA kernel's output semantics exactly (`sdf_cuda_kernel.cu:291-300`):
    phi = distance-to-surface for voxels *inside* the mesh, 0 outside —
    so sampling phi at another mesh's vertices directly yields the
    penetration depth. Grid covers the mesh bbox enlarged to a cube, like
    `SDFLoss`'s normalization to [-1, 1]^3.
    """
    lo = verts.min(axis=0)
    hi = verts.max(axis=0)
    center = (lo + hi) / 2.0
    half = jnp.max(hi - lo) / 2.0 * 1.1
    bbox_min = center - half
    scale = 2.0 * half  # bbox side

    g = grid_size
    lin = (jnp.arange(g, dtype=jnp.float32) + 0.5) / g
    zz, yy, xx = jnp.meshgrid(lin, lin, lin, indexing="ij")
    pts = bbox_min + scale * jnp.stack([xx, yy, zz], -1).reshape(-1, 3)

    tri = verts[faces]  # (F, 3, 3)

    def do_block(p_block):
        d2 = point_triangle_distance_sq(
            p_block[:, None, :], tri[None, :, :, :]
        )  # (block, F)
        dist = jnp.sqrt(jnp.min(d2, axis=-1))
        crossings = ray_crossings_x(p_block, tri)
        inside = (crossings % 2) == 1
        return jnp.where(inside, dist, 0.0)

    phi = jax.lax.map(do_block, pts.reshape(-1, block, 3)).reshape(g, g, g)
    return phi, bbox_min, scale


def sample_sdf_trilinear(
    phi: jax.Array,        # (G, G, G), indexed [z, y, x]
    bbox_min: jax.Array,
    scale: jax.Array,
    points: jax.Array,     # (N, 3)
) -> jax.Array:
    """Differentiable trilinear sampling of phi at world-space points.

    Equivalent of the reference's grid_sample over the SDF volume
    (`sdf_loss.py`); points outside the bbox clamp to the border.
    """
    g = phi.shape[0]
    uvw = (points - bbox_min) / scale * g - 0.5  # voxel coords
    x, y, z = uvw[:, 0], uvw[:, 1], uvw[:, 2]

    def axis(v):
        v0 = jnp.floor(v)
        f = v - v0
        i0 = jnp.clip(v0.astype(jnp.int32), 0, g - 1)
        i1 = jnp.clip(i0 + 1, 0, g - 1)
        return i0, i1, f

    x0, x1, fx = axis(x)
    y0, y1, fy = axis(y)
    z0, z1, fz = axis(z)

    def at(zi, yi, xi):
        return phi[zi, yi, xi]

    c000 = at(z0, y0, x0); c001 = at(z0, y0, x1)
    c010 = at(z0, y1, x0); c011 = at(z0, y1, x1)
    c100 = at(z1, y0, x0); c101 = at(z1, y0, x1)
    c110 = at(z1, y1, x0); c111 = at(z1, y1, x1)

    c00 = c000 * (1 - fx) + c001 * fx
    c01 = c010 * (1 - fx) + c011 * fx
    c10 = c100 * (1 - fx) + c101 * fx
    c11 = c110 * (1 - fx) + c111 * fx
    c0 = c00 * (1 - fy) + c01 * fy
    c1 = c10 * (1 - fy) + c11 * fy
    return c0 * (1 - fz) + c1 * fz


def sdf_penetration_loss(
    verts_a: jax.Array,    # (B, V, 3) mesh whose field we build
    verts_b: jax.Array,    # (B, V, 3) mesh whose vertices are penalised
    faces_a: jax.Array,
    grid_size: int = 32,
    robustifier: float | None = None,
) -> jax.Array:
    """Two-hand anti-penetration: penalize B-vertices inside A.

    phi_a is built under stop_gradient (the CUDA op has no backward in
    the reference either, `sdf.py:8-30`); gradients reach verts_b through
    the trilinear sample. The penalty is the sampled penetration depth
    phi(v) (0 for vertices outside A), optionally squashed by the
    Geman-McClure robustifier of `SDFLoss.forward`.
    """
    def one(va, vb):
        phi, bmin, scale = sdf_grid(
            jax.lax.stop_gradient(va), faces_a, grid_size
        )
        phi = jax.lax.stop_gradient(phi)
        pen = sample_sdf_trilinear(phi, jax.lax.stop_gradient(bmin),
                                   jax.lax.stop_gradient(scale), vb)
        if robustifier is not None:
            frac = (pen / robustifier) ** 2
            pen = frac / (frac + 1.0)
        return jnp.sum(pen)

    return jnp.mean(jax.vmap(one)(verts_a, verts_b))
