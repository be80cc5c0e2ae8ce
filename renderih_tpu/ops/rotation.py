"""Rotation representations and conversions, batched for TPU.

Every function here is shape-polymorphic over leading batch dimensions and
jit/vmap/grad friendly: no data-dependent control flow, no in-place updates.

Reference-behaviour notes (for parity with adwardlee/RenderIH):
  * axis-angle -> rotation matrix follows the Rodrigues formula with the
    same eps regularisation as `models/manolayer.py:32-48` (angle = ||axis||
    + 1e-8), so near-zero poses produce numerically identical matrices.
  * matrix -> axis-angle mirrors the quadrant handling of
    `models/manolayer.py:187-215` (asin-based angle with cos-sign fixup).
  * 6D rotation follows Zhou et al. CVPR'19, as used by the MANO-parameter
    regressor (`common/myhand/decoder_lijun_newgraph.py:125-132`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def _hat(v: jax.Array) -> jax.Array:
    """Skew-symmetric cross-product matrix. v: (..., 3) -> (..., 3, 3)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    rows = [
        jnp.stack([zero, -z, y], axis=-1),
        jnp.stack([z, zero, -x], axis=-1),
        jnp.stack([-y, x, zero], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def rodrigues(axis_angle: jax.Array) -> jax.Array:
    """Axis-angle (..., 3) -> rotation matrices (..., 3, 3).

    Written in the sinc form R = I + sinc(t) K + cosc(t) K^2 with
    K = hat(axis) *unnormalized*, sinc(t) = sin(t)/t, cosc(t) = (1-cos t)/t^2,
    and Taylor branches near zero. This agrees with the reference's
    `rodrigues_batch` (`models/manolayer.py:32-48`) to float32 resolution
    for all angles, but unlike the norm+eps form it has exact, finite
    gradients at the zero pose.
    """
    t2 = jnp.sum(axis_angle * axis_angle, axis=-1, keepdims=True)
    small = t2 < 1e-8
    t2_safe = jnp.where(small, 1.0, t2)
    t = jnp.sqrt(t2_safe)
    sinc = jnp.where(small, 1.0 - t2 / 6.0, jnp.sin(t) / t)
    cosc = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(t)) / t2_safe)
    k = _hat(axis_angle)
    k2 = k @ k
    eye = jnp.eye(3, dtype=axis_angle.dtype)
    return eye + sinc[..., None] * k + cosc[..., None] * k2


def rodrigues_inverse(rotmat: jax.Array) -> jax.Array:
    """Rotation matrices (..., 3, 3) -> axis-angle (..., 3).

    Uses the antisymmetric part for the axis and an asin-based angle with a
    cosine-sign quadrant fixup, matching `ManoLayer.Rmat2axis`.
    """
    r = rotmat
    anti = (r - jnp.swapaxes(r, -1, -2)) / 2.0
    # (R32-R23, R13-R31, R21-R12)/2 ~ sin(t) * axis
    l_vec = jnp.stack(
        [anti[..., 2, 1], anti[..., 0, 2], anti[..., 1, 0]], axis=-1
    )
    sin = jnp.linalg.norm(l_vec, axis=-1)
    axis = l_vec / (sin[..., None] + _EPS)

    sym = (r + jnp.swapaxes(r, -1, -2)) / 2.0 - jnp.eye(3, dtype=r.dtype)
    outer = axis[..., :, None] * axis[..., None, :] - jnp.eye(3, dtype=r.dtype)
    tr_sym = jnp.trace(sym, axis1=-2, axis2=-1)
    tr_outer = jnp.trace(outer, axis1=-2, axis2=-1)
    cos = 1.0 - tr_sym / (tr_outer + _EPS)

    sin_c = jnp.clip(sin, -1.0 + 1e-7, 1.0 - 1e-7)
    theta = jnp.arcsin(sin_c)
    # Quadrant fixup when cos < 0 (same constants as the reference).
    theta = jnp.where((cos < 0) & (sin_c > 0), 3.14159 - theta, theta)
    theta = jnp.where((cos < 0) & (sin_c < 0), -3.14159 - theta, theta)
    return theta[..., None] * axis


def rot6d_to_rotmat(x: jax.Array) -> jax.Array:
    """6D rotation representation (..., 6) -> (..., 3, 3) via Gram-Schmidt.

    Input layout matches the reference regressor: x.reshape(-1, 3, 2) with
    column 0 = a1, column 1 = a2 (Zhou et al. CVPR'19).
    """
    m = x.reshape(x.shape[:-1] + (3, 2))
    a1, a2 = m[..., 0], m[..., 1]
    b1 = a1 / (jnp.linalg.norm(a1, axis=-1, keepdims=True) + _EPS)
    a2_proj = jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = a2 - a2_proj
    b2 = b2 / (jnp.linalg.norm(b2, axis=-1, keepdims=True) + _EPS)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-1)


def axis_angle_rotate(points: jax.Array, axis_angle: jax.Array) -> jax.Array:
    """Rotate points (..., N, 3) by axis-angle (..., 3)."""
    rot = rodrigues(axis_angle)
    return jnp.einsum("...ij,...nj->...ni", rot, points)


def rotmat_z(theta_deg: jax.Array) -> jax.Array:
    """In-plane (z-axis) rotation used by the 2D augmentation pipeline.

    Matches `imgUtils.get_rotation_mat3d` (`utils/manoutils.py:172-180`),
    including its 3.14159 pi approximation, so that augmented 3D labels are
    bit-comparable to the reference pipeline.
    """
    t = theta_deg * (3.14159 / 180.0)
    c, s = jnp.cos(t), jnp.sin(t)
    zero = jnp.zeros_like(t)
    one = jnp.ones_like(t)
    row0 = jnp.stack([c, -s, zero], axis=-1)
    row1 = jnp.stack([s, c, zero], axis=-1)
    row2 = jnp.stack([zero, zero, one], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)
