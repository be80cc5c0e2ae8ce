import jax
import jax.numpy as jnp
import numpy as np
import pytest

from renderih_tpu.ops.sdf import (
    point_triangle_distance_sq,
    ray_crossings_x,
    sample_sdf_trilinear,
    sdf_grid,
    sdf_penetration_loss,
)

# Unit cube mesh (12 triangles), centered at origin, side 1.
_CUBE_V = np.array([
    [-0.5, -0.5, -0.5], [0.5, -0.5, -0.5], [0.5, 0.5, -0.5], [-0.5, 0.5, -0.5],
    [-0.5, -0.5, 0.5], [0.5, -0.5, 0.5], [0.5, 0.5, 0.5], [-0.5, 0.5, 0.5],
], np.float32)
_CUBE_F = np.array([
    [0, 2, 1], [0, 3, 2],  # bottom z=-.5
    [4, 5, 6], [4, 6, 7],  # top z=+.5
    [0, 1, 5], [0, 5, 4],  # y=-.5
    [2, 3, 7], [2, 7, 6],  # y=+.5
    [1, 2, 6], [1, 6, 5],  # x=+.5
    [0, 4, 7], [0, 7, 3],  # x=-.5
], np.int32)


def test_point_triangle_distance_basic():
    tri = jnp.asarray([[[0.0, 0, 0], [1.0, 0, 0], [0.0, 1, 0]]])
    # directly above the interior: distance = height
    p = jnp.asarray([[0.2, 0.2, 0.7]])
    d2 = point_triangle_distance_sq(p, tri)
    np.testing.assert_allclose(float(d2[0]), 0.49, atol=1e-5)
    # nearest to vertex (2, 0, 0) -> closest point is (1, 0, 0)
    p2 = jnp.asarray([[2.0, 0.0, 0.0]])
    d2b = point_triangle_distance_sq(p2, tri)
    np.testing.assert_allclose(float(d2b[0]), 1.0, atol=1e-5)
    # on the triangle -> 0
    p3 = jnp.asarray([[0.25, 0.25, 0.0]])
    assert float(point_triangle_distance_sq(p3, tri)[0]) < 1e-10


def test_ray_parity_cube():
    tri = jnp.asarray(_CUBE_V)[jnp.asarray(_CUBE_F)]
    inside_pts = jnp.asarray([[0.0, 0.0, 0.0], [0.3, -0.2, 0.4]])
    outside_pts = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 2.0, 0.3]])
    ci = np.asarray(ray_crossings_x(inside_pts, tri))
    co = np.asarray(ray_crossings_x(outside_pts, tri))
    assert np.all(ci % 2 == 1)
    assert np.all(co % 2 == 0)


def test_sdf_grid_cube_semantics():
    phi, bmin, scale = sdf_grid(
        jnp.asarray(_CUBE_V), jnp.asarray(_CUBE_F), grid_size=16, block=512
    )
    phi = np.asarray(phi)
    g = 16
    # center voxel: inside, distance ~0.5 to the nearest face
    c = phi[g // 2, g // 2, g // 2]
    assert 0.35 < c < 0.55
    # corner voxel of the (enlarged) bbox: outside -> exactly 0
    assert phi[0, 0, 0] == 0.0
    assert phi[-1, -1, -1] == 0.0
    # inside fraction ~ cube volume / bbox volume = 1 / 1.1^3
    frac = (phi > 0).mean()
    assert 0.5 < frac < 0.9


def test_trilinear_sampling_matches_grid():
    phi, bmin, scale = sdf_grid(
        jnp.asarray(_CUBE_V), jnp.asarray(_CUBE_F), grid_size=16, block=512
    )
    # sample at the center -> close to the center voxel value
    v = sample_sdf_trilinear(phi, bmin, scale, jnp.asarray([[0.0, 0.0, 0.0]]))
    g = 16
    np.testing.assert_allclose(
        float(v[0]), float(phi[g // 2, g // 2, g // 2]), atol=0.1
    )
    # far outside -> 0
    v2 = sample_sdf_trilinear(phi, bmin, scale, jnp.asarray([[5.0, 5.0, 5.0]]))
    assert float(v2[0]) == 0.0


def test_penetration_loss_positive_when_overlapping():
    va = jnp.asarray(_CUBE_V)[None]
    vb_inside = jnp.asarray(_CUBE_V * 0.3)[None]  # fully inside
    vb_far = jnp.asarray(_CUBE_V + 5.0)[None]     # fully outside
    faces = jnp.asarray(_CUBE_F)
    l_in = float(sdf_penetration_loss(va, vb_inside, faces, grid_size=16))
    l_out = float(sdf_penetration_loss(va, vb_far, faces, grid_size=16))
    assert l_in > 0.01
    assert l_out == 0.0


def test_penetration_loss_gradient_pushes_out():
    va = jnp.asarray(_CUBE_V)[None]
    faces = jnp.asarray(_CUBE_F)

    def loss(offset):
        vb = jnp.asarray(_CUBE_V * 0.3)[None] + offset
        return sdf_penetration_loss(va, vb, faces, grid_size=16)

    g = jax.grad(loss)(jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(g)))
    # at center the field is symmetric; try an off-center offset
    g2 = jax.grad(loss)(jnp.asarray([0.2, 0.0, 0.0]))
    assert np.isfinite(np.asarray(g2)).all()
    assert float(jnp.abs(g2).max()) > 0
