"""Pallas kernels vs their pure-XLA references (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from renderih_tpu.kernels.fused_attention import fused_mha
from renderih_tpu.kernels.sdf_pallas import sdf_grid_pallas
from renderih_tpu.ops.sdf import sdf_grid
from tests.test_sdf import _CUBE_F, _CUBE_V


def _xla_mha(q, k, v):
    b, n, h, d = q.shape
    scale = 1.0 / np.sqrt(d)
    logits = jnp.einsum("bnhd,bmhd->bhnm", q, k) * scale
    attn = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhnm,bmhd->bnhd", attn, v)
    return out.reshape(b, n, h * d)


def test_fused_mha_matches_xla():
    rng = jax.random.PRNGKey(0)
    ks = jax.random.split(rng, 3)
    b, n, m, h, d = 2, 63, 127, 4, 32
    q = jax.random.normal(ks[0], (b, n, h, d))
    k = jax.random.normal(ks[1], (b, m, h, d))
    v = jax.random.normal(ks[2], (b, m, h, d))
    got = np.asarray(fused_mha(q, k, v, interpret=True))
    want = np.asarray(_xla_mha(q, k, v))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_sdf_pallas_matches_xla():
    verts = jnp.asarray(_CUBE_V)
    faces = jnp.asarray(_CUBE_F)
    phi_p, bmin_p, scale_p = sdf_grid_pallas(verts, faces, grid_size=16,
                                             interpret=True)
    phi_x, bmin_x, scale_x = sdf_grid(verts, faces, grid_size=16, block=512)
    np.testing.assert_allclose(np.asarray(bmin_p), np.asarray(bmin_x), atol=1e-6)
    np.testing.assert_allclose(np.asarray(phi_p), np.asarray(phi_x), atol=1e-5)
