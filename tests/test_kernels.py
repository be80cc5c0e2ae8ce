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


def test_pallas_conv3x3_matches_xla():
    from renderih_tpu.kernels.conv_pallas import (
        _pallas_conv3x3,
        _xla_conv3x3,
        conv3x3_eligible,
    )

    rng = jax.random.PRNGKey(1)
    for b, h, w, cin, cout in ((4, 16, 16, 256, 256), (2, 8, 8, 512, 512),
                               (2, 32, 32, 128, 128)):
        kx, kw = jax.random.split(jax.random.fold_in(rng, cin))
        x = jax.random.normal(kx, (b, h, w, cin))
        k = jax.random.normal(kw, (3, 3, cin, cout)) / np.sqrt(9 * cin)
        got = np.asarray(_pallas_conv3x3(x, k, interpret=True))
        want = np.asarray(_xla_conv3x3(x, k))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_pallas_conv3x3_eligibility():
    from renderih_tpu.kernels.conv_pallas import conv3x3_eligible

    x = jnp.zeros((64, 16, 16, 256), jnp.bfloat16)  # measured winner @bs64+
    k = jnp.zeros((3, 3, 256, 256), jnp.bfloat16)
    assert conv3x3_eligible(x, k, (1, 1), "SAME")
    assert not conv3x3_eligible(x, k, (2, 2), "SAME")  # strided
    assert not conv3x3_eligible(x, jnp.zeros((1, 1, 256, 256), jnp.bfloat16),
                                (1, 1), "SAME")
    assert not conv3x3_eligible(  # not in the measured-winners table
        jnp.zeros((64, 64, 64, 64), jnp.bfloat16),
        jnp.zeros((3, 3, 64, 64), jnp.bfloat16), (1, 1), "SAME")
    assert not conv3x3_eligible(  # too few GEMM rows (latency shapes)
        jnp.zeros((1, 16, 16, 256), jnp.bfloat16), k, (1, 1), "SAME")
    assert not conv3x3_eligible(  # int8 unsupported
        x.astype(jnp.int8), k.astype(jnp.int8), (1, 1), "SAME")


def test_pallas_conv3x3_grads_match_xla():
    """custom_vjp backward = exact XLA-conv transposes (dx, dw)."""
    from renderih_tpu.kernels import conv_pallas as cp

    rng = jax.random.PRNGKey(2)
    kx, kw, kg = jax.random.split(rng, 3)
    b, h, w, c = 2, 8, 8, 128
    x = jax.random.normal(kx, (b, h, w, c))
    k = jax.random.normal(kw, (3, 3, c, c)) / np.sqrt(9 * c)

    # route the primal through interpret mode so the vjp machinery runs
    # on CPU; the bwd rule itself is pure XLA
    orig = cp._pallas_conv3x3
    cp_interp = lambda xx, kk: orig(xx, kk, interpret=True)
    cp._pallas_conv3x3 = cp_interp
    try:
        def loss_pallas(x, k):
            return jnp.sum(jnp.sin(cp.conv3x3_same(x, k)))
    
        def loss_xla(x, k):
            return jnp.sum(jnp.sin(cp._xla_conv3x3(x, k)))
    
        gp = jax.grad(loss_pallas, argnums=(0, 1))(x, k)
        gx = jax.grad(loss_xla, argnums=(0, 1))(x, k)
        for a, bb in zip(gp, gx):
            np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                       rtol=2e-5, atol=2e-5)
    finally:
        cp._pallas_conv3x3 = orig
