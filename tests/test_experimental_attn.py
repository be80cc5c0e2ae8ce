"""Tests for the experimental cross-hand attention variants."""

import jax
import jax.numpy as jnp
import numpy as np

from renderih_tpu.models.experimental_attn import (
    InterPoint,
    LinearCrossAttention,
)


def _init_apply(module, *args):
    variables = module.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        *args, deterministic=True,
    )
    return variables, module.apply(variables, *args, deterministic=True)


def test_inter_point_shapes_and_cross_dependence():
    b, v, f = 2, 63, 64
    rng = np.random.default_rng(0)
    lf = jnp.asarray(rng.normal(size=(b, v, f)).astype(np.float32))
    rf = jnp.asarray(rng.normal(size=(b, v, f)).astype(np.float32))
    mod = InterPoint(f_dim=f, verts_num=v, n_heads=4)
    variables, (lo, ro) = _init_apply(mod, lf, rf)
    assert lo.shape == (b, v, f) and ro.shape == (b, v, f)
    assert np.all(np.isfinite(np.asarray(lo)))
    # right stream influences the left output (cross-hand information flow)
    lo2, _ = mod.apply(variables, lf, rf * 2.0, deterministic=True)
    assert np.abs(np.asarray(lo2 - lo)).max() > 1e-6


def test_linear_cross_attention_shapes_and_cross_dependence():
    b, v, f = 2, 126, 64
    rng = np.random.default_rng(1)
    lf = jnp.asarray(rng.normal(size=(b, v, f)).astype(np.float32))
    rf = jnp.asarray(rng.normal(size=(b, v, f)).astype(np.float32))
    mod = LinearCrossAttention(latent_dim=f, n_heads=4)
    variables, (lo, ro) = _init_apply(mod, lf, rf)
    assert lo.shape == (b, v, f) and ro.shape == (b, v, f)
    assert np.all(np.isfinite(np.asarray(lo)))
    lo2, ro2 = mod.apply(variables, lf, rf * 2.0, deterministic=True)
    assert np.abs(np.asarray(lo2 - lo)).max() > 1e-6
    assert np.abs(np.asarray(ro2 - ro)).max() > 1e-6


def test_linear_cross_attention_grads_flow():
    b, v, f = 2, 32, 32
    rng = np.random.default_rng(2)
    lf = jnp.asarray(rng.normal(size=(b, v, f)).astype(np.float32))
    rf = jnp.asarray(rng.normal(size=(b, v, f)).astype(np.float32))
    mod = LinearCrossAttention(latent_dim=f, n_heads=4)
    variables, _ = _init_apply(mod, lf, rf)

    def loss(params):
        lo, ro = mod.apply({"params": params}, lf, rf, deterministic=True)
        return jnp.sum(lo**2) + jnp.sum(ro**2)

    g = jax.grad(loss)(variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in leaves)
    assert any(float(jnp.abs(x).max()) > 0 for x in leaves)
