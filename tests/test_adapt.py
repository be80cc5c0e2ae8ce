"""Domain-adaptation (DANN) module tests."""

import jax
import jax.numpy as jnp
import numpy as np

from renderih_tpu.losses.adapt import (
    DomainDiscriminator,
    domain_adaptation_loss,
    gradient_reversal,
)


def test_gradient_reversal():
    def f(x):
        return jnp.sum(gradient_reversal(x, 2.0) ** 1)

    x = jnp.ones((4,))
    np.testing.assert_allclose(np.asarray(f(x)), 4.0)  # identity forward
    g = jax.grad(f)(x)
    np.testing.assert_allclose(np.asarray(g), -2.0)  # reversed+scaled grad


def test_domain_loss_directions():
    rng = np.random.default_rng(0)
    fs = jnp.asarray(rng.normal(size=(8, 64)).astype(np.float32) + 1.0)
    ft = jnp.asarray(rng.normal(size=(8, 64)).astype(np.float32) - 1.0)
    disc = DomainDiscriminator(hidden=32)
    params = disc.init(jax.random.PRNGKey(0), fs)["params"]

    loss = domain_adaptation_loss(disc, params, fs, ft, lam=1.0)
    assert np.isfinite(float(loss)) and float(loss) > 0

    # Discriminator gradient decreases its own loss (normal direction).
    def disc_loss(p):
        return domain_adaptation_loss(disc, p, fs, ft, lam=1.0)

    g = jax.grad(disc_loss)(params)
    lr = 1e-2
    p2 = jax.tree_util.tree_map(lambda a, b: a - lr * b, params, g)
    assert float(disc_loss(p2)) < float(loss)

    # Feature gradient is REVERSED: a step along -grad(features) must
    # INCREASE the discriminator's separability loss... i.e. following
    # the returned gradient moves features toward domain confusion.
    def feat_loss(f_src):
        return domain_adaptation_loss(disc, params, f_src, ft, lam=1.0)

    gf = jax.grad(feat_loss)(fs)
    # with GRL, d(loss)/d(feat) is the negated true gradient: stepping
    # features by -lr*gf should *increase* the (unreversed) BCE.
    fs2 = fs - lr * 10 * gf

    def raw_bce(f_src):
        feats = jnp.concatenate([f_src, ft], axis=0)
        logits = disc.apply({"params": params}, feats)
        labels = jnp.concatenate([jnp.ones(8), jnp.zeros(8)])
        return float(jnp.mean(
            jnp.maximum(logits, 0) - logits * labels
            + jnp.log1p(jnp.exp(-jnp.abs(logits)))
        ))

    assert raw_bce(fs2) > raw_bce(fs)
