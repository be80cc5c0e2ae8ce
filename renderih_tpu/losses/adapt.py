"""Domain adaptation: gradient reversal + feature discriminator.

Parity with the reference's adaptation arrangement
(`common/myhand/model_adapt.py:18-90` + the discriminator in
`common/nets/discriminator.py`): a labeled source batch and an unlabeled
target batch are concatenated, supervised losses apply only to the
source half, and a domain discriminator on the global feature pushes
the encoder toward domain-invariant features.

The reference alternates generator/discriminator steps GAN-style; the
TPU-friendly formulation here is the DANN gradient-reversal layer —
one jitted step, no optimizer ping-pong, same saddle-point objective.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


@jax.custom_vjp
def gradient_reversal(x, lam: float = 1.0):
    """Identity forward; -lam * grad backward (DANN)."""
    return x


def _grl_fwd(x, lam):
    return x, lam


def _grl_bwd(lam, g):
    return (-lam * g, None)


gradient_reversal.defvjp(_grl_fwd, _grl_bwd)


class DomainDiscriminator(nn.Module):
    """MLP domain classifier on the 2048-d global feature."""

    hidden: int = 512

    @nn.compact
    def __call__(self, feat):
        h = nn.relu(nn.Dense(self.hidden, name="fc1")(feat))
        h = nn.relu(nn.Dense(self.hidden // 4, name="fc2")(h))
        return nn.Dense(1, name="out")(h)[..., 0]  # logits


def domain_adaptation_loss(
    disc: DomainDiscriminator,
    disc_params,
    feat_source: jax.Array,   # (Bs, F) labeled-domain global features
    feat_target: jax.Array,   # (Bt, F) unlabeled-domain global features
    lam: float = 1.0,
) -> jax.Array:
    """DANN loss: discriminator BCE with the encoder adversarial via GRL.

    Minimizing this w.r.t. `disc_params` trains the discriminator;
    the gradient-reversal layer makes the same objective push encoder
    features toward domain confusion. Add to the supervised total with a
    schedule on `lam` (0 -> 1 over warmup, the standard DANN ramp).
    """
    feats = jnp.concatenate([feat_source, feat_target], axis=0)
    feats = gradient_reversal(feats, lam)
    logits = disc.apply({"params": disc_params}, feats)
    labels = jnp.concatenate([
        jnp.ones(feat_source.shape[0]), jnp.zeros(feat_target.shape[0])
    ])
    # sigmoid BCE, numerically stable form
    return jnp.mean(
        jnp.maximum(logits, 0) - logits * labels
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )
