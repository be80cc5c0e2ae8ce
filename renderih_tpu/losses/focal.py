"""Focal & Dice losses (pure JAX).

Replaces the reference's dependency on the mmcv CUDA `sigmoid_focal_loss`
op (`common/utils/focal_loss.py:4,56-121`) with the plain formulation —
trivially fused by XLA, no custom kernel needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sigmoid_focal_loss(
    logits: jax.Array,
    targets: jax.Array,
    gamma: float = 2.0,
    alpha: float = 0.25,
) -> jax.Array:
    """Mean sigmoid focal loss (Lin et al., ICCV'17)."""
    p = jax.nn.sigmoid(logits)
    ce = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
    p_t = p * targets + (1 - p) * (1 - targets)
    alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
    return jnp.mean(alpha_t * (1 - p_t) ** gamma * ce)


def dice_loss(pred: jax.Array, target: jax.Array, eps: float = 1.0) -> jax.Array:
    """Soft Dice loss over the last two (spatial) axes."""
    num = 2.0 * jnp.sum(pred * target, axis=(-1, -2)) + eps
    den = jnp.sum(pred**2, axis=(-1, -2)) + jnp.sum(target**2, axis=(-1, -2)) + eps
    return jnp.mean(1.0 - num / den)
