"""Auxiliary network zoo (flax.linen) — parity with `common/nets/`.

The reference carries a set of auxiliary modules that the flagship path
does not use but other configurations do (`common/nets/`, SURVEY 2.2
"Aux heads"): an FPN, CBAM channel+spatial attention, an hourglass
joint-heatmap head, a cross-hand feature-injection Transformer, and a
pose discriminator for adversarial priors. Provided here as compact,
tested flax equivalents so every reference capability has a home.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


class FPN(nn.Module):
    """Feature Pyramid Network (`common/nets/backbone.py:10-66`).

    Takes the coarsest-first pyramid, projects each scale to `out_dim`
    with 1x1 convs, adds top-down nearest-upsampled context, and smooths
    with 3x3 convs.
    """

    out_dim: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pyramid):
        laterals = [
            nn.Conv(self.out_dim, (1, 1), dtype=self.dtype,
                    name=f"lateral{i}")(f)
            for i, f in enumerate(pyramid)
        ]
        outs = [laterals[0]]
        for i in range(1, len(laterals)):
            up = jnp.repeat(jnp.repeat(outs[-1], 2, axis=1), 2, axis=2)
            outs.append(laterals[i] + up)
        return [
            nn.Conv(self.out_dim, (3, 3), padding=1, dtype=self.dtype,
                    name=f"smooth{i}")(o)
            for i, o in enumerate(outs)
        ]


class CBAM(nn.Module):
    """Convolutional Block Attention Module (`common/nets/cbam.py`)."""

    reduction: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        # channel attention: shared MLP over avg- and max-pooled stats
        mlp = nn.Sequential([
            nn.Dense(max(c // self.reduction, 1), dtype=self.dtype),
            nn.relu,
            nn.Dense(c, dtype=self.dtype),
        ])
        avg = mlp(jnp.mean(x, axis=(1, 2)))
        mx = mlp(jnp.max(x, axis=(1, 2)))
        ca = jax.nn.sigmoid(avg + mx)[:, None, None, :]
        x = x * ca
        # spatial attention: 7x7 conv over [avg, max] channel maps
        s = jnp.concatenate(
            [jnp.mean(x, -1, keepdims=True), jnp.max(x, -1, keepdims=True)],
            axis=-1,
        )
        sa = jax.nn.sigmoid(
            nn.Conv(1, (7, 7), padding=3, dtype=self.dtype, name="spatial")(s)
        )
        return x * sa


class HourglassHead(nn.Module):
    """Stacked-hourglass joint-heatmap head (`common/nets/hand_head.py`).

    A compact single-stack hourglass over a (B, H, W, C) feature map,
    emitting per-joint heatmaps at input resolution.
    """

    num_joints: int = 21
    width: int = 256
    depth: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        def conv_block(h, name):
            h = nn.Conv(self.width, (3, 3), padding=1, dtype=self.dtype,
                        name=f"{name}_conv")(h)
            return nn.relu(nn.GroupNorm(num_groups=8, name=f"{name}_gn")(h))

        x = conv_block(x, "pre")

        def hourglass(h, d):
            up = conv_block(h, f"up{d}")
            low = nn.avg_pool(h, (2, 2), strides=(2, 2))
            low = conv_block(low, f"low{d}_in")
            if d > 1:
                low = hourglass(low, d - 1)
            low = conv_block(low, f"low{d}_out")
            b, hh, ww, c = low.shape
            low = jax.image.resize(low, (b, hh * 2, ww * 2, c), "nearest")
            return up + low

        h = hourglass(x, self.depth)
        return nn.Conv(self.num_joints, (1, 1), dtype=self.dtype,
                       name="hm_out")(h)


class CrossHandInjection(nn.Module):
    """Cross-hand feature injection Transformer
    (`common/nets/transformer.py:6-35`): queries from one hand's feature
    map attend over the other's tokens; output is added residually."""

    dim: int
    n_heads: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat_a, feat_b):
        b, h, w, c = feat_a.shape
        qa = feat_a.reshape(b, h * w, c)
        kb = feat_b.reshape(b, h * w, c)
        q = nn.Dense(self.dim, dtype=self.dtype, name="q")(qa)
        k = nn.Dense(self.dim, dtype=self.dtype, name="k")(kb)
        v = nn.Dense(self.dim, dtype=self.dtype, name="v")(kb)
        hd = self.dim // self.n_heads
        qh = q.reshape(b, -1, self.n_heads, hd)
        kh = k.reshape(b, -1, self.n_heads, hd)
        vh = v.reshape(b, -1, self.n_heads, hd)
        attn = jax.nn.softmax(
            jnp.einsum("bnhd,bmhd->bhnm", qh, kh) / jnp.sqrt(hd), -1
        )
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, vh).reshape(b, h * w, -1)
        out = nn.Dense(c, dtype=self.dtype, name="proj")(out)
        return feat_a + out.reshape(b, h, w, c)


class PoseDiscriminator(nn.Module):
    """Per-joint + global pose discriminator
    (`common/nets/discriminator.py`; also the 2D GAN prior of
    `pose_data_optimize/Ver2Code/Discriminator`). Input: rotation
    matrices (B, J, 3, 3); output: per-joint + overall realism logits."""

    num_joints: int = 15
    width: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, rotmats):
        b, j = rotmats.shape[:2]
        x = rotmats.reshape(b, j, 9)
        h = nn.relu(nn.Dense(self.width, dtype=self.dtype, name="fc1")(x))
        h = nn.relu(nn.Dense(self.width, dtype=self.dtype, name="fc2")(h))
        per_joint = nn.Dense(1, dtype=self.dtype, name="joint_out")(h)[..., 0]
        g = h.reshape(b, -1)
        g = nn.relu(nn.Dense(self.width * 4, dtype=self.dtype, name="gfc")(g))
        overall = nn.Dense(1, dtype=self.dtype, name="global_out")(g)[..., 0]
        return per_joint, overall
