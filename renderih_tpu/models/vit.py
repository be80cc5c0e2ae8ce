"""ViTPose encoder variant (flax.linen).

Parity target: the reference ViT fork (`models/vitpose/vitpose.py`) and
its two-hand wrapper (`common/myhand/lijun_vitpose.py:17-37`):

  * plain ViT-B/16 or ViT-L/16, *no* positional embedding (the fork sets
    pos_embed = None, `vitpose.py:326`), pre-norm blocks, GELU MLP x4.
  * PatchEmbed = conv k=patch, s=patch, padding 2 (the fork's
    `4 + 2*(ratio//2 - 1)` with ratio=1, `vitpose.py:251-252`), so a 256^2
    input yields 16x16 (patch 16) or 32x32 (patch 8) tokens.
  * pyramid: f16 = ViT output; f32 = conv1x1(patchembed8(img) +
    2x-nearest-upsampled f16); f8 = `Myattention` pooled-KV downsampling
    block; global feature = GAP(f16).

All feature maps are NHWC. bf16 compute with f32 LayerNorm accumulation
comes from the `dtype` policy like the ResNet path.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from renderih_tpu.models.attention import _mha

_VIT_CONFIGS = {
    "vit_base": dict(embed_dim=768, depth=12, num_heads=12),
    "vit_large": dict(embed_dim=1024, depth=24, num_heads=16),
}


class PatchEmbed(nn.Module):
    patch_size: int
    embed_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img):
        p = self.patch_size
        x = nn.Conv(self.embed_dim, (p, p), strides=(p, p),
                    padding=((2, 2), (2, 2)), dtype=self.dtype, name="proj")(img)
        b, h, w, c = x.shape
        return x.reshape(b, h * w, c), (h, w)


class ViTBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm1")(x)
        qkv = nn.Dense(3 * self.dim, use_bias=True, dtype=self.dtype,
                       name="qkv")(h)
        b, n, _ = qkv.shape
        qkv = qkv.reshape(b, n, 3, self.num_heads, -1)
        q, k, v = (qkv[:, :, i].reshape(b, n, -1) for i in range(3))
        # routed through the shared core so set_fused_attention() /
        # BENCH_FUSED covers the ViT variant too
        out = _mha(q, k, v, self.num_heads)
        x = x + nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)

        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm2")(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype,
                     name="mlp_fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(h)
        return x + h


class PooledKVAttention(nn.Module):
    """`Myattention` (`vitpose.py:16-101`): 2x spatial downsampling block.

    Queries come from a fused (pooled + channel-regrouped) 8x8 token set;
    keys/values from the full 16x16 tokens; output is reshaped to
    (B, H/2, W/2, C).
    """

    dim: int
    num_heads: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, fmap, deterministic: bool = True):
        b, h, w, c = fmap.shape
        assert c == self.dim
        tokens = fmap.reshape(b, h * w, c)  # (B, 256, C)

        # x_1: channel-major regrouping (B, C, N) -> (B, 4C, N/4) -> fc0.
        x_cn = jnp.swapaxes(tokens, 1, 2)             # (B, C, N)
        x_1 = x_cn.reshape(b, 4 * c, (h * w) // 4)    # (B, 4C, N/4)
        x_1 = jnp.swapaxes(x_1, 1, 2)                 # (B, N/4, 4C)
        x_1 = nn.Dense(c, dtype=self.dtype, name="fc0")(x_1)

        # pooled branch: adaptive avg-pool to 8x8 + 1x1 conv.
        pooled = nn.avg_pool(fmap, (h // 8, w // 8), strides=(h // 8, w // 8))
        pooled = nn.Conv(c, (1, 1), dtype=self.dtype, name="sr")(pooled)
        pooled = pooled.reshape(b, 64, c)

        x_q = pooled + x_1
        x_q = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")(x_q)
        x_q = nn.gelu(x_q, approximate=False)

        q = nn.Dense(c, use_bias=False, dtype=self.dtype, name="q")(x_q)
        kv = nn.Dense(2 * c, use_bias=False, dtype=self.dtype, name="kv")(tokens)
        k, v = kv[..., :c], kv[..., c:]

        out = _mha(q, k, v, self.num_heads)

        out = nn.Dense(2 * c, dtype=self.dtype, name="linear1")(out)
        out = nn.gelu(out, approximate=False)
        out = nn.Dense(c, dtype=self.dtype, name="linear2")(out)
        return out.reshape(b, h // 2, w // 2, c)


class ViTEncoder(nn.Module):
    """ViT trunk + 3-scale pyramid for the dual-graph decoder.

    Returns [f8, f16, f32] (coarsest first) with `embed_dim` channels each,
    like the reference wrapper (`lijun_vitpose.py:28-35`).
    """

    model_type: str = "vit_base"
    dtype: Any = jnp.float32

    @property
    def embed_dim(self) -> int:
        return _VIT_CONFIGS[self.model_type]["embed_dim"]

    @nn.compact
    def __call__(self, img, train: bool = False):
        cfgv = _VIT_CONFIGS[self.model_type]
        d = cfgv["embed_dim"]

        tokens, (hp, wp) = PatchEmbed(16, d, self.dtype, name="patch_embed")(img)
        for i in range(cfgv["depth"]):
            tokens = ViTBlock(d, cfgv["num_heads"], dtype=self.dtype,
                              name=f"block_{i}")(tokens, deterministic=not train)
        tokens = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                              name="last_norm")(tokens)
        f16 = tokens.reshape(tokens.shape[0], hp, wp, d)

        t32, (h32, w32) = PatchEmbed(8, d, self.dtype, name="patch_embed8")(img)
        f32 = t32.reshape(t32.shape[0], h32, w32, d)
        up = jnp.repeat(jnp.repeat(f16, 2, axis=1), 2, axis=2)  # nearest 2x
        f32 = nn.Conv(d, (1, 1), dtype=self.dtype, name="conv1")(f32 + up)

        f8 = PooledKVAttention(d, dtype=self.dtype, name="downsample")(
            f16, deterministic=not train
        )
        return [f8, f16, f32]


class ViTMid(nn.Module):
    """Global feature + pass-through fmaps (the vit wrapper has no mid
    projections; the decoder consumes embed_dim-channel maps directly)."""

    out_dims: tuple = ()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pyramid, train: bool = False):
        f8, f16, f32 = pyramid
        global_feature = jnp.mean(f16, axis=(1, 2))
        return global_feature, [f8, f16, f32]
