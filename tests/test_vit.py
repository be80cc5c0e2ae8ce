import jax
import jax.numpy as jnp
import numpy as np
import pytest

from renderih_tpu.models.vit import PatchEmbed, PooledKVAttention, ViTEncoder


def test_patch_embed_shapes():
    pe = PatchEmbed(16, 96)
    img = jnp.zeros((1, 256, 256, 3))
    vars_ = pe.init(jax.random.PRNGKey(0), img)
    tokens, (h, w) = pe.apply(vars_, img)
    assert (h, w) == (16, 16)
    assert tokens.shape == (1, 256, 96)

    pe8 = PatchEmbed(8, 96)
    vars8 = pe8.init(jax.random.PRNGKey(0), img)
    tokens8, (h8, w8) = pe8.apply(vars8, img)
    assert (h8, w8) == (32, 32)


def test_pooled_kv_attention_halves_resolution():
    attn = PooledKVAttention(dim=64, num_heads=8)
    fmap = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 64))
    vars_ = attn.init(jax.random.PRNGKey(1), fmap)
    out = attn.apply(vars_, fmap)
    assert out.shape == (2, 8, 8, 64)
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.slow
def test_vit_encoder_pyramid():
    # Tiny ViT config via monkeypatching the registry keeps this CPU-fast.
    from renderih_tpu.models import vit as vit_mod

    vit_mod._VIT_CONFIGS["vit_tiny_test"] = dict(
        embed_dim=64, depth=2, num_heads=4
    )
    enc = ViTEncoder(model_type="vit_tiny_test")
    img = jnp.zeros((1, 256, 256, 3))
    vars_ = enc.init(jax.random.PRNGKey(0), img)
    f8, f16, f32 = enc.apply(vars_, img)
    assert f8.shape == (1, 8, 8, 64)
    assert f16.shape == (1, 16, 16, 64)
    assert f32.shape == (1, 32, 32, 64)
