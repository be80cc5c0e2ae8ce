import jax
import jax.numpy as jnp
import numpy as np
import pytest

from renderih_tpu.assets import make_synthetic_assets
from renderih_tpu.config import Config, ModelConfig, TrainConfig
from renderih_tpu.losses.graph_loss import aux_losses
from renderih_tpu.models import init_model, model_call_kwargs


def test_aux_heads_shapes_and_loss():
    cfg = Config(
        model=ModelConfig(encoder="resnet18", with_aux_heads=True),
        train=TrainConfig(precision="f32"),
    )
    assets = make_synthetic_assets(seed=0)
    model, variables = init_model(cfg, assets, jax.random.PRNGKey(0))
    out = model.apply(
        variables, jnp.zeros((2, 256, 256, 3)), train=False,
        **model_call_kwargs(cfg, assets),
    )
    assert out.aux is not None
    assert out.aux["hms"].shape == (2, 64, 64, 42)
    assert out.aux["mask"].shape == (2, 64, 64)
    assert out.aux["dense"].shape == (2, 64, 64, 6)

    batch = {
        "hms": jnp.zeros((2, 64, 64, 42)),
        "mask": jnp.zeros((2, 64, 64)),
        "dense": jnp.zeros((2, 64, 64, 6)),
    }
    terms = aux_losses(out.aux, batch)
    assert set(terms) == {"mask", "dense", "hms", "total"}
    assert np.isfinite(float(terms["total"]))


def test_aux_heads_off_by_default():
    cfg = Config(
        model=ModelConfig(encoder="resnet18"),
        train=TrainConfig(precision="f32"),
    )
    assets = make_synthetic_assets(seed=0)
    model, variables = init_model(cfg, assets, jax.random.PRNGKey(0))
    out = model.apply(
        variables, jnp.zeros((1, 256, 256, 3)), train=False,
        **model_call_kwargs(cfg, assets),
    )
    assert out.aux is None
