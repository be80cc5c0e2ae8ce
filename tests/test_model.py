import jax
import jax.numpy as jnp
import numpy as np
import pytest

from renderih_tpu.assets import make_synthetic_assets
from renderih_tpu.config import Config, ModelConfig, TrainConfig
from renderih_tpu.models import init_model, model_call_kwargs


@pytest.fixture(scope="module")
def assets():
    return make_synthetic_assets(seed=0)


def _tiny_cfg(**model_kw) -> Config:
    cfg = Config()
    # resnet18 + full decoder: exercises every module cheaply on CPU.
    cfg = Config(
        model=ModelConfig(encoder="resnet18", dropout=0.05, **model_kw),
        train=TrainConfig(precision="f32"),
    )
    return cfg


def test_forward_shapes(assets):
    cfg = _tiny_cfg()
    model, variables = init_model(cfg, assets, jax.random.PRNGKey(0))
    img = jnp.zeros((2, 256, 256, 3))
    out = model.apply(
        variables, img, train=False, **model_call_kwargs(cfg, assets)
    )
    v_out = assets.left.verts_nums[-1]  # coarsest*4 (252 for real MANO)
    for hand in ("left", "right"):
        assert out.verts3d[hand].shape == (2, 778, 3)
        assert out.verts2d[hand].shape == (2, 778, 2)
        assert out.scale[hand].shape == (2,)
        assert out.trans2d[hand].shape == (2, 2)
        assert out.coarse_verts3d[hand][0].shape == (2, v_out, 3)
    assert np.all(np.isfinite(np.asarray(out.verts3d["left"])))


def test_forward_cheby_variant(assets):
    cfg = _tiny_cfg(use_cheby=True)
    model, variables = init_model(cfg, assets, jax.random.PRNGKey(0))
    img = jnp.zeros((1, 256, 256, 3))
    out = model.apply(
        variables, img, train=False, **model_call_kwargs(cfg, assets)
    )
    assert out.verts3d["left"].shape == (1, 778, 3)
    assert np.all(np.isfinite(np.asarray(out.verts3d["right"])))


def test_mano_head_variant(assets):
    cfg = _tiny_cfg(decoder="mano")
    model, variables = init_model(cfg, assets, jax.random.PRNGKey(0))
    img = jnp.zeros((1, 256, 256, 3))
    out = model.apply(
        variables, img, train=False, **model_call_kwargs(cfg, assets)
    )
    assert out.mano_pose["left"].shape == (1, 96)
    assert out.mano_shape["right"].shape == (1, 10)


def test_train_mode_with_dropout_and_bn(assets):
    cfg = _tiny_cfg()
    model, variables = init_model(cfg, assets, jax.random.PRNGKey(0))
    img = jax.random.normal(jax.random.PRNGKey(1), (2, 256, 256, 3))
    out, mutated = model.apply(
        variables, img, train=True, **model_call_kwargs(cfg, assets),
        rngs={"dropout": jax.random.PRNGKey(2)},
        mutable=["batch_stats"],
    )
    assert "batch_stats" in mutated
    assert np.all(np.isfinite(np.asarray(out.verts3d["left"])))
