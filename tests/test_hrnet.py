import jax
import jax.numpy as jnp
import numpy as np
import pytest

from renderih_tpu.models.hrnet import HRNetEncoder, HRNetMid


@pytest.fixture(scope="module")
def pyramid():
    enc = HRNetEncoder(model_type="hrnet_w18")
    img = jnp.zeros((1, 128, 128, 3))  # small input keeps CPU time sane
    variables = enc.init(jax.random.PRNGKey(0), img)
    return enc, variables, enc.apply(variables, img)


def test_pyramid_shapes(pyramid):
    enc, _, feats = pyramid
    # 128 input -> branches at 1/4, 1/8, 1/16, 1/32; coarsest first
    assert feats[0].shape == (1, 4, 4, 144)
    assert feats[1].shape == (1, 8, 8, 72)
    assert feats[2].shape == (1, 16, 16, 36)
    assert feats[3].shape == (1, 32, 32, 18)
    for f in feats:
        assert np.all(np.isfinite(np.asarray(f)))


def test_mid_head(pyramid):
    _, _, feats = pyramid
    mid = HRNetMid(out_dims=(256, 256, 256, 256))
    variables = mid.init(jax.random.PRNGKey(1), feats)
    gf, fmaps = mid.apply(variables, feats)
    assert gf.shape == (1, 2048)
    assert [f.shape[-1] for f in fmaps] == [256, 256, 256, 256]
    assert fmaps[0].shape[1] == 4 and fmaps[3].shape[1] == 32


def test_hrnet_full_model():
    from renderih_tpu.assets import make_synthetic_assets
    from renderih_tpu.config import Config, ModelConfig, TrainConfig
    from renderih_tpu.models import init_model, model_call_kwargs

    cfg = Config(
        model=ModelConfig(encoder="hrnet_w18"),
        train=TrainConfig(precision="f32"),
    )
    assets = make_synthetic_assets(seed=0)
    model, variables = init_model(cfg, assets, jax.random.PRNGKey(0))
    out = model.apply(
        variables, jnp.zeros((1, 256, 256, 3)), train=False,
        **model_call_kwargs(cfg, assets),
    )
    assert out.verts3d["left"].shape == (1, 778, 3)
    assert np.all(np.isfinite(np.asarray(out.verts3d["left"])))
