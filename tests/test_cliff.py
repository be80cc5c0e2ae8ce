import jax
import jax.numpy as jnp
import numpy as np

from renderih_tpu.assets import make_synthetic_assets
from renderih_tpu.config import Config, ModelConfig, TrainConfig
from renderih_tpu.models import build_model, model_call_kwargs


def test_cliff_bbox_conditioning():
    cfg = Config(
        model=ModelConfig(encoder="resnet18"),
        train=TrainConfig(precision="f32"),
    )
    assets = make_synthetic_assets(seed=0)
    model = build_model(cfg, assets)
    kw = model_call_kwargs(cfg, assets)
    img = jnp.zeros((2, 256, 256, 3))
    bbox = jnp.asarray([[0.1, -0.2, 0.5], [0.0, 0.0, 1.0]])
    variables = model.init(
        {"params": jax.random.PRNGKey(0),
         "dropout": jax.random.PRNGKey(1)},
        img, train=False, bbox_info=bbox, **kw,
    )
    out1 = model.apply(variables, img, train=False, bbox_info=bbox, **kw)
    out2 = model.apply(
        variables, img, train=False, bbox_info=bbox * 2.0, **kw
    )
    assert out1.verts3d["left"].shape == (2, 778, 3)
    # conditioning reaches the outputs
    diff = np.abs(
        np.asarray(out1.scale["left"]) - np.asarray(out2.scale["left"])
    ).max()
    assert diff > 0
