"""Paired (hand-stacked nn.vmap) decoder execution.

`paired_lr=True` must compute the exact same function as the standard
separate-L/R decoder once params are converted with
`utils/pair_params.py`, for both the MLP and Chebyshev trunk flavours.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from renderih_tpu.assets import make_synthetic_assets
from renderih_tpu.config import Config, ModelConfig, TrainConfig
from renderih_tpu.models import build_model, init_model, model_call_kwargs
from renderih_tpu.utils.pair_params import pair_params, unpair_params


@pytest.fixture(scope="module")
def assets():
    return make_synthetic_assets(seed=0)


def _cfg(**model_kw) -> Config:
    return Config(
        model=ModelConfig(encoder="resnet18", dropout=0.05, **model_kw),
        train=TrainConfig(precision="f32"),
    )


def _forward(cfg, assets, variables, img):
    model = build_model(cfg, assets)
    return model.apply(variables, img, train=False,
                       **model_call_kwargs(cfg, assets))


@pytest.mark.parametrize("use_cheby", [False, True])
def test_paired_matches_standard(assets, use_cheby):
    cfg = _cfg(use_cheby=use_cheby)
    model, variables = init_model(cfg, assets, jax.random.PRNGKey(0))
    img = jax.random.uniform(jax.random.PRNGKey(1), (2, 256, 256, 3))

    out_std = _forward(cfg, assets, variables, img)

    cfg_p = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, paired_lr=True))
    paired_vars = {**variables, "params": pair_params(variables["params"])}
    out_pair = _forward(cfg_p, assets, paired_vars, img)

    for hand in ("left", "right"):
        np.testing.assert_allclose(
            np.asarray(out_std.verts3d[hand]),
            np.asarray(out_pair.verts3d[hand]), atol=1e-5,
            err_msg=f"verts3d {hand} cheby={use_cheby}")
        np.testing.assert_allclose(
            np.asarray(out_std.scale[hand]),
            np.asarray(out_pair.scale[hand]), atol=1e-5)


def test_pair_unpair_roundtrip(assets):
    cfg = _cfg()
    _, variables = init_model(cfg, assets, jax.random.PRNGKey(2))
    params = variables["params"]
    rt = unpair_params(pair_params(params))
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = {jax.tree_util.keystr(p): v
              for p, v in jax.tree_util.tree_leaves_with_path(rt)}
    assert len(flat_a) == len(flat_b)
    for path, v in flat_a:
        k = jax.tree_util.keystr(path)
        np.testing.assert_array_equal(np.asarray(v), np.asarray(flat_b[k]), k)


def test_paired_init_shapes(assets):
    """Native init of the paired model produces hand-stacked leaves that
    unpair into the standard layout."""
    cfg = _cfg(paired_lr=True)
    _, variables = init_model(cfg, assets, jax.random.PRNGKey(3))
    d = variables["params"]["decoder"]["dual_gcn"]["layer_0"]
    assert "graph_pair" in d and "img_ex_pair" in d
    leaf = d["graph_pair"]["block_0"]["fc1"]["kernel"]
    assert leaf.shape[0] == 2
    std = unpair_params(variables["params"])
    assert "graph_left" in std["decoder"]["dual_gcn"]["layer_0"]
