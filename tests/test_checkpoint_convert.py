import jax
import numpy as np
import pytest

from renderih_tpu.assets import make_synthetic_assets
from renderih_tpu.config import Config, ModelConfig, TrainConfig
from renderih_tpu.models import init_model
from renderih_tpu.utils.checkpoint_convert import (
    convert_reference_checkpoint,
    export_reference_checkpoint,
    strip_module_prefix,
)


@pytest.fixture(scope="module")
def model_setup():
    cfg = Config(
        model=ModelConfig(encoder="resnet18"),
        train=TrainConfig(precision="f32"),
    )
    assets = make_synthetic_assets(seed=0)
    model, variables = init_model(cfg, assets, jax.random.PRNGKey(0))
    return cfg, variables


def _tree_paths(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_tree_paths(v, f"{prefix}/{k}"))
    else:
        out[prefix] = np.asarray(tree)
    return out


def test_roundtrip_params(model_setup):
    """flax -> torch-layout -> flax is the identity on every leaf."""
    _, variables = model_setup
    params, stats = variables["params"], variables["batch_stats"]
    torch_style = export_reference_checkpoint(params, stats)
    params2, stats2 = convert_reference_checkpoint(torch_style, "resnet18")

    a = _tree_paths(params)
    b = _tree_paths(params2)
    assert set(a) == set(b), (
        f"missing: {sorted(set(a) - set(b))[:5]} extra: {sorted(set(b) - set(a))[:5]}"
    )
    for k in a:
        np.testing.assert_allclose(a[k], b[k], atol=0, err_msg=k)

    sa = _tree_paths(stats)
    sb = _tree_paths(stats2)
    assert set(sa) == set(sb)
    for k in sa:
        np.testing.assert_allclose(sa[k], sb[k], atol=0, err_msg=k)


def test_exported_keys_are_reference_shaped(model_setup):
    """Linear weights come out (out,in); convs (o,i,kh,kw)."""
    _, variables = model_setup
    torch_style = export_reference_checkpoint(
        variables["params"], variables["batch_stats"]
    )
    w = torch_style["decoder.coord_head.weight"]
    assert w.shape == (3, 64)
    c = torch_style["encoder.resnet.conv1.weight"]
    assert c.shape == (64, 3, 7, 7)
    up = torch_style["decoder.unsample_layer.weight"]
    assert up.shape[0] == 778  # (778, V_out); V_out = 252 with real MANO
    # DDP prefix stripping path
    prefixed = {f"module.{k}": v for k, v in torch_style.items()}
    assert set(strip_module_prefix(prefixed)) == set(torch_style)


def test_torch_tensor_inputs(model_setup):
    """Converter accepts actual torch tensors."""
    torch = pytest.importorskip("torch")
    _, variables = model_setup
    torch_style = export_reference_checkpoint(
        variables["params"], variables["batch_stats"]
    )
    as_torch = {k: torch.from_numpy(np.asarray(v)) for k, v in torch_style.items()}
    params2, _ = convert_reference_checkpoint(as_torch, "resnet18")
    np.testing.assert_allclose(
        np.asarray(variables["params"]["decoder"]["coord_head"]["kernel"]),
        np.asarray(params2["decoder"]["coord_head"]["kernel"]),
        atol=0,
    )
