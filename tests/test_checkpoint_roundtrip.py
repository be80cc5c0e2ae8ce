import jax
import jax.numpy as jnp
import numpy as np
import pytest

from renderih_tpu.assets import make_synthetic_assets
from renderih_tpu.config import Config, ModelConfig, TrainConfig
from renderih_tpu.models import init_model
from renderih_tpu.train.state import (
    create_train_state,
    restore_checkpoint,
    save_checkpoint,
)


def test_orbax_save_restore_roundtrip(tmp_path):
    cfg = Config(
        model=ModelConfig(encoder="resnet18"),
        train=TrainConfig(precision="f32"),
    )
    assets = make_synthetic_assets(seed=0)
    _, variables = init_model(cfg, assets, jax.random.PRNGKey(0))
    state = create_train_state(cfg, variables, steps_per_epoch=10)
    state = state.replace(step=jnp.asarray(42, jnp.int32))

    path = str(tmp_path / "ckpt")
    save_checkpoint(path, state)

    template = create_train_state(cfg, variables, steps_per_epoch=10)
    restored = restore_checkpoint(path, template)
    assert int(restored.step) == 42
    np.testing.assert_allclose(
        np.asarray(restored.params["decoder"]["coord_head"]["kernel"]),
        np.asarray(state.params["decoder"]["coord_head"]["kernel"]),
        atol=0,
    )
    # optimizer state (incl. multi_transform wrapper) restores exactly
    flat_a = jax.tree_util.tree_leaves(state.opt_state)
    flat_b = jax.tree_util.tree_leaves(restored.opt_state)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)
