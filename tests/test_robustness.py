"""Training-runtime robustness: NaN guard + auto-resume checkpoint pick.

The reference has neither (NaNs are only filtered at eval aggregation,
`core/lijun_trainer.py:506-515`; resume requires a hand-set path +
epoch, `core/lijun_trainer.py:103-113`).
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from renderih_tpu.assets import make_synthetic_assets
from renderih_tpu.config import Config, ModelConfig, TrainConfig
from renderih_tpu.data.synthetic import synthetic_batch
from renderih_tpu.models import init_model
from renderih_tpu.train.state import create_train_state, latest_checkpoint
from renderih_tpu.train.trainer import make_train_step


@pytest.fixture(scope="module")
def setup():
    cfg = Config(
        model=ModelConfig(encoder="resnet18"),
        train=TrainConfig(precision="f32", batch_size=8, warmup_epochs=0,
                          lr=1e-3),
    )
    assets = make_synthetic_assets(seed=0)
    model, variables = init_model(cfg, assets, jax.random.PRNGKey(0))
    return cfg, assets, model, variables


def _leaf_sum(tree):
    return sum(float(jnp.sum(jnp.abs(x)))
               for x in jax.tree_util.tree_leaves(tree))


def test_nan_guard_skips_poisoned_batch(setup):
    cfg, assets, model, variables = setup
    state = create_train_state(cfg, variables, steps_per_epoch=1000)
    step, _ = make_train_step(cfg, model, assets, steps_per_epoch=1000,
                              params_template=variables["params"])
    batch = synthetic_batch(assets, jax.random.PRNGKey(1), batch_size=2)

    poisoned = dict(batch)
    poisoned["img"] = batch["img"].at[0, 0, 0, 0].set(jnp.nan)
    params_before = jax.device_get(state.params)
    state, terms = step(state, poisoned, jax.random.PRNGKey(7))
    assert float(terms["skipped_nonfinite"]) == 1.0
    # params unchanged; step does NOT advance (step == applied updates,
    # so the optax-count-driven LR schedule never drifts from state.step)
    a = jax.tree_util.tree_leaves(params_before)
    b = jax.tree_util.tree_leaves(jax.device_get(state.params))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    assert int(state.step) == 0
    assert np.all(np.isfinite(np.asarray(
        jax.tree_util.tree_leaves(state.params)[0])))

    # a clean batch afterwards trains normally
    state, terms = step(state, batch, jax.random.PRNGKey(8))
    assert float(terms["skipped_nonfinite"]) == 0.0
    assert np.isfinite(float(terms["total"]))
    assert int(state.step) == 1
    changed = any(
        not np.array_equal(np.asarray(x), np.asarray(y))
        for x, y in zip(a, jax.tree_util.tree_leaves(
            jax.device_get(state.params)))
    )
    assert changed


def test_latest_checkpoint_ordering(tmp_path):
    d = str(tmp_path)
    assert latest_checkpoint(d) is None
    for name in ("epoch_2", "epoch_10"):
        os.makedirs(os.path.join(d, name))
        time.sleep(0.01)
    assert latest_checkpoint(d).endswith("epoch_10")
    # epochs are ordered by N, not mtime: an rsync'd dir whose epoch_10
    # mtime predates epoch_2 must still resume from epoch_10
    old = time.time() - 100
    os.utime(os.path.join(d, "epoch_10"), (old, old))
    assert latest_checkpoint(d).endswith("epoch_10")
    os.makedirs(os.path.join(d, "preempt"))
    # make preempt newest
    now = time.time() + 10
    os.utime(os.path.join(d, "preempt"), (now, now))
    assert latest_checkpoint(d).endswith("preempt")
    assert latest_checkpoint(os.path.join(d, "missing")) is None
