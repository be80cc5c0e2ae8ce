"""Gradient accumulation (cfg.train.grad_accum): exact-equivalence tests.

With dropout off and both micro-batches identical, the averaged
accumulated gradient equals the plain gradient bit-for-bit in
expectation (train-mode BN normalizes with CURRENT batch statistics, so
the chained running-stats carry does not change activations), so the
post-step params must match the unaccumulated step on one micro-batch.
"""

from dataclasses import replace

import jax
import numpy as np
import pytest

from renderih_tpu.assets import make_synthetic_assets
from renderih_tpu.config import Config, ModelConfig, TrainConfig
from renderih_tpu.data.synthetic import synthetic_batch
from renderih_tpu.models import init_model
from renderih_tpu.train.state import create_train_state
from renderih_tpu.train.trainer import make_train_step


@pytest.fixture(scope="module")
def setup():
    cfg = Config(
        model=ModelConfig(encoder="resnet18", dropout=0.0),
        train=TrainConfig(precision="f32", batch_size=4, warmup_epochs=0,
                          lr=1e-3),
    )
    assets = make_synthetic_assets(seed=0)
    model, variables = init_model(cfg, assets, jax.random.PRNGKey(0))
    return cfg, assets, model, variables


def test_accum_matches_plain_step_on_duplicated_batch(setup):
    cfg, assets, model, variables = setup
    half = synthetic_batch(assets, jax.random.PRNGKey(1), batch_size=2)
    full = jax.tree_util.tree_map(
        lambda v: np.concatenate([np.asarray(v)] * 2, axis=0), half)

    cfg_acc = replace(cfg, train=replace(cfg.train, grad_accum=2))
    rng = jax.random.PRNGKey(7)

    state_a = create_train_state(cfg, variables, steps_per_epoch=100)
    step_a, _ = make_train_step(cfg, model, assets, steps_per_epoch=100,
                                params_template=variables["params"])
    state_a, terms_a = step_a(state_a, half, rng)

    state_b = create_train_state(cfg_acc, variables, steps_per_epoch=100)
    step_b, _ = make_train_step(cfg_acc, model, assets, steps_per_epoch=100,
                                params_template=variables["params"])
    state_b, terms_b = step_b(state_b, full, rng)

    assert int(state_a.step) == int(state_b.step) == 1
    np.testing.assert_allclose(float(terms_a["total"]),
                               float(terms_b["total"]), rtol=1e-5)
    leaves_a = jax.tree_util.tree_leaves(state_a.params)
    leaves_b = jax.tree_util.tree_leaves(state_b.params)
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-7)


def test_accum_loss_decreases_and_batch_divisibility_checked(setup):
    cfg, assets, model, variables = setup
    cfg_acc = replace(cfg, train=replace(cfg.train, grad_accum=2,
                                         batch_size=4))
    state = create_train_state(cfg_acc, variables, steps_per_epoch=100)
    step, _ = make_train_step(cfg_acc, model, assets, steps_per_epoch=100,
                              params_template=variables["params"])
    batch = synthetic_batch(assets, jax.random.PRNGKey(2), batch_size=4)
    losses = []
    for _ in range(4):
        state, terms = step(state, batch, jax.random.PRNGKey(9))
        losses.append(float(terms["total"]))
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0]
    assert int(state.step) == 4

    bad = synthetic_batch(assets, jax.random.PRNGKey(3), batch_size=3)
    with pytest.raises(AssertionError, match="grad_accum"):
        step(state, bad, jax.random.PRNGKey(0))


def test_accum_on_mesh_compiles_and_runs(setup):
    cfg, assets, model, variables = setup
    from renderih_tpu.parallel.mesh import make_mesh, shard_batch
    from renderih_tpu.train.trainer import shard_train_state

    n = jax.device_count()
    if n < 2:
        pytest.skip("needs the multi-device CPU mesh")
    mesh = make_mesh(data=n, model=1)
    cfg_acc = replace(cfg, train=replace(cfg.train, grad_accum=2,
                                         batch_size=2 * n))
    state = create_train_state(cfg_acc, variables, steps_per_epoch=100)
    state = shard_train_state(state, mesh, cfg_acc)
    step, _ = make_train_step(cfg_acc, model, assets, steps_per_epoch=100,
                              mesh=mesh, params_template=variables["params"])
    batch = synthetic_batch(assets, jax.random.PRNGKey(4), batch_size=2 * n)
    batch = shard_batch(batch, mesh)
    state, terms = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(terms["total"]))
    assert int(state.step) == 1
