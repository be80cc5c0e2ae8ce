"""EMA of params: maintained in-step, NaN-guard-gated, sharded like params.

Beyond-parity feature (the reference has no EMA); semantics follow the
standard `ema = d*ema + (1-d)*params` applied after each accepted update,
initialized at the initial params.
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
from renderih_tpu.train.trainer import make_train_step, state_shardings


@pytest.fixture(scope="module")
def setup():
    cfg = Config(
        model=ModelConfig(encoder="resnet18"),
        train=TrainConfig(precision="f32", batch_size=8, ema_decay=0.5),
    )
    assets = make_synthetic_assets(seed=0)
    model, variables = init_model(cfg, assets, jax.random.PRNGKey(0))
    return cfg, assets, model, variables


def test_ema_off_by_default():
    cfg = Config(model=ModelConfig(encoder="resnet18"),
                 train=TrainConfig(precision="f32"))
    assert cfg.train.ema_decay == 0.0


def test_ema_matches_numpy_oracle(setup):
    cfg, assets, model, variables = setup
    state = create_train_state(cfg, variables, steps_per_epoch=100)
    # EMA starts as a copy of params, not an alias
    p0 = jax.device_get(state.params)
    e0 = jax.device_get(state.ema_params)
    np.testing.assert_array_equal(
        np.asarray(p0["decoder"]["upsample_weight"]),
        np.asarray(e0["decoder"]["upsample_weight"]))

    step, _ = make_train_step(cfg, model, assets, steps_per_epoch=100,
                              params_template=variables["params"])
    batch = synthetic_batch(assets, jax.random.PRNGKey(1), batch_size=2)

    flat0, treedef = jax.tree_util.tree_flatten(e0)
    oracle = [np.asarray(x, np.float64) for x in flat0]
    d = cfg.train.ema_decay
    for i in range(3):
        state, terms = step(state, batch, jax.random.PRNGKey(7))
        params_np = [np.asarray(x, np.float64) for x in
                     jax.tree_util.tree_leaves(jax.device_get(state.params))]
        oracle = [d * e + (1 - d) * p for e, p in zip(oracle, params_np)]
    assert float(terms["skipped_nonfinite"]) == 0.0
    got = [np.asarray(x) for x in
           jax.tree_util.tree_leaves(jax.device_get(state.ema_params))]
    for g, o in zip(got, oracle):
        np.testing.assert_allclose(g, o, rtol=1e-5, atol=1e-6)
    # and EMA actually lags params (they differ after updates)
    p = jax.tree_util.tree_leaves(jax.device_get(state.params))
    deltas = [np.abs(np.asarray(a) - np.asarray(b)).max()
              for a, b in zip(got, p)]
    assert max(deltas) > 0.0


def test_ema_checkpoint_roundtrip(setup, tmp_path):
    """EMA params survive orbax save/restore; EMA-less templates keep the
    round-1 state structure."""
    from renderih_tpu.train.state import restore_checkpoint, save_checkpoint

    cfg, assets, model, variables = setup
    state = create_train_state(cfg, variables, steps_per_epoch=10)
    # make EMA distinguishable from params
    state = state.replace(ema_params=jax.tree_util.tree_map(
        lambda x: x + 1.0, state.ema_params))
    save_checkpoint(str(tmp_path / "ck"), state)
    restored = restore_checkpoint(
        str(tmp_path / "ck"), create_train_state(cfg, variables, 10))
    for a, b in zip(jax.tree_util.tree_leaves(restored.ema_params),
                    jax.tree_util.tree_leaves(state.ema_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    cfg_off = replace(cfg, train=replace(cfg.train, ema_decay=0.0))
    assert create_train_state(cfg_off, variables, 10).ema_params is None


def test_ema_sharded_like_params(setup):
    cfg, assets, model, variables = setup
    from renderih_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(data=4, model=2)
    cfg2 = replace(cfg, train=replace(cfg.train, mesh_model=2))
    state = create_train_state(cfg2, variables, steps_per_epoch=100)
    sh = state_shardings(state, mesh, cfg2)
    flat_p = jax.tree_util.tree_leaves_with_path(sh.params)
    flat_e = dict(
        (jax.tree_util.keystr(kp), s)
        for kp, s in jax.tree_util.tree_leaves_with_path(sh.ema_params))
    assert len(flat_e) == len(flat_p)
    for kp, s in flat_p:
        assert flat_e[jax.tree_util.keystr(kp)].spec == s.spec
