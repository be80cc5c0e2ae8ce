"""Gradient accumulation (cfg.train.grad_accum): equivalence tests.

With dropout off and both micro-batches identical, the accumulated
gradient mathematically equals the plain gradient (train-mode BN
normalizes with CURRENT batch statistics, so the chained running-stats
carry does not change activations), and the trainer divides each
micro-batch gradient by `accum` BEFORE summing, so for accum=2 the sum
g/2 + g/2 reassociates exactly. The remaining tolerance covers the one
legitimate source of difference: the scanned grad and the plain grad are
two separately compiled XLA programs, so per-element fusion choices may
differ by ULPs (NOT bit-for-bit).

The equivalence check runs with SGD and compares the RAW GRADIENT
recovered as (p0 - p1)/lr. An earlier version compared post-AdamW
params, which is meaningless: Adam's first step is +-lr * g/(|g|+eps)
~= +-lr * sign(g) for every element, so it neither detects a 2x
mis-averaging (magnitude-invariant) nor tolerates near-zero-gradient
elements (whose sign is pure float noise amplified to a full +-lr flip).
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

    lr = cfg.train.lr
    cfg_sgd = replace(cfg, train=replace(cfg.train, optimizer="sgd"))
    cfg_acc = replace(cfg_sgd, train=replace(cfg_sgd.train, grad_accum=2))
    rng = jax.random.PRNGKey(7)

    p0 = jax.tree_util.tree_map(np.asarray, variables["params"])

    state_a = create_train_state(cfg_sgd, variables, steps_per_epoch=100)
    step_a, _ = make_train_step(cfg_sgd, model, assets, steps_per_epoch=100,
                                params_template=variables["params"])
    state_a, terms_a = step_a(state_a, half, rng)

    state_b = create_train_state(cfg_acc, variables, steps_per_epoch=100)
    step_b, _ = make_train_step(cfg_acc, model, assets, steps_per_epoch=100,
                                params_template=variables["params"])
    state_b, terms_b = step_b(state_b, full, rng)

    assert int(state_a.step) == int(state_b.step) == 1
    np.testing.assert_allclose(float(terms_a["total"]),
                               float(terms_b["total"]), rtol=1e-5)
    # Recover the raw gradients from the SGD update: g = (p0 - p1)/lr.
    # Tolerance must be GLOBAL-gradient-scale-aware: some leaves have a
    # mathematically-zero gradient (e.g. every key-projection bias —
    # softmax is invariant to a constant shift of all scores), so their
    # computed grads are catastrophic-cancellation residue, uncorrelated
    # between the two compiled programs. Those residues are bounded by
    # ULP noise of the big gradients, hence atol relative to the global
    # max; a real averaging bug (summing without dividing) is a
    # 1.0-relative error on every non-degenerate leaf and still trips
    # the rtol term.
    flat_a = jax.tree_util.tree_leaves_with_path(state_a.params)
    flat_b = jax.tree_util.tree_leaves(state_b.params)
    flat_0 = jax.tree_util.tree_leaves(p0)
    grads = [((p - np.asarray(a)) / lr, (p - np.asarray(b)) / lr, path)
             for (path, a), b, p in zip(flat_a, flat_b, flat_0)]
    g_scale = max(np.abs(g_a).max() for g_a, _, _ in grads)
    assert g_scale > 1e-3, "degenerate test: all gradients ~ 0"
    for g_a, g_b, path in grads:
        np.testing.assert_allclose(
            g_a, g_b, rtol=1e-4, atol=1e-5 * g_scale,
            err_msg=jax.tree_util.keystr(path))


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
