"""Data-parallel sharded inference in the evaluator.

`evaluate_packed(mesh=...)` shards the eval batch over the mesh 'data'
axis with replicated params — the serving-scale counterpart of the
trainer's batch sharding. Metrics must match the single-device path.
"""

import os

import jax
import numpy as np
import pytest

from renderih_tpu.assets import make_synthetic_assets
from renderih_tpu.config import Config, ModelConfig, TrainConfig
from renderih_tpu.data.interhand import make_synthetic_packed
from renderih_tpu.eval.evaluator import evaluate_packed
from renderih_tpu.models import init_model
from renderih_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    assets = make_synthetic_assets(seed=0)
    cfg = Config(
        model=ModelConfig(encoder="resnet18"),
        train=TrainConfig(precision="f32"),
    )
    model, variables = init_model(cfg, assets, jax.random.PRNGKey(0))
    root = str(tmp_path_factory.mktemp("packed"))
    dataset = make_synthetic_packed(root, "test", assets, n=32, seed=3)
    return cfg, model, variables, assets, dataset


def test_sharded_eval_matches_single_device(setup):
    cfg, model, variables, assets, dataset = setup
    single = evaluate_packed(cfg, model, variables, assets, dataset,
                             batch_size=16)
    mesh = make_mesh(data=8, model=1)
    sharded = evaluate_packed(cfg, model, variables, assets, dataset,
                              batch_size=16, mesh=mesh)
    for k in ("mpjpe_mm", "mpvpe_mm", "pa_mpjpe_mm", "mrrpe_mm"):
        assert sharded[k] == pytest.approx(single[k], abs=1e-3), k


def test_device_cache_matches_streaming(setup):
    """The HBM-resident eval path (upload once, dynamic-slice batches on
    device) must be metric-identical to the per-batch streaming path."""
    cfg, model, variables, assets, dataset = setup
    cached = evaluate_packed(cfg, model, variables, assets, dataset,
                             batch_size=16, device_cache=True)
    streamed = evaluate_packed(cfg, model, variables, assets, dataset,
                               batch_size=16, device_cache=False)
    assert cached["device_cache"] and not streamed["device_cache"]
    for k in ("mpjpe_mm", "mpvpe_mm", "pa_mpjpe_mm", "mrrpe_mm", "cdev_mm"):
        assert cached[k] == pytest.approx(streamed[k], abs=1e-3), k


def test_device_cache_tail_padding(setup, tmp_path):
    """n=30 with batch 16: the cached path pads to 32 by repeating the
    last sample; metrics must match an exact-fit streaming run."""
    cfg, model, variables, assets, _ = setup
    dataset = make_synthetic_packed(str(tmp_path), "test", assets,
                                    n=30, seed=5)
    cached = evaluate_packed(cfg, model, variables, assets, dataset,
                             batch_size=16, device_cache=True)
    streamed = evaluate_packed(cfg, model, variables, assets, dataset,
                               batch_size=30, device_cache=False)
    for k in ("mpjpe_mm", "mpvpe_mm", "pa_mpjpe_mm", "mrrpe_mm"):
        assert cached[k] == pytest.approx(streamed[k], abs=5e-3), k


def test_sharded_eval_rounds_batch_and_keeps_tail(setup, tmp_path):
    """A batch size not divisible by the data axis rounds down (12 -> 8),
    and with n=30 the padded tail (30 % 8 = 6 valid rows) must contribute
    exactly like in the single-device run — identical metrics prove no
    tail sample is dropped or double-counted."""
    cfg, model, variables, assets, _ = setup
    from renderih_tpu.data.interhand import make_synthetic_packed

    dataset = make_synthetic_packed(str(tmp_path), "test", assets,
                                    n=30, seed=5)
    single = evaluate_packed(cfg, model, variables, assets, dataset,
                             batch_size=30)
    mesh = make_mesh(data=8, model=1)
    out = evaluate_packed(cfg, model, variables, assets, dataset,
                          batch_size=12, mesh=mesh)  # rounds to 8
    # abs=5e-3 mm: different batch partitioning reorders float reductions
    # (~1e-3 mm); a dropped/double-counted tail sample moves metrics by
    # orders of magnitude more
    for k in ("mpjpe_mm", "mpvpe_mm", "pa_mpjpe_mm", "mrrpe_mm"):
        assert out[k] == pytest.approx(single[k], abs=5e-3), k
