"""In-train eval overlays must track the model (`apps/train.py`).

Round-4 regression: the committed convergence run's overlay PNGs were
byte-identical across evals and nothing surfaced it. The writer now logs
a mean-abs pixel delta between consecutive overlay writes; this test
asserts a training step visibly changes the pred panel and the delta
receipt lands in metrics.jsonl.
"""

import json
import os

import jax
import numpy as np
import pytest

from renderih_tpu.assets import make_synthetic_assets
from renderih_tpu.config import Config, ModelConfig, TrainConfig
from renderih_tpu.data.interhand import make_synthetic_packed
from renderih_tpu.data.synthetic import synthetic_batch
from renderih_tpu.models import init_model
from renderih_tpu.train.state import create_train_state
from renderih_tpu.train.trainer import make_train_step
from renderih_tpu.utils.metrics_writer import MetricsWriter


@pytest.mark.slow
def test_overlay_changes_after_training_step(tmp_path):
    from renderih_tpu.apps.train import _write_eval_overlays

    cfg = Config(
        model=ModelConfig(encoder="resnet18"),
        train=TrainConfig(precision="f32", batch_size=2, warmup_epochs=0,
                          lr=3e-3),
    )
    assets = make_synthetic_assets(seed=0)
    model, variables = init_model(cfg, assets, jax.random.PRNGKey(0))
    eval_ds = make_synthetic_packed(str(tmp_path / "data"), "test", assets,
                                    n=2, render_images=False)
    writer = MetricsWriter(str(tmp_path / "run"))
    prev = {}

    _write_eval_overlays(writer, 1, cfg, model, variables, assets, eval_ds,
                         n=1, _prev=prev)

    # a few real optimization steps so the predicted mesh moves
    state = create_train_state(cfg, variables, steps_per_epoch=100)
    step, _ = make_train_step(cfg, model, assets, steps_per_epoch=100,
                              params_template=variables["params"])
    batch = synthetic_batch(assets, jax.random.PRNGKey(1), batch_size=2)
    for _ in range(3):
        state, _terms = step(state, batch, jax.random.PRNGKey(7))
    new_vars = {"params": jax.device_get(state.params),
                "batch_stats": jax.device_get(state.batch_stats)}

    _write_eval_overlays(writer, 2, cfg, model, new_vars, assets, eval_ds,
                         n=1, _prev=prev)

    vis = tmp_path / "run" / "vis"
    a = (vis / "eval_overlay_0_step0000001.png").read_bytes()
    b = (vis / "eval_overlay_0_step0000002.png").read_bytes()
    assert a != b, "overlay did not change after training steps"

    deltas = [
        json.loads(line)
        for line in open(tmp_path / "run" / "metrics.jsonl")
        if "eval/overlay_0_delta" in line
    ]
    assert len(deltas) == 1
    assert deltas[0]["eval/overlay_0_delta"] > 0.0
