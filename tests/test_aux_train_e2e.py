"""Aux-head training end to end: rendered hms/mask/dense targets from the
synthetic generator -> `with_aux_heads` train steps -> all three aux
losses decrease.

Reference capability: the offline target generator
`miscellaneous/interhand_ori_gen.py` feeding `calc_aux_loss`
(`core/Loss.py:180-198`) through the aux decoder heads
(`models/encoder.py:176-242`).
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

IMG = 128  # smaller input -> fmaps (4, 8, 16); aux heads emit 32x32


@pytest.fixture(scope="module")
def setup():
    cfg = Config(
        model=ModelConfig(encoder="resnet18", with_aux_heads=True,
                          img_size=IMG, grid_size=4),
        train=TrainConfig(precision="f32", batch_size=2, warmup_epochs=0,
                          lr=1e-3),
    )
    assets = make_synthetic_assets(seed=0)
    model, variables = init_model(cfg, assets, jax.random.PRNGKey(0))
    return cfg, assets, model, variables


def test_aux_targets_shapes_and_content(setup):
    cfg, assets, _, _ = setup
    batch = synthetic_batch(assets, jax.random.PRNGKey(3), batch_size=2,
                            img_size=IMG, with_aux=True)
    s = IMG // 4
    assert batch["hms"].shape == (2, s, s, 42)
    assert batch["mask"].shape == (2, s, s)
    assert batch["dense"].shape == (2, s, s, 6)
    # real content, not zeros: the silhouette covers part of the frame,
    # heatmaps peak near 1, dense colors live inside the mask
    mask = np.asarray(batch["mask"])
    assert 0.01 < mask.mean() < 0.99
    assert float(np.asarray(batch["hms"]).max()) > 0.5
    dense = np.asarray(batch["dense"])
    assert float(np.abs(dense[mask < 0.5]).max()) <= float(
        np.abs(dense).max())
    assert float(np.abs(dense).max()) > 0.0


def test_aux_losses_decrease_in_training(setup):
    cfg, assets, model, variables = setup
    state = create_train_state(cfg, variables, steps_per_epoch=1000)
    step, _ = make_train_step(
        cfg, model, assets, steps_per_epoch=1000,
        params_template=variables["params"],
    )
    batch = synthetic_batch(assets, jax.random.PRNGKey(1), batch_size=2,
                            img_size=IMG, with_aux=True)
    history = {"aux_mask": [], "aux_dense": [], "aux_hms": [], "total": []}
    for i in range(8):
        state, terms = step(state, batch, jax.random.PRNGKey(7))
        for k in history:
            assert k in terms, sorted(terms)
            history[k].append(float(terms[k]))
    for k, vals in history.items():
        assert np.all(np.isfinite(vals)), (k, vals)
        assert vals[-1] < vals[0], (k, vals)


def test_hms_target_synthesized_on_device_when_absent(setup):
    """Without stored aux targets, the train step synthesizes the joint
    heatmap target from the batch's 2D joints (the from-scratch deep
    supervision path - the reference never trains a cold encoder, its
    ResNetSimple is hardcoded pretrained=True,
    `common/myhand/encoder_lijun.py:330`)."""
    cfg, assets, model, variables = setup
    state = create_train_state(cfg, variables, steps_per_epoch=1000)
    step, _ = make_train_step(
        cfg, model, assets, steps_per_epoch=1000,
        params_template=variables["params"],
    )
    batch = synthetic_batch(assets, jax.random.PRNGKey(2), batch_size=2,
                            img_size=IMG, with_aux=False)
    assert "hms" not in batch
    hist = []
    for _ in range(6):
        state, terms = step(state, batch, jax.random.PRNGKey(3))
        assert "aux_hms" in terms, sorted(terms)
        # mask/dense have no targets in this batch: not applied
        assert "aux_mask" not in terms and "aux_dense" not in terms
        hist.append(float(terms["aux_hms"]))
    assert np.all(np.isfinite(hist)), hist
    assert hist[-1] < hist[0], hist
