"""End-to-end training-path test for the MANO-parameter decoder variant."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from renderih_tpu.assets import make_synthetic_assets
from renderih_tpu.config import Config, ModelConfig, TrainConfig
from renderih_tpu.data.pipeline import device_augment
from renderih_tpu.data.synthetic import synthetic_batch
from renderih_tpu.losses.mano_loss import (
    mano_param_losses,
    pose6d_rotmat_loss,
    pose_rotmat_loss,
)
from renderih_tpu.models import init_model
from renderih_tpu.ops.rotation import rodrigues, rot6d_to_rotmat
from renderih_tpu.train.state import create_train_state
from renderih_tpu.train.trainer import make_train_step


def test_pose_losses_zero_for_matching_rotations():
    rng = np.random.default_rng(0)
    aa = jnp.asarray(rng.normal(size=(2, 48)).astype(np.float32) * 0.3)
    assert float(pose_rotmat_loss(aa, aa)) < 1e-10
    # 6D rep of the same rotations (interleaved column layout) -> ~0 loss
    rm = rodrigues(aa.reshape(-1, 3))
    six = jnp.stack([rm[..., 0], rm[..., 1]], axis=-1).reshape(2, 96)
    assert float(pose6d_rotmat_loss(six, aa)) < 1e-8


def test_pipeline_emits_pose_labels():
    assets = make_synthetic_assets(seed=0)
    b = 4
    rng = np.random.default_rng(1)
    batch = {
        "img_u8": jnp.asarray(
            rng.integers(0, 255, (b, 256, 256, 3)), jnp.uint8),
        "pose_left": jnp.asarray(rng.normal(size=(b, 48)).astype(np.float32)),
        "pose_right": jnp.asarray(rng.normal(size=(b, 48)).astype(np.float32)),
        "shape_left": jnp.zeros((b, 10)),
        "shape_right": jnp.ones((b, 10)),
    }
    for h in ("left", "right"):
        batch[f"v3d_{h}"] = jnp.asarray(
            rng.normal(size=(b, 778, 3)).astype(np.float32) * 0.05)
        batch[f"j3d_{h}"] = jnp.asarray(
            rng.normal(size=(b, 21, 3)).astype(np.float32) * 0.05)
        batch[f"v2d_{h}"] = jnp.asarray(
            rng.uniform(0, 256, (b, 778, 2)).astype(np.float32))
        batch[f"j2d_{h}"] = jnp.asarray(
            rng.uniform(0, 256, (b, 21, 2)).astype(np.float32))

    out = device_augment(batch, jax.random.PRNGKey(0), train=True)
    assert out["pose_left"].shape == (b, 48)
    assert out["shape_right"].shape == (b, 10)
    assert np.all(np.isfinite(np.asarray(out["pose_left"])))
    # eval mode: poses pass through untouched
    out_e = device_augment(batch, jax.random.PRNGKey(0), train=False)
    np.testing.assert_allclose(
        np.asarray(out_e["pose_left"]), np.asarray(batch["pose_left"]),
        atol=2e-3,  # rodrigues round-trip of the (unrotated) root
    )


def test_mano_decoder_train_step():
    cfg = Config(
        model=ModelConfig(encoder="resnet18", decoder="mano"),
        train=TrainConfig(precision="f32"),
    )
    assets = make_synthetic_assets(seed=0)
    model, variables = init_model(cfg, assets, jax.random.PRNGKey(0))
    state = create_train_state(cfg, variables, steps_per_epoch=10)
    step, _ = make_train_step(
        cfg, model, assets, steps_per_epoch=10,
        params_template=variables["params"],
    )
    batch = synthetic_batch(assets, jax.random.PRNGKey(1), batch_size=2)
    rng = np.random.default_rng(2)
    for h in ("left", "right"):
        batch[f"pose_{h}"] = jnp.asarray(
            rng.normal(size=(2, 48)).astype(np.float32) * 0.3)
        batch[f"shape_{h}"] = jnp.asarray(
            rng.normal(size=(2, 10)).astype(np.float32) * 0.3)
    state, terms = step(state, batch, jax.random.PRNGKey(3))
    assert "mano_pose" in terms
    assert np.isfinite(float(terms["total"]))
    assert float(terms["mano_pose"]) > 0
