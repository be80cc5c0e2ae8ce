"""Serving engine: bucketed-batch inference + dynamic batching."""

import jax
import numpy as np
import pytest

from renderih_tpu.assets import make_synthetic_assets
from renderih_tpu.config import Config, ModelConfig, TrainConfig
from renderih_tpu.models import init_model, model_call_kwargs
from renderih_tpu.ops.image import normalize_imagenet
from renderih_tpu.serve import BatchingServer, InferenceEngine


@pytest.fixture(scope="module")
def engine():
    cfg = Config(
        model=ModelConfig(encoder="resnet18"),
        train=TrainConfig(precision="f32"),
    )
    assets = make_synthetic_assets(seed=0)
    _, variables = init_model(cfg, assets, jax.random.PRNGKey(0))
    return InferenceEngine(cfg, assets=assets, variables=variables,
                           buckets=(1, 4, 8))


def _images(n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 255, (n, 256, 256, 3), np.uint8)


def test_predict_shapes_and_bucketing(engine):
    # n=6 -> buckets 8 (padded); n=9 -> 8 + 1
    for n in (1, 6, 9):
        out = engine.predict(_images(n))
        assert out["verts3d_left"].shape == (n, 778, 3)
        assert out["scale_right"].shape == (n,)
        assert np.all(np.isfinite(out["verts3d_left"]))


def test_predict_matches_direct_apply(engine):
    imgs = _images(3, seed=1)
    out = engine.predict(imgs)
    img = normalize_imagenet(np.asarray(imgs, np.float32) / 255.0)
    direct = engine.model.apply(
        engine.variables, img, train=False,
        **model_call_kwargs(engine.cfg, engine.assets))
    np.testing.assert_allclose(
        out["verts3d_left"], np.asarray(direct.verts3d["left"]), atol=2e-5)


def test_predict_padding_independence(engine):
    """Padded rows must not affect real rows: n=2 (padded to 4) equals the
    first two rows of n=4 with the same leading images."""
    imgs = _images(4, seed=2)
    out2 = engine.predict(imgs[:2])
    out4 = engine.predict(imgs)
    np.testing.assert_allclose(
        out2["verts3d_left"], out4["verts3d_left"][:2], atol=2e-5)


def test_batching_server_concurrent(engine):
    server = BatchingServer(engine, max_batch=4, max_wait_ms=50.0)
    try:
        imgs = _images(5, seed=3)
        futs = [server.submit(imgs[i]) for i in range(5)]
        results = [f.result(timeout=120) for f in futs]
        ref = engine.predict(imgs)
        for i, r in enumerate(results):
            assert r["verts3d_left"].shape == (778, 3)
            np.testing.assert_allclose(
                r["verts3d_left"], ref["verts3d_left"][i], atol=2e-5)
    finally:
        server.close()
