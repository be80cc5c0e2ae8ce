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


def test_mesh_buckets_rounded_and_predict_matches(engine):
    """Sharded path: buckets round up to multiples of the data axis, and
    a request smaller than the axis (n=1) pads + runs without error."""
    from renderih_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(data=8, model=1)
    sharded = InferenceEngine(engine.cfg, assets=engine.assets,
                              variables=engine.variables,
                              buckets=(1, 4, 8), mesh=mesh)
    assert sharded.buckets == (8,)
    for n in (1, 3, 9):
        out = sharded.predict(_images(n, seed=4))
        ref = engine.predict(_images(n, seed=4))
        assert out["verts3d_left"].shape == (n, 778, 3)
        np.testing.assert_allclose(
            out["verts3d_left"], ref["verts3d_left"], atol=2e-5)


def test_close_drains_pending_and_rejects_submit(engine):
    server = BatchingServer(engine, max_batch=4, max_wait_ms=50.0)
    server._stop.set()  # freeze the worker loop
    server._thread.join(timeout=10.0)
    import concurrent.futures as cf

    pending = cf.Future()
    server._q.put((_images(1)[0], pending))
    server.close()
    with pytest.raises(RuntimeError, match="server closed"):
        pending.result(timeout=1)
    with pytest.raises(RuntimeError, match="server closed"):
        server.submit(_images(1)[0])


def test_engine_does_not_mutate_caller_config(engine):
    cfg = Config(model=ModelConfig(encoder="resnet18"),
                 train=TrainConfig(precision="f32"))
    assert cfg.model.decoder_f32
    InferenceEngine(cfg, assets=engine.assets, variables=engine.variables,
                    buckets=(1,), decoder_bf16=True)
    assert cfg.model.decoder_f32  # caller's cfg untouched


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
