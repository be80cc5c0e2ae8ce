"""HTTP serving front-end: npy/json round trips, batching, errors."""

import io
import json
import urllib.request

import jax
import numpy as np
import pytest

from renderih_tpu.assets import make_synthetic_assets
from renderih_tpu.config import Config, ModelConfig, TrainConfig
from renderih_tpu.models import init_model
from renderih_tpu.serve import InferenceEngine
from renderih_tpu.serve_http import HandPoseHTTPServer


@pytest.fixture(scope="module")
def server():
    cfg = Config(
        model=ModelConfig(encoder="resnet18"),
        train=TrainConfig(precision="f32"),
    )
    assets = make_synthetic_assets(seed=0)
    _, variables = init_model(cfg, assets, jax.random.PRNGKey(0))
    engine = InferenceEngine(cfg, assets=assets, variables=variables,
                             buckets=(1, 4))
    srv = HandPoseHTTPServer(engine, host="127.0.0.1", port=0,
                             max_wait_ms=5.0)
    srv.start()
    yield srv
    srv.close()


def _post(server, body, ctype):
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}/predict", data=body,
        headers={"Content-Type": ctype}, method="POST")
    with urllib.request.urlopen(req, timeout=300) as r:
        return r.headers.get("Content-Type"), r.read()


def _images(n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 255, (n, 256, 256, 3), np.uint8)


def test_healthz(server):
    with urllib.request.urlopen(
            f"http://127.0.0.1:{server.port}/healthz", timeout=30) as r:
        info = json.loads(r.read())
    assert info["status"] == "ok"
    assert info["buckets"] == [1, 4]


def test_npy_single_image_round_trip(server):
    img = _images(1)[0]
    buf = io.BytesIO()
    np.save(buf, img)
    ctype, body = _post(server, buf.getvalue(), "application/x-npy")
    assert ctype == "application/x-npz"
    out = np.load(io.BytesIO(body))
    assert out["verts3d_left"].shape == (778, 3)
    ref = server.engine.predict(img[None])
    np.testing.assert_allclose(
        out["verts3d_left"], ref["verts3d_left"][0], atol=2e-5)


def test_npy_batch_round_trip(server):
    imgs = _images(3, seed=1)
    buf = io.BytesIO()
    np.save(buf, imgs)
    _, body = _post(server, buf.getvalue(), "application/x-npy")
    out = np.load(io.BytesIO(body))
    assert out["verts3d_left"].shape == (3, 778, 3)
    ref = server.engine.predict(imgs)
    np.testing.assert_allclose(
        out["verts3d_left"], ref["verts3d_left"], atol=2e-5)


def test_json_round_trip(server):
    img = _images(1, seed=2)[0]
    body = json.dumps({"image": img.tolist()}).encode()
    ctype, resp = _post(server, body, "application/json")
    assert ctype == "application/json"
    out = json.loads(resp)
    got = np.asarray(out["verts3d_left"], np.float32)
    ref = server.engine.predict(img[None])
    np.testing.assert_allclose(got, ref["verts3d_left"][0], atol=2e-5)


def test_bad_shape_is_400_not_500(server):
    buf = io.BytesIO()
    np.save(buf, np.zeros((16, 16, 3), np.uint8))
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, buf.getvalue(), "application/x-npy")
    assert e.value.code == 400
    assert "expected" in json.loads(e.value.read())["error"]


def test_unknown_path_404(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{server.port}/nope", timeout=30):
            pass
    assert e.value.code == 404
