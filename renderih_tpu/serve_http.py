"""HTTP front-end for the serving engine (std-lib only).

The reference's only serving surface is the in-process demo wrapper
(`core/test_utils.py:InterRender`, one image per call); it ships no
network serving at all. This module completes the deployment story on
top of `renderih_tpu.serve`: a threaded HTTP server whose concurrent
single-image requests are coalesced into padded device batches by
`BatchingServer`, so independent clients share TPU batch efficiency.

Endpoints:

  GET  /healthz   -> {"status": "ok", "buckets": [...], "encoder": "..."}
  POST /predict   -> hand-mesh outputs for one image or a batch.

    Content-Type: application/x-npy  — body is `np.save` bytes of a
      uint8 image (H, W, 3) or batch (N, H, W, 3); response is
      `np.savez` bytes (application/x-npz) of the output arrays.
    Content-Type: application/json   — {"image": nested uint8 list},
      response JSON with the same keys as lists (curl-friendly; the
      npy path is ~10x smaller on the wire).

Single images go through the dynamic batcher (cross-request batching);
explicit batches bypass it and hit `InferenceEngine.predict` directly
(the caller already batched).

  python -m renderih_tpu.serve_http --port 8000 [--ckpt DIR] [--warmup]
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from renderih_tpu.serve import BatchingServer, InferenceEngine

_MAX_BODY = 512 * 1024 * 1024


class HandPoseHTTPServer:
    """Threaded HTTP server over an InferenceEngine + BatchingServer."""

    def __init__(self, engine: InferenceEngine, host: str = "0.0.0.0",
                 port: int = 8000, max_wait_ms: float = 2.0):
        self.engine = engine
        self.batcher = BatchingServer(engine, max_wait_ms=max_wait_ms)
        outer = self

        class Handler(BaseHTTPRequestHandler):
            # quiet per-request stderr logging; errors still surface in
            # the response body
            def log_message(self, fmt, *args):
                pass

            def _send(self, code: int, body: bytes, ctype: str):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _send_json(self, code: int, obj):
                self._send(code, json.dumps(obj).encode(),
                           "application/json")

            def do_GET(self):
                if self.path == "/healthz":
                    self._send_json(200, {
                        "status": "ok",
                        "buckets": list(outer.engine.buckets),
                        "encoder": outer.engine.cfg.model.encoder,
                    })
                else:
                    self._send_json(404, {"error": "unknown path"})

            def do_POST(self):
                if self.path != "/predict":
                    self._send_json(404, {"error": "unknown path"})
                    return
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    if not 0 < n <= _MAX_BODY:
                        raise ValueError(f"bad Content-Length {n}")
                    body = self.rfile.read(n)
                    ctype = (self.headers.get("Content-Type") or
                             "application/x-npy").split(";")[0].strip()
                    if ctype == "application/json":
                        img = np.asarray(
                            json.loads(body)["image"], np.uint8)
                    else:
                        img = np.load(io.BytesIO(body), allow_pickle=False)
                    out = outer._run(img)
                except Exception as e:  # noqa: BLE001 — client error surface
                    self._send_json(400, {"error": f"{type(e).__name__}: {e}"})
                    return
                if ctype == "application/json":
                    self._send_json(
                        200, {k: v.tolist() for k, v in out.items()})
                else:
                    buf = io.BytesIO()
                    np.savez(buf, **out)
                    self._send(200, buf.getvalue(), "application/x-npz")

        self.httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self.httpd.server_address[1]  # resolved if port=0
        self._thread: threading.Thread | None = None

    def _run(self, img: np.ndarray) -> dict:
        s = self.engine.cfg.model.img_size
        if img.ndim == 3:  # single image -> cross-request dynamic batching
            if img.shape != (s, s, 3):
                raise ValueError(f"expected ({s},{s},3), got {img.shape}")
            return self.batcher.submit(img).result()
        if img.ndim == 4:  # caller-batched -> straight to the engine
            if img.shape[1:] != (s, s, 3):
                raise ValueError(f"expected (N,{s},{s},3), got {img.shape}")
            return self.engine.predict(img)
        raise ValueError(f"image must be 3-d or 4-d, got shape {img.shape}")

    def start(self) -> None:
        """Serve in a background thread (tests / embedding)."""
        self._thread = threading.Thread(
            target=self.httpd.serve_forever, daemon=True)
        self._thread.start()

    def serve_forever(self) -> None:
        self.httpd.serve_forever()

    def close(self) -> None:
        self.httpd.shutdown()
        self.httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=5.0)
        self.batcher.close()


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--cfg", default=None)
    p.add_argument("--ckpt", default=None)
    p.add_argument("--decoder_bf16", action="store_true",
                   help="+12%% throughput, NOT prediction-exact "
                        "(tools/validate_bf16_decoder.py)")
    p.add_argument("--warmup", action="store_true",
                   help="precompile every bucket before accepting traffic")
    args = p.parse_args(argv)

    from renderih_tpu.config import load_config

    engine = InferenceEngine(load_config(args.cfg), ckpt=args.ckpt,
                             decoder_bf16=args.decoder_bf16)
    if args.warmup:
        engine.warmup()
    server = HandPoseHTTPServer(engine, host=args.host, port=args.port)
    print(f"serving on {args.host}:{server.port} "
          f"(buckets {engine.buckets})", flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.close()


if __name__ == "__main__":
    main()
