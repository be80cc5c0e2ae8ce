"""Serving engine: bucketed-batch two-hand inference + dynamic batching.

The reference's only serving surface is the demo wrapper
(`core/test_utils.py:InterRender`) — one image at a time, no batching.
This module is the production counterpart for TPU serving:

  * `InferenceEngine` — jits the flagship forward once per batch bucket
    (static shapes; XLA compiles each bucket exactly once), pads requests
    up to the smallest covering bucket, and returns mesh-vertex outputs
    as numpy. Options: checkpoint loading, bf16 decoder trunk (the +12%
    serving knob), data-parallel sharding over a mesh.
  * `BatchingServer` — a thread-safe dynamic batcher on top: concurrent
    `submit()` calls are coalesced for up to `max_wait_ms` and executed
    as one padded device batch; callers get futures.

Typical use:

    engine = InferenceEngine(cfg, ckpt="checkpoints/final")
    out = engine.predict(images_u8)          # (N,256,256,3) -> dict

    server = BatchingServer(engine)
    fut = server.submit(one_image_u8)        # from any thread
    verts = fut.result()["verts3d_left"]     # (778, 3)
"""

from __future__ import annotations

import copy
import queue
import threading
from concurrent.futures import Future

import jax
import jax.numpy as jnp
import numpy as np

from renderih_tpu.assets import Assets, load_assets
from renderih_tpu.config import Config
from renderih_tpu.models import init_model, model_call_kwargs
from renderih_tpu.ops.image import normalize_imagenet

DEFAULT_BUCKETS = (1, 8, 32, 128)


class InferenceEngine:
    """Bucketed-batch jitted inference over the flagship model."""

    def __init__(
        self,
        cfg: Config | None = None,
        assets: Assets | None = None,
        variables: dict | None = None,
        ckpt: str | None = None,
        buckets: tuple = DEFAULT_BUCKETS,
        decoder_bf16: bool = False,
        mesh=None,
    ):
        # own copy: never mutate a caller's Config (it may be shared with a
        # concurrent train/eval in the same process)
        self.cfg = copy.deepcopy(cfg) if cfg is not None else Config()
        if decoder_bf16:
            # serving-throughput knob (+12%); moves trained predictions
            # ~7-9 mm/vertex — see tools/validate_bf16_decoder.py
            self.cfg.model.decoder_f32 = False
        self.assets = assets if assets is not None else load_assets(self.cfg.assets)
        self.buckets = tuple(sorted(buckets))
        if mesh is not None:
            # jit in_shardings=P('data') requires batch % n_data == 0:
            # round every bucket up to a multiple of the data axis.
            n_data = mesh.shape["data"]
            self.buckets = tuple(sorted(
                {-(-b // n_data) * n_data for b in self.buckets}))
        self.mesh = mesh

        model, init_vars = init_model(self.cfg, self.assets,
                                      jax.random.PRNGKey(0))
        self.model = model
        if variables is not None:
            self.variables = variables
        elif ckpt:
            from renderih_tpu.train.state import (
                create_train_state,
                restore_checkpoint,
            )

            state = restore_checkpoint(
                ckpt, create_train_state(self.cfg, init_vars, 1))
            self.variables = {"params": state.params,
                              "batch_stats": state.batch_stats}
        else:
            self.variables = init_vars

        call_kwargs = model_call_kwargs(self.cfg, self.assets)

        def forward(variables, img_u8):
            img = normalize_imagenet(img_u8.astype(jnp.float32) / 255.0)
            out = self.model.apply(variables, img, train=False, **call_kwargs)
            return {
                "verts3d_left": out.verts3d["left"],
                "verts3d_right": out.verts3d["right"],
                "verts2d_left": out.verts2d["left"],
                "verts2d_right": out.verts2d["right"],
                "scale_left": out.scale["left"],
                "scale_right": out.scale["right"],
                "trans2d_left": out.trans2d["left"],
                "trans2d_right": out.trans2d["right"],
            }

        if mesh is not None:
            from renderih_tpu.parallel.mesh import (
                batch_sharding,
                replicated_sharding,
            )

            self.variables = jax.device_put(
                self.variables, replicated_sharding(mesh))
            self._forward = jax.jit(
                forward, in_shardings=(None, batch_sharding(mesh)))
            n_data = mesh.shape["data"]
            assert all(b % n_data == 0 for b in self.buckets), (
                f"buckets {self.buckets} vs data axis {n_data}")
        else:
            self._forward = jax.jit(forward)

    def warmup(self) -> None:
        """Precompile every bucket (first request latency -> steady-state)."""
        for b in self.buckets:
            img = np.zeros((b, self.cfg.model.img_size,
                            self.cfg.model.img_size, 3), np.uint8)
            jax.block_until_ready(self._forward(self.variables, img))

    def _bucket(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        return self.buckets[-1]

    def predict(self, images_u8: np.ndarray) -> dict:
        """images_u8: (N, H, W, 3) uint8 -> dict of numpy outputs, length N.

        Each remaining chunk goes to the smallest bucket that covers it
        (the largest bucket if none does), padded up to the bucket size;
        every bucket shape compiles exactly once.

        Multi-chunk requests are software-pipelined (depth 1): chunk i+1
        is dispatched — jit's async arg upload + compute — before chunk
        i's result is fetched, so host<->device transfer overlaps device
        compute. On hosts with a slow device link the transfers dominate
        (measured on the axon tunnel: a bs-128 uint8 upload is ~25 MB
        against ~39 MB/s), which made the serial loop ~40x slower than
        the engine's compute; the same fix as the evaluator's streaming
        path (`eval/evaluator.py`).
        """
        n = len(images_u8)

        def dispatch(start: int):
            remaining = n - start
            b = self._bucket(remaining)
            take = min(remaining, b)
            chunk = images_u8[start : start + take]
            if take < b:
                pad = np.repeat(chunk[-1:], b - take, axis=0)
                chunk = np.concatenate([chunk, pad], axis=0)
            return self._forward(self.variables, chunk), take

        outs: list[dict] = []
        pending, take = dispatch(0)
        start = take
        while pending is not None:
            nxt = dispatch(start) if start < n else None
            res = jax.device_get(pending)  # blocks; next chunk in flight
            outs.append({k: np.asarray(v)[:take] for k, v in res.items()})
            if nxt is None:
                break
            pending, take = nxt
            start += take
        return {k: np.concatenate([o[k] for o in outs]) for k in outs[0]}


class BatchingServer:
    """Dynamic batcher: coalesces concurrent single-image requests."""

    def __init__(self, engine: InferenceEngine, max_batch: int | None = None,
                 max_wait_ms: float = 2.0):
        self.engine = engine
        self.max_batch = max_batch or engine.buckets[-1]
        self.max_wait_s = max_wait_ms / 1e3
        self._q: queue.Queue = queue.Queue()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def submit(self, image_u8: np.ndarray) -> Future:
        """image_u8: (H, W, 3) uint8. Resolves to per-image output dict."""
        if self._stop.is_set():
            raise RuntimeError("server closed")
        fut: Future = Future()
        self._q.put((image_u8, fut))
        return fut

    def close(self) -> None:
        self._stop.set()
        self._thread.join(timeout=5.0)
        # drain: fail any request the worker never picked up so callers
        # blocked on fut.result() don't hang forever
        while True:
            try:
                _, fut = self._q.get_nowait()
            except queue.Empty:
                break
            if not fut.done():
                fut.set_exception(RuntimeError("server closed"))

    def _loop(self) -> None:
        while not self._stop.is_set():
            try:
                first = self._q.get(timeout=0.05)
            except queue.Empty:
                continue
            batch = [first]
            deadline = self.max_wait_s
            import time as _time

            t0 = _time.perf_counter()
            while len(batch) < self.max_batch:
                left = deadline - (_time.perf_counter() - t0)
                if left <= 0:
                    break
                try:
                    batch.append(self._q.get(timeout=left))
                except queue.Empty:
                    break
            imgs = np.stack([b[0] for b in batch])
            try:
                out = self.engine.predict(imgs)
                for i, (_, fut) in enumerate(batch):
                    fut.set_result({k: v[i] for k, v in out.items()})
            except Exception as e:  # propagate to all waiters
                for _, fut in batch:
                    if not fut.done():
                        fut.set_exception(e)
