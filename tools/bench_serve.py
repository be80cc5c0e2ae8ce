#!/usr/bin/env python
"""Serving benchmark: engine throughput + dynamic-batcher latency tails.

Measures the production serving surface (renderih_tpu/serve.py) on one
chip:

  1. engine.predict throughput at each bucket size (steady-state);
  2. request latency p50/p95/p99 through BatchingServer under K
     concurrent closed-loop clients (each thread submits one image,
     waits for the result, repeats) — the number that matters for a
     latency SLO, including padding + coalescing + tunnel overhead.

  python tools/bench_serve.py [--clients 1 8 32] [--seconds 5]
"""

import argparse
import os
import sys
import threading
import time

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..")))

import numpy as np

from renderih_tpu.utils.jax_cache import enable_compilation_cache

enable_compilation_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clients", type=int, nargs="+", default=[1, 8, 32])
    ap.add_argument("--seconds", type=float, default=5.0)
    ap.add_argument("--buckets", type=int, nargs="+", default=[1, 8, 32, 128])
    args = ap.parse_args()

    from renderih_tpu.assets import make_synthetic_assets
    from renderih_tpu.config import Config
    from renderih_tpu.serve import BatchingServer, InferenceEngine

    assets = make_synthetic_assets(seed=0)
    engine = InferenceEngine(Config(), assets=assets,
                             buckets=tuple(args.buckets))
    print("warmup (compiling every bucket)...", flush=True)
    engine.warmup()

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (max(args.buckets), 256, 256, 3),
                        dtype=np.uint8)

    # 1. bucket throughput, steady state
    for b in args.buckets:
        batch = imgs[:b]
        engine.predict(batch)  # warm
        iters = max(3, int(512 / b))
        t0 = time.perf_counter()
        for _ in range(iters):
            engine.predict(batch)
        dt = time.perf_counter() - t0
        print(f"predict bucket {b:4d}: {dt/iters*1e3:7.2f} ms/call  "
              f"{b*iters/dt:8.1f} img/s", flush=True)

    # 2. closed-loop latency through the dynamic batcher
    for k in args.clients:
        server = BatchingServer(engine, max_wait_ms=2.0)
        lat: list = []
        lock = threading.Lock()
        stop = time.perf_counter() + args.seconds

        def client(i):
            img = imgs[i % len(imgs)]
            while time.perf_counter() < stop:
                t0 = time.perf_counter()
                server.submit(img).result()
                dt = time.perf_counter() - t0
                with lock:
                    lat.append(dt)

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(k)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        server.close()
        a = np.sort(np.array(lat)) * 1e3
        if len(a) == 0:
            print(f"clients {k:3d}: no completions", flush=True)
            continue
        q = lambda p: a[min(len(a) - 1, int(p * len(a)))]
        print(f"clients {k:3d}: {len(a)/args.seconds:8.1f} req/s   "
              f"p50 {q(0.50):7.2f} ms  p95 {q(0.95):7.2f} ms  "
              f"p99 {q(0.99):7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
