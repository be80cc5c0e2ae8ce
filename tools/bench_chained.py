#!/usr/bin/env python
"""Full-model throughput with chained-dependency timing (tunnel-proof).

Each iteration's input depends on the previous output, and the clock
stops on a scalar fetch (minus measured fetch RTT), so neither laziness
nor memoization in the remote-execution path can fake the number.

  BENCH_BATCH=256 python tools/bench_chained.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..")))

import jax
import jax.numpy as jnp

from renderih_tpu.utils.jax_cache import enable_compilation_cache

enable_compilation_cache()


def main():
    from renderih_tpu.assets import make_synthetic_assets
    from renderih_tpu.config import Config
    from renderih_tpu.models import init_model, model_call_kwargs

    cfg = Config()
    if os.environ.get("BENCH_DECODER_BF16"):
        cfg.model.decoder_f32 = False
    assets = make_synthetic_assets(seed=0)
    model, variables = init_model(cfg, assets, jax.random.PRNGKey(0))
    kw = model_call_kwargs(cfg, assets)

    b = int(os.environ.get("BENCH_BATCH", "256"))
    img0 = jax.random.normal(jax.random.PRNGKey(1), (b, 256, 256, 3),
                             jnp.float32)

    @jax.jit
    def step(img):
        out = model.apply(variables, img, train=False, **kw)
        feedback = jnp.mean(out.verts3d["left"]) * 1e-6
        return img + feedback.astype(img.dtype)

    img = step(img0)
    float(jnp.sum(img[0, 0, 0]))  # compile + sync

    iters = int(os.environ.get("BENCH_ITERS", "10"))
    t0 = time.perf_counter()
    img = img0
    for _ in range(iters):
        img = step(img)
    float(jnp.sum(img[0, 0, 0]))
    r0 = time.perf_counter()
    float(jnp.sum(img[0, 0, 0]))
    rtt = time.perf_counter() - r0
    dt = time.perf_counter() - t0 - rtt
    print(f"bs={b} iters={iters}: {dt/iters*1e3:.2f} ms/iter, "
          f"ips={b*iters/dt:.1f} (fetch rtt {rtt*1e3:.1f} ms)", flush=True)


if __name__ == "__main__":
    main()
