#!/usr/bin/env python
"""Is the ResNet stem (7x7 s2 conv on 3 input channels) a TPU bottleneck?

3 input channels use 3/128 of the MXU's contraction lanes unless XLA's
small-channel path kicks in. Times, with chained inputs (tunnel-proof):
stem alone, stem+maxpool, the full encoder, and a 128-in-channel control
conv of identical output geometry (what the stem would cost at full lane
utilization).

  BENCH_BATCH=256 python tools/bench_stem.py
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


def timeit(fn, x, iters=20):
    y = fn(x)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = fn(x)
    jax.block_until_ready(x)
    r0 = time.perf_counter()
    jax.block_until_ready(x)
    rtt = time.perf_counter() - r0
    return (time.perf_counter() - t0 - rtt) / iters


def main():
    from renderih_tpu.assets import make_synthetic_assets
    from renderih_tpu.config import Config
    from renderih_tpu.models import init_model

    b = int(os.environ.get("BENCH_BATCH", "256"))
    key = jax.random.PRNGKey(0)

    def chain(f):
        # output feeds back into the input so iterations serialize
        @jax.jit
        def run(x):
            y = f(x)
            return x + jnp.mean(y).astype(x.dtype) * 1e-6
        return run

    # stem: 7x7 s2, 3 -> 64, bf16
    wk = jax.random.normal(key, (7, 7, 3, 64), jnp.bfloat16) * 0.01
    img = jax.random.normal(key, (b, 256, 256, 3), jnp.bfloat16)

    def stem(x):
        return jax.lax.conv_general_dilated(
            x, wk, (2, 2), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    t = timeit(chain(stem), img)
    print(f"bs={b} stem 7x7s2 3->64      : {t*1e3:7.2f} ms", flush=True)

    # control: same output geometry, 128 input channels (full lanes).
    # Run at bs/8 to fit HBM; scale the reported time back up.
    bc = max(b // 8, 1)
    wk128 = jax.random.normal(key, (7, 7, 128, 64), jnp.bfloat16) * 0.01
    img128 = jax.random.normal(key, (bc, 256, 256, 128), jnp.bfloat16)

    def conv128(x):
        return jax.lax.conv_general_dilated(
            x, wk128, (2, 2), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    t = timeit(chain(conv128), img128)
    print(f"bs={b} control 7x7s2 128->64 : {t*1e3*b/bc:7.2f} ms "
          f"(measured at bs={bc}, x{b//bc})", flush=True)

    # full encoder forward (inference mode)
    cfg = Config()
    assets = make_synthetic_assets(seed=0)
    model, variables = init_model(cfg, assets, jax.random.PRNGKey(0))
    imgf = jax.random.normal(key, (b, 256, 256, 3), jnp.float32)

    def encoder(x):
        gf, fmaps = model.apply(variables, x, train=False, method=model.encode)
        return gf

    t = timeit(chain(encoder), imgf, iters=10)
    print(f"bs={b} full encoder+mid      : {t*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
