#!/usr/bin/env python
"""Profile the flagship forward: encoder-vs-decoder split + batch scan.

Run from the repo root on the TPU:  python tools/bench_profile.py
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


def timeit(fn, *args, iters=10):
    jax.block_until_ready(fn(*args))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    from renderih_tpu.assets import make_synthetic_assets
    from renderih_tpu.config import Config
    from renderih_tpu.models import init_model, model_call_kwargs

    cfg = Config()
    assets = make_synthetic_assets(seed=0)
    model, variables = init_model(cfg, assets, jax.random.PRNGKey(0))
    kw = model_call_kwargs(cfg, assets)

    batches = [int(b) for b in
               os.environ.get("PROF_BATCHES", "128,256,384,512").split(",")]

    @jax.jit
    def full(v, img):
        out = model.apply(v, img, train=False, **kw)
        return out.verts3d["left"]

    @jax.jit
    def enc_only(v, img):
        gf, fmaps = model.apply(v, img, train=False, method=model.encode)
        return gf

    for b in batches:
        img = jax.random.normal(jax.random.PRNGKey(1), (b, 256, 256, 3),
                                jnp.float32)
        t_full = timeit(full, variables, img)
        t_enc = timeit(enc_only, variables, img)
        print(f"bs={b:4d} full={t_full*1e3:7.2f}ms enc={t_enc*1e3:7.2f}ms "
              f"dec~={(t_full-t_enc)*1e3:7.2f}ms "
              f"ips={b/t_full:8.1f}", flush=True)


if __name__ == "__main__":
    main()
