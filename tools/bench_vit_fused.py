#!/usr/bin/env python
"""A/B the Pallas fused attention on the ViTPose variant (VERDICT r2 #4).

The fused kernel lost end-to-end on the GCN flagship (attention is a tiny
fraction there); the ViT-B encoder is 12 layers x 256+ tokens of
attention, where the kernel should actually pay.

  python tools/bench_vit_fused.py [--bs 128] [--iters 6]
"""

import argparse
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
    p = argparse.ArgumentParser()
    p.add_argument("--bs", type=int, default=128)
    p.add_argument("--iters", type=int, default=6)
    args = p.parse_args()

    from renderih_tpu.assets import make_synthetic_assets
    from renderih_tpu.config import Config, ModelConfig
    from renderih_tpu.models import init_model, model_call_kwargs
    from renderih_tpu.models.attention import set_fused_attention

    assets = make_synthetic_assets(seed=0)
    cfg = Config(model=ModelConfig(encoder="vit_base", decoder="graph"))
    model, variables = init_model(cfg, assets, jax.random.PRNGKey(0))
    kw = model_call_kwargs(cfg, assets)
    img = jax.random.normal(jax.random.PRNGKey(1),
                            (args.bs, 256, 256, 3))

    results = {}
    for fused in (False, True):
        set_fused_attention(fused)

        @jax.jit
        def fwd(v, x):
            out = model.apply(v, x, train=False, **kw)
            return out.verts3d["left"].sum(axis=(1, 2))

        jax.block_until_ready(fwd(variables, img))  # compile
        t0 = time.perf_counter()
        for _ in range(args.iters):
            o = fwd(variables, img)
        jax.block_until_ready(o)
        dt = (time.perf_counter() - t0) / args.iters
        results["fused" if fused else "xla"] = args.bs / dt
        print(f"{'fused' if fused else 'xla  '}: {dt * 1e3:8.2f} ms  "
              f"({args.bs / dt:.1f} img/s)", flush=True)
    set_fused_attention(False)
    print(f"speedup: {results['fused'] / results['xla']:.3f}x")


if __name__ == "__main__":
    main()
