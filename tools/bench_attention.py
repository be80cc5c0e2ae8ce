#!/usr/bin/env python
"""A/B benchmark: XLA attention vs the Pallas fused kernel on TPU.

Shapes mirror the decoder's real token streams (verts+grid tokens per
stage). Prints per-shape timings and the speedup.

  python tools/bench_attention.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/root/.jax_cache"))

from renderih_tpu.kernels.fused_attention import fused_mha


def xla_mha(q, k, v):
    b, n, h, d = q.shape
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, q.dtype))
    logits = jnp.einsum("bnhd,bmhd->bhnm", q, k) * scale
    attn = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhnm,bmhd->bnhd", attn, v)
    return out.reshape(b, n, h * d)


def bench(fn, *args, iters=50):
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    # decoder stages: (tokens, heads, head_dim) at batch 256
    shapes = [
        (256, 63 + 64, 4, 64),    # stage 1 img_attn stream (verts+grid)
        (256, 126 + 64, 4, 32),   # stage 2
        (256, 252 + 64, 4, 16),   # stage 3
        (256, 252, 4, 16),        # inter-hand attention
    ]
    xla_jit = jax.jit(xla_mha)
    fused_jit = jax.jit(lambda q, k, v: fused_mha(q, k, v))
    for b, n, h, d in shapes:
        q = jax.random.normal(jax.random.PRNGKey(0), (b, n, h, d))
        k = jax.random.normal(jax.random.PRNGKey(1), (b, n, h, d))
        v = jax.random.normal(jax.random.PRNGKey(2), (b, n, h, d))
        t_xla = bench(xla_jit, q, k, v)
        t_fused = bench(fused_jit, q, k, v)
        print(f"B{b} N{n} H{h} D{d}: xla {t_xla:.3f} ms  "
              f"pallas {t_fused:.3f} ms  speedup {t_xla / t_fused:.2f}x")


if __name__ == "__main__":
    main()
