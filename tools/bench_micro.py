#!/usr/bin/env python
"""Micro-benchmarks with tunnel-proof (chained-dependency) timing.

Findings on v5e through the axon tunnel (2026-08-16, bs 256):

* `jax.block_until_ready` does NOT reliably wait for device completion
  on the remote backend for small programs — an 8192^3 matmul "timed"
  at 0.02 ms/iter with queue-only timing. Microbenchmarks MUST chain
  each iteration's input on the previous output and stop the clock on a
  scalar fetch (minus measured fetch RTT ~29 ms). Full-model timings at
  real batch sizes agree between both methods (5.1-5.3k img/s), so the
  headline bench.py number is valid.
* Calibration: chained 8192^3 bf16 matmul = 117 TFLOP/s (~60% of peak).
* ResNet stem 7x7/s2 on 3 channels: ~26 TFLOP/s (lane-padding bound),
  ~3.2 ms at bs 256 (~6% of the e2e forward).
* MLPerf-style space-to-depth stem rewrite is numerically exact
  (max|delta| 1.4e-6) but 0.80x — SLOWER: the (B,256,256,3)->
  (B,128,128,12) transpose costs more than the MXU win. Not adopted.

  BENCH_BATCH=256 python tools/bench_micro.py
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


def chain_time(step, x0, iters=20, label=""):
    """Chained-dependency timing; returns ms/iter."""
    x = step(x0)
    float(jnp.sum(x[(0,) * (x.ndim - 1)].astype(jnp.float32)))
    t0 = time.perf_counter()
    x = x0
    for _ in range(iters):
        x = step(x)
    float(jnp.sum(x[(0,) * (x.ndim - 1)].astype(jnp.float32)))
    r0 = time.perf_counter()
    float(jnp.sum(x[(0,) * (x.ndim - 1)].astype(jnp.float32)))
    rtt = time.perf_counter() - r0
    dt = (time.perf_counter() - t0 - rtt) / iters * 1e3
    print(f"{label}: {dt:7.3f} ms/iter (fetch rtt {rtt*1e3:.1f} ms)",
          flush=True)
    return dt


def s2d_weights(w7):
    """Exact (7,7,C,O) stride-2 -> (4,4,4C,O) stride-1 kernel transform.

    Row index algebra: input row 2y+dy-3 = 2R+pr with tap P = (dy+1)//2,
    parity pr = (dy+1)%2 (P=0,pr=0 never written); same for columns.
    """
    c = w7.shape[2]
    w4 = jnp.zeros((4, 4, 4 * c, w7.shape[-1]), w7.dtype)
    for dy in range(7):
        p, pr = (dy + 1) // 2, (dy + 1) % 2
        for dx in range(7):
            q, pc = (dx + 1) // 2, (dx + 1) % 2
            ch = (pr * 2 + pc) * c
            w4 = w4.at[p, q, ch : ch + c].set(w7[dy, dx])
    return w4


def s2d_input(x):
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def main():
    key = jax.random.PRNGKey(0)
    b = int(os.environ.get("BENCH_BATCH", "256"))

    a = jax.random.normal(key, (8192, 8192), jnp.bfloat16)

    @jax.jit
    def mm_step(x):
        y = jnp.dot(x, x)
        return (y / (jnp.max(jnp.abs(y)) + 1.0)).astype(jnp.bfloat16)

    dt = chain_time(mm_step, a, iters=10, label="matmul 8192^3")
    print(f"  -> {2 * 8192**3 / dt / 1e9:.1f} TFLOP/s", flush=True)

    img = jax.random.normal(key, (b, 256, 256, 3), jnp.bfloat16)
    w7 = (jax.random.normal(key, (7, 7, 3, 64)) * 0.1).astype(jnp.bfloat16)
    w4 = s2d_weights(w7)

    @jax.jit
    def stem(x):
        out = jax.lax.conv_general_dilated(
            x, w7, (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return x + (jnp.mean(out) * 1e-6).astype(x.dtype)

    @jax.jit
    def stem_s2d(x):
        out = jax.lax.conv_general_dilated(
            s2d_input(x), w4, (1, 1), [(2, 1), (2, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return x + (jnp.mean(out) * 1e-6).astype(x.dtype)

    t1 = chain_time(stem, img, label=f"stem 7x7/s2 bs{b}")
    t2 = chain_time(stem_s2d, img, label=f"stem s2d 4x4 bs{b}")
    print(f"s2d speedup {t1/t2:.2f}x (adopt only if > 1)", flush=True)


if __name__ == "__main__":
    main()
