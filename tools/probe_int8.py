#!/usr/bin/env python
"""Probe: does XLA map int8 matmuls/convs to the v5e MXU at ~2x bf16?

v5e peaks at 197 bf16 TFLOP/s vs 394 int8 TOP/s; if XLA routes
int8 x int8 -> int32 dot/conv through the doubled-rate MXU path, a
post-training-quantized serving mode for the (bf16-tolerant) encoder is
worth building. If it doesn't (emulated via upcast), drop the idea.

Method (CLAUDE.md microbench gotcha): chain iterations INSIDE one jit
via lax.fori_loop (each iteration's input derives from the previous
output), return a scalar, subtract one tunnel RTT.

  python tools/probe_int8.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..")))

import jax
import jax.numpy as jnp
import numpy as np
from functools import partial

from renderih_tpu.utils.jax_cache import enable_compilation_cache

enable_compilation_cache()

ITERS = 30


def _time_scalar(fn, *args):
    """Time one jitted call that returns a scalar; subtract fetch RTT."""
    out = fn(*args)
    float(out)  # compile + sync
    t0 = time.perf_counter()
    out = fn(*args)
    float(out)
    dt = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(out)
    rtt = time.perf_counter() - t0
    return (dt - rtt) / ITERS


@partial(jax.jit, static_argnums=(1,))
def mm_bf16(x, n):
    w = jnp.ones((n, n), jnp.bfloat16)

    def body(_, acc):
        y = jax.lax.dot(acc, w, preferred_element_type=jnp.float32)
        return (y * (1.0 / n)).astype(jnp.bfloat16)

    y = jax.lax.fori_loop(0, ITERS, body, x)
    return y.astype(jnp.float32).sum()


@partial(jax.jit, static_argnums=(1,))
def mm_int8(x, n):
    w = jnp.ones((n, n), jnp.int8)

    def body(_, acc):
        y = jax.lax.dot(acc, w, preferred_element_type=jnp.int32)
        return (y & 3).astype(jnp.int8)  # cheap requantize, keeps chain

    y = jax.lax.fori_loop(0, ITERS, body, x)
    return y.astype(jnp.float32).sum()


def conv_chain(dtype, acc_dtype, b, h, c, k=3):
    @jax.jit
    def run(x):
        w = jnp.ones((k, k, c, c), dtype)

        def body(_, acc):
            y = jax.lax.conv_general_dilated(
                acc, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=acc_dtype)
            if dtype == jnp.int8:
                return (y & 3).astype(jnp.int8)
            return (y * 1e-3).astype(dtype)

        y = jax.lax.fori_loop(0, ITERS, body, x)
        return y.astype(jnp.float32).sum()

    return run


def im2col_conv_chain(b, h, c, k=3):
    """3x3 SAME conv expressed as patches + one big GEMM.

    If XLA's native conv sits at 25-30% MXU on these shapes, an explicit
    (B*H*W, k*k*C) x (k*k*C, C) GEMM may tile better (9x activation
    blowup is fine at these sizes).
    """
    @jax.jit
    def run(x):
        w = jnp.ones((k * k * c, c), jnp.bfloat16)

        def body(_, acc):
            p = jax.lax.conv_general_dilated_patches(
                acc, (k, k), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = jax.lax.dot(p.reshape(-1, k * k * c), w,
                            preferred_element_type=jnp.float32)
            return (y.reshape(b, h, h, c) * 1e-3).astype(jnp.bfloat16)

        y = jax.lax.fori_loop(0, ITERS, body, x)
        return y.astype(jnp.float32).sum()

    return run


def rect_mm_chain(dtype, acc_dtype, m, k, n):
    """Chained rectangular GEMM (ViT dense shapes). Output is sliced back
    to (m, k) through a cheap cast so the chain stays live."""
    @jax.jit
    def run(x):
        w = jnp.ones((k, n), dtype)

        def body(_, acc):
            y = jax.lax.dot(acc, w, preferred_element_type=acc_dtype)
            if n < k:  # fc2: pad back up to (m, k) to keep the chain
                y = jnp.pad(y, ((0, 0), (0, k - n)))
            if dtype == jnp.int8:
                return (y[:, :k] & 3).astype(jnp.int8)
            return (y[:, :k] * 1e-3).astype(dtype)

        y = jax.lax.fori_loop(0, ITERS, body, x)
        return y.astype(jnp.float32).sum()

    return run


def main():
    print(f"device: {jax.devices()[0].device_kind}", flush=True)

    if os.environ.get("PROBE_VIT"):
        # ViT-B bs128 dense shapes: M = 128 * 257 tokens
        m = 128 * 257
        for (k, n, tag) in ((768, 2304, "qkv"), (768, 768, "proj"),
                            (768, 3072, "fc1"), (3072, 768, "fc2")):
            xb = jnp.ones((m, k), jnp.bfloat16)
            x8 = jnp.ones((m, k), jnp.int8)
            tb = _time_scalar(rect_mm_chain(jnp.bfloat16, jnp.float32,
                                            m, k, n), xb)
            ti = _time_scalar(rect_mm_chain(jnp.int8, jnp.int32,
                                            m, k, n), x8)
            fl = 2 * m * k * n
            print(f"vit {tag} ({m}x{k})x({k}x{n}): "
                  f"bf16 {tb*1e3:7.3f} ms ({fl/tb/1e12:6.1f} TF/s)  "
                  f"int8 {ti*1e3:7.3f} ms ({fl/ti/1e12:6.1f} TOP/s)  "
                  f"speedup {tb/ti:.2f}x", flush=True)
        return

    for n in (4096, 8192):
        x8 = jnp.ones((n, n), jnp.int8)
        xb = jnp.ones((n, n), jnp.bfloat16)
        tb = _time_scalar(mm_bf16, xb, n)
        ti = _time_scalar(mm_int8, x8, n)
        fl = 2 * n**3
        print(f"matmul {n}x{n}: bf16 {tb*1e3:7.3f} ms ({fl/tb/1e12:6.1f} TF/s)"
              f"  int8 {ti*1e3:7.3f} ms ({fl/ti/1e12:6.1f} TOP/s)"
              f"  speedup {tb/ti:.2f}x", flush=True)

    # resnet50 mid-stage conv shapes at serving batch
    for (b, h, c) in ((256, 28, 128), (256, 14, 256), (64, 56, 64)):
        xb = jnp.ones((b, h, h, c), jnp.bfloat16)
        x8 = jnp.ones((b, h, h, c), jnp.int8)
        fb = conv_chain(jnp.bfloat16, jnp.float32, b, h, c)
        fi = conv_chain(jnp.int8, jnp.int32, b, h, c)
        tb = _time_scalar(fb, xb)
        try:
            ti = _time_scalar(fi, x8)
        except Exception as e:  # int8 conv may be unsupported on backend
            print(f"conv b{b} {h}x{h}x{c}: int8 FAILED: {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)
            continue
        fl = 2 * b * h * h * c * c * 9
        print(f"conv b{b} {h}x{h}x{c}x3x3: bf16 {tb*1e3:7.3f} ms "
              f"({fl/tb/1e12:6.1f} TF/s)  int8 {ti*1e3:7.3f} ms "
              f"({fl/ti/1e12:6.1f} TOP/s)  speedup {tb/ti:.2f}x", flush=True)
        tg = _time_scalar(im2col_conv_chain(b, h, c), xb)
        print(f"  im2col-GEMM bf16: {tg*1e3:7.3f} ms ({fl/tg/1e12:6.1f} TF/s)"
              f"  vs native {tb/tg:.2f}x", flush=True)


if __name__ == "__main__":
    main()
