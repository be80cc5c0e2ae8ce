#!/usr/bin/env python
"""Pallas conv probe: test the "XLA conv ceiling" claim at the kernel level.

The flagship encoder's throughput rests on the claim (tools/bench_stem.py)
that XLA's convs run at ~25-30% MXU on v5e for these shapes and that this
is the practical ceiling. This probe attacks the single most time-weighted
resnet50 conv shape at bs256 — 3x3 s1 256->256 @ 16^2, 77 GFLOP per
instance, 5 instances = 0.39 TF of the 2.73 TF forward — with a custom
implicit-GEMM Pallas kernel (9 shifted MXU dots over a haloed input tile,
f32 accumulation), and A/Bs it against `lax.conv_general_dilated` on the
same tensors, both in the trunk dtype (bf16) and f32.

Timing follows the CLAUDE.md microbench rule: iterations are CHAINED
(cin == cout and 'same' padding keep shapes fixed, so y_{i+1} = conv(y_i)),
the clock stops on a scalar fetch, and the fetch RTT is subtracted.

  python tools/probe_conv_pallas.py [--tile_b 8] [--iters 30]

Reference target being probed: the conv trunk of the reference encoder
(`common/myhand/encoder_lijun.py:62-104`, torchvision resnet50 layer3).
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..")))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from renderih_tpu.utils.jax_cache import enable_compilation_cache

enable_compilation_cache()

B, H, W, C = 256, 16, 16, 256  # the target shape (bs256, layer3 3x3)
FLOPS = 2 * B * H * W * C * 9 * C


def conv_kernel(x_ref, w_ref, o_ref, acc_ref, *, tile_b):
    """One image-tile of implicit-GEMM 3x3 conv.

    x_ref: (tile_b, H+2, W+2, C) haloed input, VMEM
    w_ref: (3, 3, C, C) weights, VMEM
    o_ref: (tile_b, H, W, C) output
    acc_ref: f32 scratch accumulator
    Nine shifted windows, each contracted on the channel dim — nine
    (tile_b*H*W, C) x (C, C) MXU passes accumulated in f32.
    """
    acc_ref[:] = jnp.zeros_like(acc_ref)
    for dy in range(3):
        for dx in range(3):
            win = x_ref[:, dy:dy + H, dx:dx + W, :]
            acc_ref[:] += jax.lax.dot_general(
                win, w_ref[dy, dx],
                dimension_numbers=(((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def pallas_conv3x3(x, w, tile_b):
    """x: (B, H, W, C); w: (3, 3, C, C). 'same' padding, stride 1."""
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return pl.pallas_call(
        functools.partial(conv_kernel, tile_b=tile_b),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
        grid=(B // tile_b,),
        in_specs=[
            pl.BlockSpec((tile_b, H + 2, W + 2, C),
                         lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, C, C), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_b, H, W, C), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((tile_b, H, W, C), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=FLOPS, bytes_accessed=x.size * x.dtype.itemsize * 2,
            transcendentals=0),
    )(xp, w)


def xla_conv3x3(x, w):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def timed_chain(fn, x, w, iters):
    """Chained timing: y feeds the next call; subtract the fetch RTT."""
    f = jax.jit(fn)
    y = f(x, w)
    float(jnp.sum(y[0, 0, 0, :8]))  # compile + sync
    y = x
    t0 = time.perf_counter()
    for _ in range(iters):
        y = f(y, w)
    float(jnp.sum(y[0, 0, 0, :8]))
    r0 = time.perf_counter()
    float(jnp.sum(y[0, 0, 0, :8]))
    rtt = time.perf_counter() - r0
    return (time.perf_counter() - t0 - rtt) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tile_b", type=int, default=8)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    # small weights so chained outputs stay finite in bf16
    x0 = rng.normal(size=(B, H, W, C)).astype(np.float32)
    w0 = (rng.normal(size=(3, 3, C, C)) * (1.0 / np.sqrt(9 * C))
          ).astype(np.float32)

    results = {}
    for dt, name in ((jnp.bfloat16, "bf16"), (jnp.float32, "f32")):
        x = jnp.asarray(x0, dt)
        w = jnp.asarray(w0, dt)

        # correctness first (vs XLA f32 oracle)
        ref = np.asarray(xla_conv3x3(jnp.asarray(x0), jnp.asarray(w0)))
        got = np.asarray(
            pallas_conv3x3(x, w, args.tile_b)).astype(np.float32)
        err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
        tol = 3e-2 if dt == jnp.bfloat16 else 1e-5
        assert err < tol, f"pallas {name} mismatch: rel {err}"

        t_xla = timed_chain(xla_conv3x3, x, w, args.iters)
        t_pl = timed_chain(
            lambda a, b: pallas_conv3x3(a, b, args.tile_b), x, w, args.iters)
        for tag, t in (("xla", t_xla), ("pallas", t_pl)):
            results[f"{name}_{tag}_ms"] = round(t * 1e3, 3)
            results[f"{name}_{tag}_tflops"] = round(FLOPS / t / 1e12, 1)
        results[f"{name}_speedup_pallas_vs_xla"] = round(t_xla / t_pl, 3)
        print(f"[{name}] xla {t_xla*1e3:7.3f} ms ({FLOPS/t_xla/1e12:5.1f} "
              f"TF/s) | pallas {t_pl*1e3:7.3f} ms ({FLOPS/t_pl/1e12:5.1f} "
              f"TF/s) | pallas/xla speedup {t_xla/t_pl:.3f}x "
              f"(max rel err {err:.2e})", flush=True)

    import json
    print(json.dumps(results))


if __name__ == "__main__":
    main()
