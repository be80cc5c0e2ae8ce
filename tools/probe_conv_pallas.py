#!/usr/bin/env python
"""Pallas conv probe: test the "XLA conv ceiling" claim at the kernel level.

The flagship encoder's throughput rests on the claim (tools/bench_stem.py)
that XLA's convs run at ~25-30% MXU on v5e for these shapes and that this
is the practical ceiling. This probe A/Bs the implicit-GEMM Pallas kernel
(`renderih_tpu/kernels/conv_pallas.py`: nine shifted MXU dots over a
haloed VMEM tile, f32 accumulation, auto VMEM-fitted batch tiling) against
`lax.conv_general_dilated` on every stride-1 3x3 shape of the resnet50
trunk at bs256, in the trunk dtype (bf16) and f32.

Timing follows the CLAUDE.md microbench rule: iterations are CHAINED
(cin == cout and 'same' padding keep shapes fixed, so y_{i+1} = conv(y_i)),
the clock stops on a scalar fetch, and the fetch RTT is subtracted.

  python tools/probe_conv_pallas.py [--iters 30] [--batch 256]

Reference target being probed: the conv trunk of the reference encoder
(`common/myhand/encoder_lijun.py:62-104`, torchvision resnet50 layers 1-4).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..")))

import jax
import jax.numpy as jnp
import numpy as np

from renderih_tpu.kernels.conv_pallas import (
    _pallas_conv3x3,
    _pick_tile_b,
    _xla_conv3x3,
    conv3x3_eligible,
)
from renderih_tpu.utils.jax_cache import enable_compilation_cache

enable_compilation_cache()

# (H, W, C) of every stride-1 3x3 conv in resnet50 for a 256^2 input,
# with the per-forward instance count (layer1: 3 blocks, layer2: 3 of 4
# non-strided, layer3: 5 of 6, layer4: 2 of 3).
SHAPES = (
    ("layer1", 64, 64, 64, 3),
    ("layer2", 32, 32, 128, 3),
    ("layer3", 16, 16, 256, 5),
    ("layer4", 8, 8, 512, 2),
)


def timed_chain(fn, x, w, iters):
    """Chained timing: y feeds the next call; subtract the fetch RTT."""
    f = jax.jit(fn)
    y = f(x, w)
    float(jnp.sum(y[0, 0, 0, :8].astype(jnp.float32)))  # compile + sync
    y = x
    t0 = time.perf_counter()
    for _ in range(iters):
        y = f(y, w)
    float(jnp.sum(y[0, 0, 0, :8].astype(jnp.float32)))
    r0 = time.perf_counter()
    float(jnp.sum(y[0, 0, 0, :8].astype(jnp.float32)))
    rtt = time.perf_counter() - r0
    return (time.perf_counter() - t0 - rtt) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--batch", type=int, default=256)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    results = {}
    for name, h, w, c, count in SHAPES:
        B = args.batch
        flops = 2 * B * h * w * c * 9 * c
        x0 = rng.normal(size=(B, h, w, c)).astype(np.float32)
        # small weights so chained outputs stay finite in bf16
        w0 = (rng.normal(size=(3, 3, c, c)) * (1.0 / np.sqrt(9 * c))
              ).astype(np.float32)
        ref = np.asarray(_xla_conv3x3(jnp.asarray(x0), jnp.asarray(w0)))

        for dt, dname in ((jnp.bfloat16, "bf16"), (jnp.float32, "f32")):
            x = jnp.asarray(x0, dt)
            wgt = jnp.asarray(w0, dt)
            if not conv3x3_eligible(x, wgt, (1, 1), "SAME"):
                print(f"[{name} {dname}] ineligible (no VMEM-feasible "
                      f"tile) — skipped", flush=True)
                continue
            tile_b = _pick_tile_b(B, h, w, c, c, x.dtype.itemsize)

            got = np.asarray(_pallas_conv3x3(x, wgt)).astype(np.float32)
            err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
            tol = 3e-2 if dt == jnp.bfloat16 else 1e-5
            assert err < tol, f"pallas {name} {dname} mismatch: rel {err}"

            t_xla = timed_chain(_xla_conv3x3, x, wgt, args.iters)
            t_pl = timed_chain(_pallas_conv3x3, x, wgt, args.iters)
            key = f"{name}_{dname}"
            results[f"{key}_xla_ms"] = round(t_xla * 1e3, 3)
            results[f"{key}_xla_tflops"] = round(flops / t_xla / 1e12, 1)
            results[f"{key}_pallas_ms"] = round(t_pl * 1e3, 3)
            results[f"{key}_pallas_tflops"] = round(flops / t_pl / 1e12, 1)
            results[f"{key}_speedup"] = round(t_xla / t_pl, 3)
            results[f"{key}_count_per_fwd"] = count
            print(f"[{name} {dname} tile_b={tile_b}] "
                  f"xla {t_xla*1e3:7.3f} ms ({flops/t_xla/1e12:5.1f} TF/s)"
                  f" | pallas {t_pl*1e3:7.3f} ms "
                  f"({flops/t_pl/1e12:5.1f} TF/s) | speedup "
                  f"{t_xla/t_pl:.3f}x (max rel err {err:.2e})", flush=True)

    print(json.dumps(results))
    with open("/tmp/probe_conv_results.json", "w") as f:
        json.dump(results, f)


if __name__ == "__main__":
    main()
