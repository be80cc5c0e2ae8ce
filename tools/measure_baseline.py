#!/usr/bin/env python
"""Measure the reference PyTorch model's inference throughput on this host.

The reference repo publishes no benchmark numbers (BASELINE.md), and no
CUDA GPU exists in this container — so this measures the strongest
available proxy: the ACTUAL reference `HandNET_GCN` (resnet50 +
dual-graph decoder, `common/myhand/lijun_model_graph.py:18-70`) running
eval-mode forward on this host's CPU via the same stub harness as
tools/parity_vs_reference.py. The result is written to
BASELINE_MEASURED.json and consumed by bench.py's `vs_baseline`.

This is explicitly a *CPU proxy*, not the paper's multi-GPU setup; the
JSON records that caveat alongside the number.

  python tools/measure_baseline.py [--bs 64] [--iters 3]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def run_bench_phase(workdir: str, bs: int, iters: int, seed: int,
                    encoder: str, out_json: str) -> None:
    import numpy as np

    import parity_vs_reference as pvr

    import torch

    model, _ = pvr.build_reference_model(workdir, seed, encoder)
    torch.set_num_threads(os.cpu_count() or 1)

    rng = np.random.default_rng(seed)
    img = torch.from_numpy(
        rng.normal(0.0, 1.0, (bs, 3, 256, 256)).astype(np.float32))
    with torch.no_grad():
        model(img)  # warmup (allocations, lazy init)
        t0 = time.perf_counter()
        for _ in range(iters):
            model(img)
        dt = time.perf_counter() - t0

    ips = bs * iters / dt
    payload = {
        "torch_cpu_images_per_sec": round(ips, 2),
        "batch_size": bs,
        "iters": iters,
        "encoder": encoder,
        "torch_version": torch.__version__,
        "num_threads": torch.get_num_threads(),
        "note": ("reference HandNET_GCN eval-mode forward, CPU proxy "
                 "(no CUDA GPU in this container; reference publishes "
                 "no GPU numbers)"),
    }
    with open(out_json, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="/tmp/parity_vs_reference")
    p.add_argument("--bs", type=int, default=64)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--encoder", default="resnet50")
    p.add_argument("--out", default=os.path.join(REPO, "BASELINE_MEASURED.json"))
    p.add_argument("--phase", choices=["all", "bench"], default="all")
    args = p.parse_args(argv)

    if args.phase == "bench":
        run_bench_phase(args.workdir, args.bs, args.iters, args.seed,
                        args.encoder, args.out)
        return 0

    import parity_vs_reference as pvr

    if not os.path.exists(os.path.join(args.workdir, "MANO_RIGHT.pkl")):
        pvr.write_mano_pkls(args.workdir, args.seed)
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--phase", "bench",
         "--workdir", args.workdir, "--bs", str(args.bs),
         "--iters", str(args.iters), "--seed", str(args.seed),
         "--encoder", args.encoder, "--out", args.out],
        cwd=REPO,
    )
    return proc.returncode


if __name__ == "__main__":
    sys.exit(main())
