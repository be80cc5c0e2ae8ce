#!/usr/bin/env python
"""Summarize a training run's metrics.jsonl into a receipt table.

Prints train-loss and eval-metric trajectories (one row per eval point,
loss sampled at the nearest logged step) — the convergence receipt the
reference's in-train eval provides via TensorBoard
(`core/lijun_trainer.py:357-569`).

  python tools/summarize_run.py runs/convergence_r4/metrics.jsonl [--markdown]
"""

import argparse
import json


def load(path):
    train, evals = {}, []
    for line in open(path):
        d = json.loads(line)
        if "train/total" in d:
            train[d["step"]] = d
        if "eval/mpjpe_mm" in d:
            evals.append(d)
    return train, evals


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--markdown", action="store_true")
    args = ap.parse_args()
    train, evals = load(args.path)
    steps = sorted(train)
    if not steps:
        print("no train records")
        return

    def nearest_loss(step):
        s = min(steps, key=lambda x: abs(x - step))
        return train[s]["train/total"]

    cols = ("step", "train_total", "eval_mpjpe_mm", "eval_pa_mpjpe_mm",
            "eval_mpvpe_mm", "eval_mrrpe_mm")
    rows = [(e["step"], nearest_loss(e["step"]), e["eval/mpjpe_mm"],
             e["eval/pa_mpjpe_mm"], e["eval/mpvpe_mm"],
             e.get("eval/mrrpe_mm", float("nan"))) for e in evals]
    sep = " | " if args.markdown else "  "
    edge = "| " if args.markdown else ""
    print(edge + sep.join(f"{c:>16}" for c in cols) + (" |" if args.markdown else ""))
    if args.markdown:
        print("|" + "|".join(["---"] * len(cols)) + "|")
    for r in rows:
        print(edge + sep.join(
            f"{v:16.2f}" if isinstance(v, float) else f"{v:16d}" for v in r)
            + (" |" if args.markdown else ""))
    first, last = train[steps[0]], train[steps[-1]]
    print(f"\ntrain/total: {first['train/total']:.2f} (step {steps[0]}) -> "
          f"{last['train/total']:.2f} (step {steps[-1]})")
    if len(evals) >= 2:
        for k in ("eval/mpjpe_mm", "eval/pa_mpjpe_mm"):
            print(f"{k}: {evals[0][k]:.2f} (step {evals[0]['step']}) -> "
                  f"{evals[-1][k]:.2f} (step {evals[-1]['step']})")


if __name__ == "__main__":
    main()
