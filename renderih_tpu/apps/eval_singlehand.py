"""Single-hand evaluation (reference `apps/eval_singlehand.py`).

Runs the standard evaluator over a packed single-hand dataset (labels for
the absent hand are zeros) and reports the chosen hand's metrics only.

  python -m renderih_tpu.apps.eval_singlehand --data P/ --hand right
"""

from __future__ import annotations

import argparse
import json

import jax
import numpy as np

from renderih_tpu.utils.jax_cache import enable_compilation_cache

enable_compilation_cache()

from renderih_tpu.assets import load_assets
from renderih_tpu.config import load_config
from renderih_tpu.data.interhand import PackedInterHand, make_synthetic_packed
from renderih_tpu.eval.evaluator import evaluate_packed
from renderih_tpu.models import init_model


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", type=str, default=None)
    from renderih_tpu.apps.weights import add_weight_args, load_eval_variables

    add_weight_args(p)
    p.add_argument("--data", type=str, default=None)
    p.add_argument("--split", type=str, default="test")
    p.add_argument("--hand", choices=["left", "right"], default="right")
    p.add_argument("--bs", type=int, default=256)
    p.add_argument("--synthetic", action="store_true")
    args = p.parse_args(argv)

    cfg = load_config(args.cfg)
    assets = load_assets(cfg.assets)
    model, variables = init_model(cfg, assets, jax.random.PRNGKey(0))
    variables = load_eval_variables(cfg, variables, args)

    if args.synthetic or not args.data:
        dataset = make_synthetic_packed("/tmp/renderih_eval_sh", args.split,
                                        assets, n=64)
    else:
        dataset = PackedInterHand.load(args.data, args.split)

    summary = evaluate_packed(cfg, model, variables, assets, dataset,
                              batch_size=args.bs)
    h = args.hand
    print(json.dumps({
        "hand": h,
        # float(): summarize() returns numpy scalars, which json rejects
        "ori_mpjpe_mm": float(summary[f"ori_mpjpe_{h}_mm"]),
        "ori_mpvpe_mm": float(summary[f"ori_mpvpe_{h}_mm"]),
        "mpjpe_mm": float(summary[f"mpjpe_{h}_mm"]),
        "mpvpe_mm": float(summary[f"mpvpe_{h}_mm"]),
        "pa_mpjpe_mm": float(summary[f"pa_mpjpe_{h}_mm"]),
        "pa_mpvpe_mm": float(summary[f"pa_mpvpe_{h}_mm"]),
        "images_per_sec": float(summary["images_per_sec"]),
    }, indent=2))


if __name__ == "__main__":
    main()
