"""InterHand2.6M evaluation CLI (reference `apps/eval_interhand.py`).

  python -m renderih_tpu.apps.eval_interhand --cfg C --ckpt PATH \
      --data /path/packed [--iou iou.npy] [--bs 512] [--synthetic]
"""

from __future__ import annotations

import argparse
import json

import jax

from renderih_tpu.utils.jax_cache import enable_compilation_cache

enable_compilation_cache()
import numpy as np

from renderih_tpu.assets import load_assets
from renderih_tpu.apps.weights import add_weight_args, load_eval_variables
from renderih_tpu.config import load_config
from renderih_tpu.data.interhand import PackedInterHand, make_synthetic_packed
from renderih_tpu.eval.evaluator import evaluate_packed, print_summary
from renderih_tpu.models import init_model


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", type=str, default=None)
    add_weight_args(p)
    p.add_argument("--data", type=str, default=None)
    p.add_argument("--split", type=str, default="test")
    p.add_argument("--iou", type=str, default=None)
    p.add_argument("--bs", type=int, default=512)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--json", action="store_true")
    p.add_argument("--fused_attn", action="store_true",
                   help="route attention through the Pallas kernel "
                        "(faster in isolation, slower end-to-end; A/B knob)")
    p.add_argument("--pallas_conv", action="store_true",
                   help="route eligible 3x3 encoder convs through the "
                        "Pallas implicit-GEMM kernel")
    p.add_argument("--mesh_data", type=int, default=0,
                   help="shard inference data-parallel over N devices "
                        "(0 = single device)")
    p.add_argument("--newmpjpe", action="store_true",
                   help="root=joint 9, length=|j9-j0| convention "
                        "(reference apps/eval_interhand_newmpjpe.py)")
    args = p.parse_args(argv)

    if args.fused_attn and jax.default_backend() != "cpu":
        from renderih_tpu.models.attention import set_fused_attention

        set_fused_attention(True)

    cfg = load_config(args.cfg)
    if args.pallas_conv:
        cfg.model.pallas_conv = True
    assets = load_assets(cfg.assets)
    model, variables = init_model(cfg, assets, jax.random.PRNGKey(0))

    variables = load_eval_variables(cfg, variables, args)

    if args.synthetic or not args.data:
        dataset = make_synthetic_packed("/tmp/renderih_eval", args.split,
                                        assets, n=256)
    else:
        dataset = PackedInterHand.load(args.data, args.split)

    mesh = None
    if args.mesh_data:
        from renderih_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(data=args.mesh_data, model=1,
                         devices=jax.devices()[: args.mesh_data])

    iou = np.load(args.iou, allow_pickle=True) if args.iou else None
    summary = evaluate_packed(
        cfg, model, variables, assets, dataset, batch_size=args.bs, iou=iou,
        mesh=mesh, convention="newmpjpe" if args.newmpjpe else "default")
    if args.json:
        print(json.dumps({k: float(v) for k, v in summary.items()}))
    else:
        print_summary(summary)
    return summary


if __name__ == "__main__":
    main()
