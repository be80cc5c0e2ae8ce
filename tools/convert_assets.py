#!/usr/bin/env python
"""Convert reference binary assets into renderih_tpu npz files.

  python tools/convert_assets.py --mano-left MANO_LEFT.pkl \
      --mano-right MANO_RIGHT.pkl --out assets/ \
      [--graph-left graph_left.pkl --graph-right graph_right.pkl] \
      [--upsample upsample.pkl] [--dense-color v_color.pkl]

Outputs: mano_left.npz, mano_right.npz, graph_left.npz, graph_right.npz,
upsample.npz, dense_color.npz — consumed via `AssetConfig` paths.

When --graph-* are omitted, the coarsened graphs are rebuilt from the MANO
faces with the same deterministic HEM pipeline the reference used
(`models/model_zoo/coarsening.py:397-428`).
"""

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from renderih_tpu.graph.coarsen import (  # noqa: E402
    build_graph_levels,
    load_reference_graph_pkl,
)
from renderih_tpu.mano.params import convert_mano_pkl  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mano-left", required=True)
    p.add_argument("--mano-right", required=True)
    p.add_argument("--graph-left", default=None)
    p.add_argument("--graph-right", default=None)
    p.add_argument("--upsample", default=None)
    p.add_argument("--dense-color", default=None)
    p.add_argument("--anchor-dir", default=None,
                   help="reference pose_data_optimize/assets/anchor dir "
                        "(face_vertex_idx/anchor_weight/"
                        "merged_vertex_assignment txt files)")
    p.add_argument("--out", required=True)
    args = p.parse_args()

    os.makedirs(args.out, exist_ok=True)

    convert_mano_pkl(args.mano_left, os.path.join(args.out, "mano_left.npz"))
    convert_mano_pkl(args.mano_right, os.path.join(args.out, "mano_right.npz"))
    print("converted MANO pkls")

    for hand, pkl_path in (("left", args.graph_left), ("right", args.graph_right)):
        out_path = os.path.join(args.out, f"graph_{hand}.npz")
        if pkl_path:
            g = load_reference_graph_pkl(pkl_path)
            print(f"loaded reference graph_{hand}.pkl: {g.node_counts}")
        else:
            mano = np.load(os.path.join(args.out, f"mano_{hand}.npz"))
            g = build_graph_levels(np.asarray(mano["faces"]), levels=4)
            print(f"built graph_{hand} from faces: {g.node_counts}")
        g.save_npz(out_path)

    if args.upsample:
        with open(args.upsample, "rb") as f:
            w = pickle.load(f)
        np.savez(os.path.join(args.out, "upsample.npz"),
                 weight=np.asarray(w, np.float32))
        print("converted upsample weights", np.asarray(w).shape)

    if args.dense_color:
        with open(args.dense_color, "rb") as f:
            c = pickle.load(f)
        np.savez(os.path.join(args.out, "dense_color.npz"),
                 color=np.asarray(c, np.float32))
        print("converted dense color", np.asarray(c).shape)

    if args.anchor_dir:
        from renderih_tpu.optimize.anchors import load_anchor_txt

        spec = load_anchor_txt(args.anchor_dir)
        np.savez(os.path.join(args.out, "anchors.npz"),
                 tri_idx=np.asarray(spec.tri_idx),
                 weights=np.asarray(spec.weights),
                 classes=np.asarray(spec.classes))
        print("converted anchors", np.asarray(spec.tri_idx).shape)

    print(f"assets written to {args.out}")


if __name__ == "__main__":
    main()
