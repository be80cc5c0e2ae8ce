#!/usr/bin/env python
"""Pack a preprocessed InterHand2.6M tree into flat memmap arrays.

  python tools/pack_data.py --data /path/interhand_data --split test \
      --out /path/packed [--limit 1000]

Input layout = the reference's preprocessed output
(`utils/dataset_gen/interhand.py --gen_anno` two-pass pipeline):
  {data}/{split}/img/{i}.jpg, {data}/{split}/ori_handdict/{i}.npy
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from renderih_tpu.data.interhand import pack_reference_dataset  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data", required=True)
    p.add_argument("--split", default="train")
    p.add_argument("--out", required=True)
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--mano-left", default=None,
                   help="MANO npz; needed to convert the reference's "
                        "PCA pose labels (else pose/shape stay zero)")
    p.add_argument("--mano-right", default=None)
    args = p.parse_args()
    n = pack_reference_dataset(args.data, args.split, args.out, args.limit,
                               mano_left=args.mano_left,
                               mano_right=args.mano_right)
    print(f"packed {n} samples -> {args.out}/{args.split}_*")


if __name__ == "__main__":
    main()
