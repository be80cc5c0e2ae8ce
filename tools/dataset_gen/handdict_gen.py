#!/usr/bin/env python
"""Pack any per-frame hand_dict dataset into the renderih_tpu format.

Covers the family of reference datasets that store one npy dict per frame
with `left`/`right` sub-dicts (verts3d/joints3d/verts2d/joints2d[/pose/
shape]) next to a jpg — InterHand-style processed data
(`dataset/interhand.py:249-268`), Ego3DHands and H2O3D refinements
(`utils/dataset_gen/ego3dhand_dataloader.py`, `h2o3d_dataloader.py`), and
the RenderIH synthetic set.

Layouts supported (auto-detected):
  A: {data}/{split}/img/{i}.jpg + {data}/{split}/ori_handdict/{i}.npy
  B: {data}/all/{i}.npy with dict['img'] embedded (Tzionas-style)

  python tools/dataset_gen/handdict_gen.py --data DIR --split test --out P/

Joints-only datasets (`--from_joints`): frames that carry joints3d but no
verts3d/pose (e.g. mocap exports, the reference's
`utils/mano_from_3djoint/convert2mano.py` use case) get MANO parameters
fitted by the batched analytic IK + Adam refinement (`mano/ik.py`), and
verts3d/pose/shape are filled from the fit.
"""

import argparse
import os
import sys
from glob import glob

import numpy as np

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..")))

from renderih_tpu.data.interhand import IMG_SIZE, LABEL_KEYS, _label_shape  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data", required=True)
    p.add_argument("--split", default="test")
    p.add_argument("--out", required=True)
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--from_joints", action="store_true",
                   help="fit MANO (pose/shape/verts) to frames that only "
                        "have joints3d, via mano/ik.py")
    p.add_argument("--ik_iters", type=int, default=200)
    p.add_argument("--ik_batch", type=int, default=256)
    args = p.parse_args()

    import cv2 as cv

    layout_a = os.path.isdir(os.path.join(args.data, args.split, "ori_handdict"))
    if layout_a:
        n = len(glob(os.path.join(args.data, args.split, "ori_handdict", "*.npy")))
        def read(i):
            img = cv.imread(os.path.join(args.data, args.split, "img", f"{i}.jpg"))
            img = cv.cvtColor(img, cv.COLOR_BGR2RGB)
            hd = np.load(
                os.path.join(args.data, args.split, "ori_handdict", f"{i}.npy"),
                allow_pickle=True)[()]
            return img, hd
    else:
        n = len(glob(os.path.join(args.data, "all", "*.npy")))
        def read(i):
            d = np.load(os.path.join(args.data, "all", f"{i}.npy"),
                        allow_pickle=True)[()]
            img = d["img"]
            if img.ndim == 3 and img.shape[-1] == 3:
                img = img[..., ::-1]  # assume BGR on disk
            return img, d

    if args.limit:
        n = min(n, args.limit)
    print(f"{n} frames ({'layout A' if layout_a else 'layout B'})")

    os.makedirs(args.out, exist_ok=True)
    images = np.memmap(
        os.path.join(args.out, f"{args.split}_images.u8"), dtype=np.uint8,
        mode="w+", shape=(n, IMG_SIZE, IMG_SIZE, 3),
    )
    labels = {k: np.zeros((n,) + _label_shape(k), np.float32)
              for k in LABEL_KEYS}

    ik_rows = {"left": [], "right": []}  # joints-only frames per hand
    for i in range(n):
        img, hd = read(i)
        if img.shape[:2] != (IMG_SIZE, IMG_SIZE):
            img = cv.resize(img, (IMG_SIZE, IMG_SIZE))
        images[i] = img
        for hand in ("left", "right"):
            h = hd[hand]
            labels[f"j3d_{hand}"][i] = h["joints3d"]
            if "verts3d" in h:
                labels[f"v3d_{hand}"][i] = h["verts3d"]
            elif args.from_joints:
                ik_rows[hand].append(i)
            if "verts2d" in h:
                labels[f"v2d_{hand}"][i] = h["verts2d"]
                labels[f"j2d_{hand}"][i] = h["joints2d"]
            if "pose" in h:
                labels[f"pose_{hand}"][i] = np.asarray(h["pose"]).ravel()[:48]
            if "shape" in h:
                labels[f"shape_{hand}"][i] = np.asarray(h["shape"]).ravel()[:10]
        if (i + 1) % 2000 == 0:
            print(f"{i + 1}/{n}")

    if args.from_joints and (ik_rows["left"] or ik_rows["right"]):
        import jax.numpy as jnp

        from renderih_tpu.assets import make_synthetic_assets
        from renderih_tpu.mano.ik import fit_mano_to_joints, mano_from_fit

        assets = make_synthetic_assets(seed=0)
        models = {"left": assets.left.mano, "right": assets.right.mano}
        for hand in ("left", "right"):
            rows = np.asarray(ik_rows[hand], np.int64)
            for s in range(0, len(rows), args.ik_batch):
                rr = rows[s:s + args.ik_batch]
                tgt = jnp.asarray(labels[f"j3d_{hand}"][rr])
                fit = fit_mano_to_joints(models[hand], tgt,
                                         iters=args.ik_iters)
                v, _ = mano_from_fit(models[hand], fit, tgt)
                labels[f"v3d_{hand}"][rr] = np.asarray(v)
                labels[f"pose_{hand}"][rr] = np.concatenate(
                    [np.asarray(fit.root_aa), np.asarray(fit.pose_aa)], -1)
                labels[f"shape_{hand}"][rr] = np.asarray(fit.shape)
                print(f"IK {hand}: fitted {s + len(rr)}/{len(rows)} "
                      f"(mean joint residual "
                      f"{float(fit.joint_err.mean()) * 1e3:.2f} mm at "
                      f"template scale)")
    images.flush()
    np.savez(os.path.join(args.out, f"{args.split}_labels.npz"), **labels)
    print(f"packed {n} -> {args.out}")


if __name__ == "__main__":
    main()
