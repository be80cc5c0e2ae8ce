#!/usr/bin/env python
"""Ego3DHands / H2O3D raw-dataset converters -> renderih_tpu packed format.

Parity with the reference's per-dataset generators (SURVEY 2.3 "Other
dataset generators"):

* Ego3DHands (`utils/dataset_gen/ego3dhand_dataloader.py:220-320`):
  per-sequence dirs holding `color_new.png` + normalized
  `location_2d.npy` + canonical `location_3d_canonical.npy` (22 rows,
  row 0 dropped). Joints-only labels (the reference fills verts/pose
  fields with the same joint array; we write zeros and record
  `joints_only` in meta.json so the trainer can run its `only_j3d`
  path).

* H2O3D (`utils/dataset_gen/h2o3d_dataloader.py:99-296`): official
  `{root}/{mode}.txt` file list, `{mode}/{seq}/rgb/{f}.jpg` +
  `{mode}/{seq}/meta/{f}.pkl` with `camMat`, `{right,left}HandJoints3D`,
  `{right,left}HandPose/Trans`, `handBeta`. OpenGL->OpenCV swap
  (negate y/z, `h2o3d_utils/preprocessing.py:435-437`), pinhole
  projection (`h2o3d_utils/transform.py:32-37`), optional MANO forward
  for vertices when real MANO npz assets are supplied.

Both emit the packed layout of `renderih_tpu/data/interhand.py`
({split}_images.u8 + {split}_labels.npz) so PackedInterHand /
DataProvider consume them directly — dataset mixing = packing multiple
sources into one directory tree.

  python tools/dataset_gen/other_datasets_gen.py ego3d --data DIR --out P/
  python tools/dataset_gen/other_datasets_gen.py h2o3d --data DIR \
      --mode train --out P/ [--mano-left L.npz --mano-right R.npz]
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys
from glob import glob

import numpy as np

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..")))

from renderih_tpu.data.interhand import IMG_SIZE, LABEL_KEYS, _label_shape  # noqa: E402
from renderih_tpu.mano.params import NEW_JOINT_ORDER  # noqa: E402

sys.path.insert(0, os.path.dirname(__file__))
from interhand_gen import cam_project, cut_img_matrix, run_mano_np  # noqa: E402

# OpenGL -> OpenCV camera frame (negate y and z), reference
# `h2o3d_utils/preprocessing.py:435-437`.
_SWAP = np.diag([1.0, -1.0, -1.0])


def _alloc(out_dir: str, split: str, n: int):
    os.makedirs(out_dir, exist_ok=True)
    images = np.memmap(
        os.path.join(out_dir, f"{split}_images.u8"), dtype=np.uint8,
        mode="w+", shape=(n, IMG_SIZE, IMG_SIZE, 3),
    )
    labels = {k: np.zeros((n,) + _label_shape(k), np.float32)
              for k in LABEL_KEYS}
    return images, labels


def _finish(out_dir: str, split: str, images, labels, n: int, meta: dict):
    images.flush()
    np.savez(os.path.join(out_dir, f"{split}_labels.npz"),
             **{k: v[:n] for k, v in labels.items()})
    meta["count"] = n
    with open(os.path.join(out_dir, f"{split}_meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    print(f"packed {n} frames -> {out_dir}")


def convert_ego3d(args):
    import cv2 as cv

    seq_dirs = sorted(
        d for d in glob(os.path.join(args.data, "*"))
        if os.path.isfile(os.path.join(d, "color_new.png"))
    )
    if args.limit:
        seq_dirs = seq_dirs[: args.limit]
    images, labels = _alloc(args.out, args.split, len(seq_dirs))

    n = 0
    for d in seq_dirs:
        j2d = np.load(os.path.join(d, "location_2d.npy"))[:, 1:]
        j3d = np.load(os.path.join(d, "location_3d_canonical.npy"))[:, 1:]
        bgr = cv.imread(os.path.join(d, "color_new.png"))
        if bgr is None or np.sum(j2d[0]) == 0 or np.sum(j2d[1]) == 0:
            continue
        rgb = cv.cvtColor(bgr, cv.COLOR_BGR2RGB)
        h, w = rgb.shape[:2]

        # Normalized (row, col) -> pixel (x, y)
        # (`ego3dhand_dataloader.py:251-255`).
        j2d = j2d.astype(np.float64)
        j2d[..., 0] *= h
        j2d[..., 1] *= w
        j2d = j2d[..., ::-1]

        # Canonical 3D: x10 scale, axis flips + xy swap (`:256-262`).
        j3d = j3d.astype(np.float64) * 10.0
        j3d[..., 2] *= -1.0
        j3d[..., 0] *= -1.0
        j3d = j3d[..., [1, 0, 2]]

        M = cut_img_matrix(list(j2d.reshape(-1, 21, 2)), radio=0.8)
        crop = cv.warpAffine(rgb, M, dsize=(IMG_SIZE, IMG_SIZE))
        images[n] = crop
        hom = lambda x: np.concatenate([x, np.ones_like(x[:, :1])], -1) @ M.T
        # Ego3DHands order: hand 0 = left, hand 1 = right (`:310-320`).
        for hi, hand in ((0, "left"), (1, "right")):
            labels[f"j3d_{hand}"][n] = j3d[hi]
            labels[f"j2d_{hand}"][n] = hom(j2d[hi])
        n += 1

    _finish(args.out, args.split, images, labels, n,
            {"source": "ego3dhands", "joints_only": True})


def convert_h2o3d(args):
    import cv2 as cv

    mode = "evaluation" if args.mode == "test" else args.mode
    with open(os.path.join(args.data, mode + ".txt")) as f:
        files = [ln.strip() for ln in f if ln.strip()]
    if args.limit:
        files = files[: args.limit]

    mano = None
    if args.mano_left and args.mano_right:
        from renderih_tpu.mano.params import fix_left_shapedirs, load_mano_npz

        mano = {
            "left": load_mano_npz(args.mano_left, is_right=False),
            "right": load_mano_npz(args.mano_right, is_right=True),
        }
        mano["left"] = fix_left_shapedirs(mano["left"], mano["right"])

    images, labels = _alloc(args.out, args.split, len(files))
    order = list(NEW_JOINT_ORDER)  # raw H2O3D = MANO16+tips ordering

    n = 0
    for fname in files:
        seq, frame = fname.split("/")[:2]
        img_path = os.path.join(args.data, mode, seq, "rgb", frame + ".jpg")
        meta_path = os.path.join(args.data, mode, seq, "meta", frame + ".pkl")
        if not (os.path.isfile(img_path) and os.path.isfile(meta_path)):
            continue
        bgr = cv.imread(img_path)
        if bgr is None:
            continue
        try:
            with open(meta_path, "rb") as f:
                anno = pickle.load(f, encoding="latin1")
        except Exception as e:  # corrupt pkl — reference skips too (:148-151)
            print(f"skip {meta_path}: {e}")
            continue
        cam = np.asarray(anno["camMat"], np.float64)
        focal = (cam[0, 0], cam[1, 1])
        princpt = (cam[0, 2], cam[1, 2])
        rgb = cv.cvtColor(bgr, cv.COLOR_BGR2RGB)

        per_hand = {}
        all2d = []
        ok = True
        for hand in ("left", "right"):
            j_raw = np.asarray(anno[f"{hand}HandJoints3D"], np.float64)
            if j_raw.shape != (21, 3) or not np.all(np.isfinite(j_raw)):
                ok = False
                break
            j_cam = j_raw[order] @ _SWAP.T
            j2d = cam_project(j_cam, focal, princpt)
            if mano is not None:
                pose = np.asarray(anno[f"{hand}HandPose"], np.float64).ravel()
                trans = np.asarray(anno[f"{hand}HandTrans"], np.float64).ravel()
                shape = np.asarray(anno["handBeta"], np.float64).ravel()
                v_gl, _ = run_mano_np(mano[hand], pose, shape, trans)
                v_cam = v_gl @ _SWAP.T
                v2d = cam_project(v_cam, focal, princpt)
            else:
                v_cam = np.zeros((778, 3))
                v2d = np.zeros((778, 2))
                pose = np.zeros(48)
                shape = np.zeros(10)
            per_hand[hand] = (v_cam, j_cam, v2d, j2d, pose, shape)
            all2d.append(j2d)
        if not ok:
            continue

        M = cut_img_matrix(all2d, radio=0.7)  # reference uses 0.7 (:66)
        crop = cv.warpAffine(rgb, M, dsize=(IMG_SIZE, IMG_SIZE))
        images[n] = crop
        hom = lambda x: np.concatenate([x, np.ones_like(x[:, :1])], -1) @ M.T
        for hand in ("left", "right"):
            v_cam, j_cam, v2d, j2d, pose, shape = per_hand[hand]
            labels[f"v3d_{hand}"][n] = v_cam
            labels[f"j3d_{hand}"][n] = j_cam
            labels[f"v2d_{hand}"][n] = hom(v2d) if mano is not None else v2d
            labels[f"j2d_{hand}"][n] = hom(j2d)
            labels[f"pose_{hand}"][n] = pose[:48]
            labels[f"shape_{hand}"][n] = shape[:10]
        n += 1

    _finish(args.out, args.split, images, labels, n,
            {"source": "h2o3d", "joints_only": mano is None})


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)

    e = sub.add_parser("ego3d")
    e.add_argument("--data", required=True)
    e.add_argument("--split", default="train")
    e.add_argument("--out", required=True)
    e.add_argument("--limit", type=int, default=None)
    e.set_defaults(fn=convert_ego3d)

    h = sub.add_parser("h2o3d")
    h.add_argument("--data", required=True)
    h.add_argument("--mode", default="train", choices=["train", "test", "val"])
    h.add_argument("--split", default="train",
                   help="output split name for the packed files")
    h.add_argument("--out", required=True)
    h.add_argument("--mano-left", default=None)
    h.add_argument("--mano-right", default=None)
    h.add_argument("--limit", type=int, default=None)
    h.set_defaults(fn=convert_h2o3d)

    args = p.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
