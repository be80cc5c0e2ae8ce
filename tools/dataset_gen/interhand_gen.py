#!/usr/bin/env python
"""InterHand2.6M preprocessing: official release -> packed training data.

Faithful port of the reference two-pass generator
(`utils/dataset_gen/interhand.py:88-318`), fused into one pass that writes
directly to the packed format `renderih_tpu.data.interhand` consumes:

  pass (reference 1+2): read the official JSONs
  (InterHand2.6M_{split}_data.json / _camera.json / _MANO_NeuralAnnot.json;
  _joint_3d.json is not needed — joints come from the MANO fits, as in the
  reference's `load_mano`), keep `interacting` frames with both-hand MANO
  fits, run MANO to get verts, world->cam transform, project, crop to
  256^2 with `cut_img` (bbox ratio 0.8), and store images + per-hand
  verts3d/joints3d/verts2d/joints2d/pose/shape.

Requires: converted MANO npz assets and the official dataset tree:
  {root}/images/{split}/...   {root}/annotations/{split}/...

  python tools/dataset_gen/interhand_gen.py --data ROOT --split train \
      --mano-left mano_left.npz --mano-right mano_right.npz --out packed/
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..")))

from renderih_tpu.data.interhand import IMG_SIZE, LABEL_KEYS, _label_shape  # noqa: E402

HAND_BBOX_RATIO = 0.8  # reference `dataset/dataset_utils.py:5` via gen (0.8)


def cut_img_matrix(label2d_list, radio=HAND_BBOX_RATIO, img_size=IMG_SIZE):
    """The affine crop matrix of `cut_img` (`dataset/dataset_utils.py:12-42`)."""
    mins = np.min([l.min(axis=0) for l in label2d_list], axis=0)
    maxs = np.max([l.max(axis=0) for l in label2d_list], axis=0)
    mid = (mins + maxs) / 2
    L = np.max(maxs - mins) / 2 / radio
    M = img_size / 2 / L * np.array(
        [[1, 0, L - mid[0]], [0, 1, L - mid[1]]], np.float64
    )
    return M


def world_to_cam(world, R, t):
    """InterHand camera: x_cam = R (x_world - t). R: (3,3), t: (3,)."""
    return (world - t[None]) @ R.T


def cam_project(cam_pts, focal, princpt):
    uv = cam_pts[:, :2] / cam_pts[:, 2:3]
    return uv * np.asarray(focal)[None] + np.asarray(princpt)[None]


def validate_mano_entry(entry, cap, frame, hand):
    """Check one NeuralAnnot hand fit; return (pose48, shape10, trans3).

    Official schema (`InterHand2.6M_{split}_MANO_NeuralAnnot.json`):
    pose = 48 floats (3 global + 45 hand, flat-hand-mean EXCLUDED),
    shape = 10, trans = 3 (metres). Real-world exports sometimes nest
    these one level deep ((1, 48) lists) — accept that, but fail loudly
    on anything else instead of packing silent garbage.
    """
    where = f"NeuralAnnot capture {cap} frame {frame} hand '{hand}'"
    if not isinstance(entry, dict):
        raise ValueError(f"{where}: expected a dict, got {type(entry).__name__}")
    out = []
    for key, want in (("pose", 48), ("shape", 10), ("trans", 3)):
        if key not in entry:
            raise ValueError(f"{where}: missing '{key}'")
        try:
            arr = np.asarray(entry[key], np.float64).reshape(-1)
        except (TypeError, ValueError) as e:
            raise ValueError(f"{where}: non-numeric '{key}': {e}") from None
        if arr.size != want:
            raise ValueError(
                f"{where}: '{key}' has {arr.size} values, expected {want}")
        if not np.all(np.isfinite(arr)):
            raise ValueError(f"{where}: non-finite values in '{key}'")
        out.append(arr)
    return tuple(out)


def run_mano_np(mano_npz, pose48, shape10, trans3):
    """MANO forward in numpy via the JAX layer (CPU)."""
    import jax
    import jax.numpy as jnp

    from renderih_tpu.mano.layer import mano_forward
    from renderih_tpu.ops.rotation import rodrigues

    root = rodrigues(jnp.asarray(pose48[None, :3], jnp.float32))
    v, j = mano_forward(
        mano_npz, root,
        jnp.asarray(pose48[None, 3:], jnp.float32),
        jnp.asarray(shape10[None], jnp.float32),
        trans=jnp.asarray(trans3[None], jnp.float32),
        center_idx=None, use_pca=False,
    )
    return np.asarray(v[0]), np.asarray(j[0])


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data", required=True, help="official InterHand2.6M root")
    p.add_argument("--split", default="train")
    p.add_argument("--mano-left", required=True)
    p.add_argument("--mano-right", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--hand_type", default="interacting",
                   choices=["interacting", "right", "left", "all"],
                   help="which frames to pack; 'right'/'left' packs "
                        "single-hand frames with the absent hand zeroed "
                        "(reference `utils/interhand_single.py`)")
    args = p.parse_args(argv)

    import cv2 as cv

    from renderih_tpu.mano.params import fix_left_shapedirs, load_mano_npz

    mano = {
        "left": load_mano_npz(args.mano_left, is_right=False),
        "right": load_mano_npz(args.mano_right, is_right=True),
    }
    mano["left"] = fix_left_shapedirs(mano["left"], mano["right"])

    ann_dir = os.path.join(args.data, "annotations", args.split)
    with open(os.path.join(
            ann_dir, f"InterHand2.6M_{args.split}_data.json")) as f:
        data = json.load(f)
    with open(os.path.join(
            ann_dir, f"InterHand2.6M_{args.split}_camera.json")) as f:
        cameras = json.load(f)
    with open(os.path.join(
            ann_dir, f"InterHand2.6M_{args.split}_MANO_NeuralAnnot.json")) as f:
        mano_params = json.load(f)

    images_by_id = {im["id"]: im for im in data["images"]}
    selected = []
    for ann in data["annotations"]:
        ht = ann.get("hand_type")
        if args.hand_type != "all" and ht != args.hand_type:
            continue
        hands_needed = ("left", "right") if ht == "interacting" else (ht,)
        if ann.get("image_id") not in images_by_id:
            raise ValueError(
                f"annotation id {ann.get('id')} references image_id "
                f"{ann.get('image_id')!r}, which is not in the 'images' "
                f"table of InterHand2.6M_{args.split}_data.json")
        im = images_by_id[ann["image_id"]]
        cap = str(im["capture"])
        frame = str(im["frame_idx"])
        mp = mano_params.get(cap, {}).get(frame)
        if not mp or any(mp.get(h) is None for h in hands_needed):
            continue
        selected.append((ann, im, hands_needed))
        if args.limit and len(selected) >= args.limit:
            break
    n = len(selected)
    print(f"{n} '{args.hand_type}' frames with MANO")

    os.makedirs(args.out, exist_ok=True)
    labels = {k: np.zeros((n,) + _label_shape(k), np.float32)
              for k in LABEL_KEYS}
    if n == 0:  # valid empty pack (np.memmap cannot map zero bytes)
        open(os.path.join(args.out, f"{args.split}_images.u8"), "wb").close()
        np.savez(os.path.join(args.out, f"{args.split}_labels.npz"), **labels)
        print(f"packed 0 samples -> {args.out}")
        return
    images = np.memmap(
        os.path.join(args.out, f"{args.split}_images.u8"), dtype=np.uint8,
        mode="w+", shape=(n, IMG_SIZE, IMG_SIZE, 3),
    )

    for i, (ann, im, hands) in enumerate(selected):
        cap = str(im["capture"])
        frame = str(im["frame_idx"])
        cam = str(im["camera"])
        if cap not in cameras or cam not in cameras[cap].get("campos", {}):
            raise ValueError(
                f"camera {cam!r} of capture {cap!r} missing from "
                f"InterHand2.6M_{args.split}_camera.json")
        campos = np.asarray(cameras[cap]["campos"][cam], np.float64) / 1000.0
        camrot = np.asarray(cameras[cap]["camrot"][cam], np.float64)
        focal = cameras[cap]["focal"][cam]
        princpt = cameras[cap]["princpt"][cam]

        img_path = os.path.join(args.data, "images", args.split,
                                im["file_name"])
        bgr = cv.imread(img_path)
        if bgr is None:
            raise FileNotFoundError(
                f"image for annotation {ann['id']} missing or unreadable: "
                f"{img_path}")
        rgb = cv.cvtColor(bgr, cv.COLOR_BGR2RGB)

        per_hand = {}
        all2d = []
        for hand in hands:
            pose, shape, trans = validate_mano_entry(
                mano_params[cap][frame][hand], cap, frame, hand)
            # The NeuralAnnot hand pose excludes the flat-hand mean; the
            # reference folds it back in via its full-rank axis2pca ->
            # pca2axis round trip (`utils/dataset_gen/interhand.py:164-167`
            # with `models/manolayer.py:163-181`), i.e. it evaluates MANO at
            # annot45 + hands_mean (official smplx flat_hand_mean=False
            # semantics). Fold it here and store the folded pose so the
            # packed `pose_*` labels are the actual evaluated rotations.
            pose = np.concatenate(
                [pose[:3], pose[3:48] + np.asarray(mano[hand].hands_mean)])
            v_w, j_w = run_mano_np(mano[hand], pose, shape, trans)
            v_c = world_to_cam(v_w, camrot, campos)
            j_c = world_to_cam(j_w, camrot, campos)
            v2d = cam_project(v_c, focal, princpt)
            j2d = cam_project(j_c, focal, princpt)
            per_hand[hand] = (v_c, j_c, v2d, j2d, pose, shape)
            all2d += [v2d, j2d]

        M = cut_img_matrix(all2d)
        crop = cv.warpAffine(rgb, M, dsize=(IMG_SIZE, IMG_SIZE))
        images[i] = crop
        for hand in hands:  # absent hand stays zero-filled
            v_c, j_c, v2d, j2d, pose, shape = per_hand[hand]
            hom = lambda x: np.concatenate(
                [x, np.ones_like(x[:, :1])], -1) @ M.T
            labels[f"v3d_{hand}"][i] = v_c
            labels[f"j3d_{hand}"][i] = j_c
            labels[f"v2d_{hand}"][i] = hom(v2d)
            labels[f"j2d_{hand}"][i] = hom(j2d)
            labels[f"pose_{hand}"][i] = pose[:48]
            labels[f"shape_{hand}"][i] = shape[:10]
        if (i + 1) % 1000 == 0:
            print(f"{i + 1}/{n}")

    images.flush()
    np.savez(os.path.join(args.out, f"{args.split}_labels.npz"), **labels)
    print(f"packed {n} samples -> {args.out}")


if __name__ == "__main__":
    main()
