"""Visual + statistical sanity check of the rendered synthetic dataset.

Round-4's convergence run stalled at the mean pose on TRAIN data (vert2d
MSE ~0.14 = ~48 px RMS, vert3d_mm ~142) — i.e. the model extracted no
pose signal from the images. Before burning hours on another run, this
tool answers, offline and in minutes:

  1. do the rendered images actually contain visibly distinct hands?
  2. do the 2D labels land on the rendered pixels (image<->label
     consistency)?
  3. does `device_augment` keep that consistency (warped image vs warped
     labels)?
  4. how much pixel-level variation is there across samples (can the
     task be anything but mean-pose regression)?

Usage:  env -u PYTHONPATH JAX_PLATFORMS=cpu python tools/inspect_synth.py \
            [--n 16] [--out /tmp/synth_inspect]
"""

from __future__ import annotations

import argparse
import os


def dot(img: "np.ndarray", pts: "np.ndarray", color) -> None:
    """Draw 3x3 dots at integer points (in-place)."""
    import numpy as np

    h, w = img.shape[:2]
    for x, y in np.asarray(pts):
        xi, yi = int(round(float(x))), int(round(float(y)))
        if 1 <= xi < w - 1 and 1 <= yi < h - 1:
            img[yi - 1:yi + 2, xi - 1:xi + 2] = color


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=16)
    parser.add_argument("--out", type=str, default="/tmp/synth_inspect")
    parser.add_argument("--data", type=str, default=None,
                        help="reuse an existing packed dataset dir")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from renderih_tpu.assets import load_assets
    from renderih_tpu.config import load_config
    from renderih_tpu.data.interhand import make_synthetic_packed
    from renderih_tpu.data.pipeline import device_augment

    cfg = load_config(None)
    assets = load_assets(cfg.assets)
    os.makedirs(args.out, exist_ok=True)
    root = args.data or os.path.join(args.out, "_data")
    ds = make_synthetic_packed(root, "train", assets, n=args.n,
                               render_images=True)
    b = ds.batch(np.arange(min(args.n, 8)))

    # ---- raw sample checks -------------------------------------------
    imgs = b["img_u8"]
    per_img_std = imgs.reshape(imgs.shape[0], -1).std(axis=1)
    across_std = imgs.astype(np.float32).std(axis=0).mean()
    print(f"per-image pixel std   : {per_img_std.round(1).tolist()}")
    print(f"across-sample std     : {across_std:.1f} (0 = identical images)")

    px_err = []
    for k in range(imgs.shape[0]):
        im = imgs[k].copy()
        dot(im, b["v2d_left"][k][::25], (255, 0, 0))
        dot(im, b["v2d_right"][k][::25], (0, 255, 0))
        dot(im, b["j2d_left"][k], (255, 255, 255))
        dot(im, b["j2d_right"][k], (0, 0, 255))
        Image.fromarray(im).save(os.path.join(args.out, f"raw_{k}.png"))
        # label<->pixel consistency proxy: joints should mostly land on
        # non-background pixels. Background is procedural; use local
        # variance of the dense albedo instead: sample image at v2d and
        # check spread.
        for hand, c in (("left", 0), ("right", 1)):
            j = np.asarray(b[f"j2d_{hand}"][k])
            inside = ((j >= 0) & (j < imgs.shape[1])).all(axis=1)
            px_err.append(inside.mean())
    print(f"joints inside frame   : {np.mean(px_err):.2%}")

    # ---- augmentation consistency ------------------------------------
    batch = {k: jnp.asarray(v) for k, v in b.items()}
    aug = device_augment(batch, jax.random.PRNGKey(7), train=True,
                         noise=0.0)
    # un-normalize for viewing
    from renderih_tpu.ops.image import IMAGENET_MEAN, IMAGENET_STD

    im = np.asarray(aug["img"]) * np.asarray(IMAGENET_STD) + np.asarray(
        IMAGENET_MEAN)
    im = np.clip(im * 255.0, 0, 255).astype(np.uint8)
    for k in range(im.shape[0]):
        v = im[k].copy()
        dot(v, np.asarray(aug["j2d_left"][k]), (255, 0, 0))
        dot(v, np.asarray(aug["j2d_right"][k]), (0, 255, 0))
        Image.fromarray(v).save(os.path.join(args.out, f"aug_{k}.png"))
    print(f"wrote {imgs.shape[0]} raw + {im.shape[0]} augmented overlays "
          f"to {args.out}")

    # ---- label statistics --------------------------------------------
    for key in ("v3d_left", "v3d_right", "v2d_left", "v2d_right"):
        arr = np.asarray(b[key])
        print(f"{key:10s} mean {arr.mean(axis=(0, 1)).round(3)} "
              f"std {arr.std(axis=(0, 1)).round(3)}")
    rr = np.asarray(aug["root_rel"])
    print(f"root_rel (aug) mean {rr.mean(0).round(3)} std {rr.std(0).round(3)}")


if __name__ == "__main__":
    main()
