#!/usr/bin/env python
"""Per-sample inter-hand mask IoU over a packed dataset.

Equivalent of the reference's `utils/compute_maskiou.py` +
`utils/get_maskiou.py`: renders each hand's GT mesh separately (our JAX
rasterizer instead of pytorch3d) and computes IoU of the two masks. The
output vector buckets eval metrics by interaction severity
(`apps/eval_interhand.py:230-235`).

Camera: when the packed labels carry per-frame intrinsics (`camera_in`,
written by `pack_reference_dataset` when the source handdicts provide
`camera` — for real data the packed v3d_* are already camera-space),
masks are rendered through the pinhole camera exactly as the reference
does (`utils/compute_maskiou.py:190-198` -> `PerspectiveCameras`,
`utils/vis_utils.py:72-80`). Otherwise it falls back to the orthographic
approximation from packed v2d/z labels.

  python tools/compute_maskiou.py --data packed/ --split test --out iou.npy
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data", required=True)
    p.add_argument("--split", default="test")
    p.add_argument("--out", required=True)
    p.add_argument("--res", type=int, default=64,
                   help="mask resolution (IoU is resolution-insensitive)")
    p.add_argument("--bs", type=int, default=64)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from renderih_tpu.assets import make_synthetic_assets
    from renderih_tpu.config import load_config
    from renderih_tpu.data.interhand import IMG_SIZE, PackedInterHand
    from renderih_tpu.ops.projection import pinhole_project
    from renderih_tpu.render.rasterize import (
        pick_row_block,
        rasterize_orthographic,
    )

    assets = make_synthetic_assets()  # faces only; replace via --cfg if needed
    dataset = PackedInterHand.load(args.data, args.split)
    res = args.res
    sc = res / IMG_SIZE

    faces_l = assets.left.mano.faces
    faces_r = assets.right.mano.faces
    # Real converted data stores CAMERA-SPACE verts in v3d_* (the
    # reference's ori_handdict does exactly this, verts3d = world @ R.T
    # + t, `utils/dataset_gen/interhand.py:274-284`) plus the per-frame
    # post-crop intrinsics in camera_in; synthetic packs have
    # root-relative v3d and no camera_in, so they fall back.
    perspective = "camera_in" in dataset.labels

    def _iou(v2d_l, z_l, v2d_r, z_r):
        def one(v2d, z, faces):
            attrs = jnp.ones((v2d.shape[0], 1))
            _, mask, _ = rasterize_orthographic(
                v2d, z, attrs, faces, height=res, width=res,
                row_block=pick_row_block(v2d_l.shape[0], res, res,
                                         faces.shape[0]),
            )
            return mask

        ml = jax.vmap(lambda a, b: one(a, b, faces_l))(v2d_l, z_l)
        mr = jax.vmap(lambda a, b: one(a, b, faces_r))(v2d_r, z_r)
        inter = jnp.sum(ml & mr, axis=(1, 2))
        union = jnp.sum(ml | mr, axis=(1, 2))
        return inter / jnp.maximum(union, 1)

    @jax.jit
    def masks_orth(v2d_l, z_l, v2d_r, z_r):
        return _iou(v2d_l * sc, z_l, v2d_r * sc, z_r)

    @jax.jit
    def masks_persp(camv_l, camv_r, camera_in):
        uv_l, z_l = pinhole_project(camv_l, camera_in)
        uv_r, z_r = pinhole_project(camv_r, camera_in)
        return _iou(uv_l * sc, z_l, uv_r * sc, z_r)

    n = len(dataset)
    ious = np.zeros(n, np.float32)
    print(f"camera: {'pinhole (cameraIn)' if perspective else 'orthographic'}")
    for start in range(0, n, args.bs):
        idx = np.arange(start, min(start + args.bs, n))
        b = dataset.batch(idx)
        if perspective:
            ious[idx] = np.asarray(masks_persp(
                jnp.asarray(b["v3d_left"]), jnp.asarray(b["v3d_right"]),
                jnp.asarray(b["camera_in"]),
            ))
        else:
            ious[idx] = np.asarray(masks_orth(
                jnp.asarray(b["v2d_left"]), jnp.asarray(b["v3d_left"][..., 2]),
                jnp.asarray(b["v2d_right"]), jnp.asarray(b["v3d_right"][..., 2]),
            ))
        if start % (args.bs * 10) == 0:
            print(f"{start}/{n}")
    np.save(args.out, ious)
    print(f"saved {n} IoUs -> {args.out} "
          f"(mean {ious.mean():.3f}, >0.67: {(ious >= 0.67).mean():.2%})")


if __name__ == "__main__":
    main()
