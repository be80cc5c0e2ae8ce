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

`--renderer pathtrace` switches step 3 to the in-framework Monte-Carlo
path tracer (`render/pathtrace.py`): area-light soft shadows, diffuse
interreflection and environment light — the physics Blender/Cycles
contributes to RenderIH's sim-to-real quality — still entirely on TPU.
The default rasterizer remains for fast generation; geometric
annotation fidelity is identical either way.

  python tools/synth_gen.py --out packed_syn/ --n 512 [--optimize]
  python tools/synth_gen.py --out packed_syn/ --n 512 \
      --renderer pathtrace --spp 8 --bounces 2
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
    p.add_argument("--opt_iters", type=int, default=60,
                   help="Adam iterations per sample for --optimize")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--prior", choices=("gaussian", "gan"), default="gaussian",
                   help="naturalness prior for --optimize: analytic "
                        "Gaussian, or the trained discriminator "
                        "(tools/train_pose_prior.py artifact)")
    p.add_argument("--prior_weights",
                   default="renderih_tpu/assets_data/pose_prior.npz",
                   help="npz artifact for --prior gan")
    p.add_argument("--backgrounds", default=None,
                   help="directory of background images to composite over "
                        "(reference Blender-pipeline behavior); procedural "
                        "backgrounds when omitted")
    p.add_argument("--renderer", choices=("raster", "pathtrace"),
                   default="raster",
                   help="raster: fast Phong rasterizer; pathtrace: "
                        "Monte-Carlo path tracing (area-light soft "
                        "shadows, GI) matching the reference's Blender "
                        "fidelity (render/pathtrace.py)")
    p.add_argument("--spp", type=int, default=8,
                   help="samples per pixel for --renderer pathtrace")
    p.add_argument("--bounces", type=int, default=2,
                   help="indirect bounces for --renderer pathtrace")
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
        BackgroundCorpus,
        random_background,
        random_lighting,
        random_skin_albedo,
    )
    from renderih_tpu.render.renderer import TwoHandRenderer

    cfg = Config()
    assets = load_assets(cfg.assets)
    renderer = TwoHandRenderer(assets, IMG_SIZE)
    tracer = None
    if args.renderer == "pathtrace":
        from renderih_tpu.render.pathtrace import TwoHandPathTracer

        tracer = TwoHandPathTracer(assets, IMG_SIZE)
    corpus = (BackgroundCorpus(args.backgrounds, IMG_SIZE)
              if args.backgrounds else None)
    if corpus is not None:
        print(f"background corpus: {corpus.images.shape[0]} images")

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
    def sample_raw(key, bs):
        """Raw two-hand configurations: params + cameras, no geometry."""
        ks = jax.random.split(key, 10)
        raw = dict(
            root_l=jax.random.normal(ks[0], (bs, 3)) * 0.8,
            pose_l=jax.random.normal(ks[1], (bs, 45)) * 0.4,
            shape_l=jax.random.normal(ks[2], (bs, 10)) * 0.6,
            root_r=jax.random.normal(ks[3], (bs, 3)) * 0.8,
            pose_r=jax.random.normal(ks[4], (bs, 45)) * 0.4,
            shape_r=jax.random.normal(ks[5], (bs, 10)) * 0.6,
            # right hand placed near the left
            offset=jax.random.normal(ks[6], (bs, 3)) * 0.04,
            scale=jax.random.uniform(ks[7], (bs,), minval=0.8, maxval=1.4),
            trans_l=jax.random.uniform(ks[8], (bs, 2), minval=-0.35,
                                       maxval=0.0),
        )
        raw["trans_r"] = raw["trans_l"] + jax.random.uniform(
            ks[9], (bs, 2), minval=0.1, maxval=0.35)
        return raw

    @partial(jax.jit, static_argnums=(2,))
    def finalize(raw, key, bs):
        """Params -> geometry, labels, rendered image."""
        ks = jax.random.split(key, 4)

        def hand(model, root_aa, pose, shape):
            return mano_forward(model, rodrigues(root_aa), pose, shape,
                                center_idx=9, use_pca=False)

        v_l, j_l = hand(assets.left.mano, raw["root_l"], raw["pose_l"],
                        raw["shape_l"])
        v_r, j_r = hand(assets.right.mano, raw["root_r"], raw["pose_r"],
                        raw["shape_r"])
        v_r = v_r + raw["offset"][:, None]
        j_r = j_r + raw["offset"][:, None]

        scale, trans_l, trans_r = raw["scale"], raw["trans_l"], raw["trans_r"]
        v2d_l = orthographic_project(scale, trans_l, v_l, IMG_SIZE)
        j2d_l = orthographic_project(scale, trans_l, j_l, IMG_SIZE)
        v2d_r = orthographic_project(scale, trans_r, v_r, IMG_SIZE)
        j2d_r = orthographic_project(scale, trans_r, j_r, IMG_SIZE)

        albedo = random_skin_albedo(ks[0], bs, renderer.num_verts)
        light_dir, light_color, ambient = random_lighting(ks[1], bs)
        if tracer is not None:
            rgb, mask = tracer.render(
                {"left": scale, "right": scale},
                {"left": trans_l, "right": trans_r}, v_l, v_r, albedo,
                jax.random.fold_in(ks[1], 7), light_dir=light_dir,
                spp=args.spp, n_bounces=args.bounces)
        else:
            rgb, mask = renderer.render_rgb_orth(
                {"left": scale, "right": scale},
                {"left": trans_l, "right": trans_r}, v_l, v_r,
                albedo=albedo, light_dir=light_dir,
                light_color=light_color, ambient=ambient, specular=0.15)
        bg = random_background(ks[2], bs, IMG_SIZE, corpus=corpus)
        noise = jax.random.normal(ks[3], rgb.shape) * 0.02
        img = jnp.clip(
            jnp.where(mask[..., None] > 0, rgb, bg) + noise, 0, 1)

        return dict(
            img_u8=(img * 255).astype(jnp.uint8),
            v3d_left=v_l, j3d_left=j_l, v2d_left=v2d_l, j2d_left=j2d_l,
            v3d_right=v_r, j3d_right=j_r, v2d_right=v2d_r, j2d_right=j2d_r,
            pose_left=jnp.concatenate(
                [jnp.zeros((bs, 3)), raw["pose_l"]], -1),
            shape_left=raw["shape_l"],
            pose_right=jnp.concatenate(
                [jnp.zeros((bs, 3)), raw["pose_r"]], -1),
            shape_right=raw["shape_r"],
        )

    refine = None
    if args.optimize:
        # contact/SDF refinement (reference `pose_data_optimize` step),
        # with a naturalness prior: either the analytic Gaussian fitted to
        # the sampling distribution, or the trained GAN discriminator
        # (the reference's `Ver2Code/Discriminator` capability).
        from renderih_tpu.optimize.anchors import make_synthetic_anchors
        from renderih_tpu.optimize.geo import (
            GeoWeights,
            HandVars,
            load_pose_prior,
            make_gan_pose_prior,
            make_gaussian_pose_prior,
            optimize_two_hands,
        )

        if args.prior == "gan":
            prior = make_gan_pose_prior(load_pose_prior(args.prior_weights))
        else:
            prior = make_gaussian_pose_prior(
                jax.random.normal(jax.random.PRNGKey(1234), (256, 45)) * 0.4)
        # anchor-based contact search (reference `search_anchors`)
        anchor_specs = (
            make_synthetic_anchors(np.asarray(assets.left.mano.faces),
                                   np.asarray(assets.left.mano.v_template)),
            make_synthetic_anchors(np.asarray(assets.right.mano.faces),
                                   np.asarray(assets.right.mano.v_template)),
        )

        def root_joint(model, root_aa, pose, shape):
            _, j = mano_forward(model, rodrigues(root_aa[None]), pose[None],
                                shape[None], center_idx=None, use_pca=False)
            return j[0, 9]

        def refine(raw, i):
            """Refine sample i in place. Optimizer frame = uncentered MANO
            + trans, aligned to the label frame (per-hand root-centered +
            offset) by trans = -j9(params); the refined offset maps back
            as trans_r' + j9_r' - trans_l' - j9_l'."""
            r = {k: jnp.asarray(v[i]) for k, v in raw.items()}
            j9_l = root_joint(assets.left.mano, r["root_l"], r["pose_l"],
                              r["shape_l"])
            j9_r = root_joint(assets.right.mano, r["root_r"], r["pose_r"],
                              r["shape_r"])
            left = HandVars(pose=r["pose_l"], shape=r["shape_l"],
                            trans=-j9_l, root_aa=r["root_l"])
            right = HandVars(pose=r["pose_r"], shape=r["shape_r"],
                             trans=-j9_r + r["offset"], root_aa=r["root_r"])
            iters = max(args.opt_iters // 4, 1)
            sched = ((1.0, 1.0, iters), (0.1, 15.0, iters),
                     (30.0, 0.1, iters), (1.0, 5.0, iters))
            l2, r2, _ = optimize_two_hands(
                assets, left, right, n_iter=args.opt_iters,
                sdf_grid_size=16, weights=GeoWeights(),
                pose_prior_fn=prior, anchors=anchor_specs, schedule=sched)
            j9_l2 = root_joint(assets.left.mano, l2.root_aa, l2.pose, l2.shape)
            j9_r2 = root_joint(assets.right.mano, r2.root_aa, r2.pose, r2.shape)
            upd = dict(
                pose_l=l2.pose, shape_l=l2.shape, root_l=l2.root_aa,
                pose_r=r2.pose, shape_r=r2.shape, root_r=r2.root_aa,
                offset=(r2.trans + j9_r2) - (l2.trans + j9_l2),
            )
            for k, v in upd.items():
                raw[k] = raw[k].at[i].set(v)
            return raw

    key = jax.random.PRNGKey(args.seed)
    written = 0
    while written < n:
        bs = min(args.batch, n - written)
        key, sub = jax.random.split(key)
        raw = sample_raw(sub, bs)
        if refine is not None:
            for i in range(bs):
                raw = refine(raw, i)
        batch = jax.device_get(
            finalize(raw, jax.random.fold_in(sub, 1), bs))
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
