"""Synthetic, geometrically-consistent training batches.

Drives the synthetic MANO models with random poses/cameras to produce
batches with *self-consistent* labels (verts2d really are the projection
of verts3d under the sampled camera), so train-step and metric tests are
meaningful end to end without real data. Label semantics match the
runtime loader (`core/loader.py:180-219`): 3D labels are root-relative
(root = joint 9), bone-rescaled to `bone_length`, and `root_rel` carries
the right-to-left root offset after rescale.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from renderih_tpu.assets import Assets
from renderih_tpu.mano.layer import mano_forward
from renderih_tpu.ops.projection import orthographic_project
from renderih_tpu.ops.rotation import rodrigues


def synthetic_batch(
    assets: Assets,
    rng: jax.Array,
    batch_size: int = 8,
    img_size: int = 256,
    bone_length: float = 0.095,
    with_aux: bool = False,
    with_cam: bool = False,
    with_img: bool = True,
    scene: bool = False,
) -> dict:
    """With `scene=False` (default, the cheap fixture used across the
    test suite) each hand gets an independent random camera and 3D labels
    stay per-hand root-relative; `root_rel` is synthetic noise.

    With `scene=True` the two hands form ONE interacting scene, matching
    the real InterHand crops the reference trains on
    (`core/loader.py:180-219`): the right hand is placed at a sampled
    root offset next to the left, one shared orthographic camera is fit
    so the hand pair fills most of the frame, v2d/j2d are that camera's
    projection, v3d_right/j3d_right are packed in the SCENE frame (left
    root at the origin, right verts carrying the real `root_rel`), and
    the camera fields render correct inter-hand occlusion. This is the
    learnable image->pose task for convergence runs — the default mode's
    40-80 px independently-floating hands carry too little pose signal."""
    keys = jax.random.split(rng, 16)

    def hand(model, k0, k1, k2, k3, k4):
        root = rodrigues(jax.random.normal(k0, (batch_size, 3)) * 0.5)
        pose = jax.random.normal(k1, (batch_size, 45)) * 0.3
        shape = jax.random.normal(k2, (batch_size, 10)) * 0.5
        v, j = mano_forward(model, root, pose, shape, center_idx=9)
        # Bone-length normalize: |j9 - j0| -> bone_length
        length = jnp.linalg.norm(j[:, 9] - j[:, 0], axis=-1, keepdims=True)
        s = bone_length / (length + 1e-9)
        v = v * s[:, :, None]
        j = j * s[:, :, None]
        scale = jax.random.uniform(k3, (batch_size,), minval=0.8, maxval=1.5)
        trans2d = jax.random.uniform(k4, (batch_size, 2), minval=-0.3, maxval=0.3)
        v2d = orthographic_project(scale, trans2d, v, img_size)
        j2d = orthographic_project(scale, trans2d, j, img_size)
        return v, j, v2d, j2d, scale, trans2d

    v3d_l, j3d_l, v2d_l, j2d_l, sc_l, tr_l = hand(assets.left.mano, *keys[0:5])
    v3d_r, j3d_r, v2d_r, j2d_r, sc_r, tr_r = hand(assets.right.mano, *keys[5:10])
    root_rel = jax.random.normal(keys[10], (batch_size, 3)) * 0.05

    if scene:
        # Real root offset: interacting hands 7-18 cm apart, mostly in
        # the image plane (z is unobservable under orthographic
        # projection beyond occlusion ordering).
        phi = jax.random.uniform(keys[12], (batch_size,), maxval=2 * jnp.pi)
        rad = jax.random.uniform(keys[13], (batch_size,),
                                 minval=0.07, maxval=0.18)
        root_rel = jnp.stack(
            [rad * jnp.cos(phi), rad * jnp.sin(phi),
             0.02 * jax.random.normal(keys[14], (batch_size,))], axis=-1)
        v3d_r = v3d_r + root_rel[:, None, :]
        j3d_r = j3d_r + root_rel[:, None, :]

        # Shared camera fit: scale/translate so the two-hand bounding box
        # fills `fill` of the frame, with a small placement jitter.
        xy = jnp.concatenate([v3d_l, v3d_r], axis=1)[..., :2]
        mn = xy.min(axis=1)
        mx = xy.max(axis=1)
        center = 0.5 * (mn + mx)
        half_ext = jnp.maximum(0.5 * (mx - mn).max(axis=-1), 1e-6)
        fill = jax.random.uniform(keys[15], (batch_size,),
                                  minval=0.60, maxval=0.90)
        sc = fill / (2.0 * half_ext)
        tr = -2.0 * sc[:, None] * center + jax.random.uniform(
            keys[11], (batch_size, 2), minval=-0.05, maxval=0.05)
        sc_l = sc_r = sc
        tr_l = tr_r = tr
        v2d_l = orthographic_project(sc, tr, v3d_l, img_size)
        j2d_l = orthographic_project(sc, tr, j3d_l, img_size)
        v2d_r = orthographic_project(sc, tr, v3d_r, img_size)
        j2d_r = orthographic_project(sc, tr, j3d_r, img_size)

    batch = {
        "v3d_left": v3d_l, "j3d_left": j3d_l,
        "v2d_left": v2d_l, "j2d_left": j2d_l,
        "v3d_right": v3d_r, "j3d_right": j3d_r,
        "v2d_right": v2d_r, "j2d_right": j2d_r,
        "root_rel": root_rel,
    }
    if with_img:
        # (n, S, S, 3) noise at f32 is big (and its RNG intermediates
        # bigger); callers that write their own images — e.g.
        # make_synthetic_packed — pass with_img=False.
        batch["img"] = jax.random.normal(
            keys[11], (batch_size, img_size, img_size, 3))
    if with_cam:
        # The generating orthographic cameras — consumed by
        # `make_synthetic_packed(render_images=True)` to rasterize images
        # consistent with the labels (never fed to the model).
        batch.update({
            "cam_scale_left": sc_l, "cam_trans_left": tr_l,
            "cam_scale_right": sc_r, "cam_trans_right": tr_r,
        })
    if with_aux:
        batch.update(synthetic_aux_targets(
            assets, img_size,
            {"left": sc_l, "right": sc_r}, {"left": tr_l, "right": tr_r},
            {"left": v3d_l, "right": v3d_r},
            {"left": j2d_l, "right": j2d_r}))
    return batch


def synthetic_aux_targets(
    assets: Assets,
    img_size: int,
    scale: dict,
    trans2d: dict,
    v3d: dict,
    j2d: dict,
) -> dict:
    """Geometry-consistent hms/mask/dense targets at the aux-head
    resolution (img_size // 4).

    The reference generates these offline with PyTorch3D renders +
    `HeatmapGenerator` (`miscellaneous/interhand_ori_gen.py`); here they
    come from the JAX rasterizer and `ops.heatmap.gaussian_heatmaps` so
    the aux-head training path (`calc_aux_loss`, `core/Loss.py:180-198`)
    is exercisable end to end without real data: 'hms' (B, S, S, 42) =
    21 left + 21 right joint Gaussians, 'mask' (B, S, S) = rendered
    two-hand silhouette, 'dense' (B, S, S, 6) = per-hand vertex-color
    (densepose-style) renders, left channels first.
    """
    from renderih_tpu.assets import _dense_color_from_template
    from renderih_tpu.ops.heatmap import gaussian_heatmaps
    from renderih_tpu.render.rasterize import (
        pick_row_block,
        rasterize_orthographic,
    )

    s = img_size // 4
    j_all = jnp.concatenate([j2d["left"], j2d["right"]], axis=1)
    hms = gaussian_heatmaps(j_all * (s / img_size), size=s,
                            sigma=max(s / 32.0, 1.0))
    hms = jnp.transpose(hms, (0, 2, 3, 1))  # (B, S, S, 42)

    def hand_dense(hand_assets, sc, tr, v):
        colors = jnp.asarray(
            _dense_color_from_template(hand_assets.mano), jnp.float32)
        v2d = orthographic_project(sc, tr, v, s)

        def one(v2d_i, z_i):
            attr, m, _ = rasterize_orthographic(
                v2d_i, z_i, colors, hand_assets.mano.faces,
                height=s, width=s,
                row_block=pick_row_block(v2d.shape[0], s, s,
                                         hand_assets.mano.faces.shape[0]))
            return attr * m[..., None], m

        return jax.vmap(one)(v2d, v[..., 2])

    dense_l, mask_l = hand_dense(assets.left, scale["left"], trans2d["left"],
                                 v3d["left"])
    dense_r, mask_r = hand_dense(assets.right, scale["right"],
                                 trans2d["right"], v3d["right"])
    mask_l = (mask_l > 0).astype(jnp.float32)
    mask_r = (mask_r > 0).astype(jnp.float32)
    dense = jnp.concatenate([dense_l, dense_r], axis=-1)
    # 'mask' = two-hand union silhouette (the mask head's target);
    # 'mask_left'/'mask_right' are per-hand silhouettes used to gate each
    # dense half in `aux_losses` (the reference's corresponding code,
    # `core/Loss.py:186-189`, slices mask[:, :1]/mask[:, 1:] — but its
    # predicted mask is single-channel (B, H, W), so that slicing takes
    # ROWS; the path is dead there (total_loss zeroed, `core/Loss.py:210`).
    # We implement the evident intent: per-hand gating.)
    return {"hms": hms, "mask": jnp.maximum(mask_l, mask_r),
            "mask_left": mask_l, "mask_right": mask_r, "dense": dense}
