"""InterHand2.6M dataset access: packed arrays + reference-layout reader.

The reference stores preprocessed samples as per-frame files
(`{split}/img/{i}.jpg` + `{split}/ori_handdict/{i}.npy`, see
`dataset/interhand.py:230-268`), read by 4 DataLoader worker processes.
On TPU hosts the input bottleneck is file-open overhead, so we pack the
dataset once into flat memory-mappable arrays:

  {out}/{split}_images.u8   — uint8 (N, 256, 256, 3), RGB
  {out}/{split}_labels.npz  — float32 label arrays (see LABEL_KEYS)

and read random batches with zero-copy slicing. Augmentation happens on
device (`renderih_tpu/data/pipeline.py`), not in host workers.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

IMG_SIZE = 256  # reference `dataset/dataset_utils.py:4`

LABEL_KEYS = (
    "v3d_left", "j3d_left", "v2d_left", "j2d_left",
    "v3d_right", "j3d_right", "v2d_right", "j2d_right",
    "pose_left", "shape_left", "pose_right", "shape_right",
)

_SHAPES = {
    "v3d": (778, 3), "j3d": (21, 3), "v2d": (778, 2), "j2d": (21, 2),
    "pose": (48,), "shape": (10,),
}


def _label_shape(key: str) -> tuple:
    return _SHAPES[key.split("_")[0]]


@dataclass
class PackedInterHand:
    """Packed dataset; image gathers go through the native reader when
    available (GIL-free threaded mmap gather,
    `renderih_tpu/data/native_reader.py` + `native/packed_reader.cpp`)."""

    images: np.ndarray | None   # uint8 memmap (N, 256, 256, 3) fallback
    labels: dict                # str -> float32 (N, ...)
    reader: object = None       # PackedReader or None

    def __len__(self) -> int:
        if self.reader is not None:
            return len(self.reader)
        return self.images.shape[0]

    def batch(self, idx: np.ndarray) -> dict:
        if self.reader is not None:
            img = self.reader.gather(np.asarray(idx, np.int64))
        else:
            img = np.asarray(self.images[idx])
        out = {"img_u8": img}
        for k, v in self.labels.items():
            out[k] = np.asarray(v[idx])
        return out

    @classmethod
    def load(cls, root: str, split: str,
             use_native: bool = True) -> "PackedInterHand":
        labels = dict(np.load(os.path.join(root, f"{split}_labels.npz")))
        n = labels[LABEL_KEYS[0]].shape[0]
        path = os.path.join(root, f"{split}_images.u8")
        reader = None
        images = None
        if use_native:
            try:
                from renderih_tpu.data.native_reader import PackedReader

                reader = PackedReader(path, (IMG_SIZE, IMG_SIZE, 3))
            except Exception:
                reader = None
        if reader is None:
            images = np.memmap(path, dtype=np.uint8, mode="r",
                               shape=(n, IMG_SIZE, IMG_SIZE, 3))
        return cls(images=images, labels=labels, reader=reader)


def load_reference_sample(data_path: str, split: str, idx: int):
    """Read one sample in the reference on-disk layout (requires cv2)."""
    import cv2 as cv

    img = cv.imread(os.path.join(data_path, split, "img", f"{idx}.jpg"))
    img = cv.cvtColor(img, cv.COLOR_BGR2RGB)
    hand_dict = np.load(
        os.path.join(data_path, split, "ori_handdict", f"{idx}.npy"),
        allow_pickle=True,
    )[()]
    return img, hand_dict


def pack_reference_dataset(data_path: str, split: str, out_dir: str,
                           limit: int | None = None,
                           mano_left: str | None = None,
                           mano_right: str | None = None) -> int:
    """Convert the reference per-file layout into packed arrays.

    The reference's `ori_handdict` stores the hand pose as 45 PCA
    coefficients plus a separate root rotation matrix `R`
    (`utils/dataset_gen/interhand.py:164-175`); its Dataset rebuilds a
    48-vector [rodrigues(R), pca45] at read time
    (`dataset/interhand.py:261-267`). Our packed `pose_*` convention is
    the *evaluated* axis-angle [root_aa, pca45 @ hands_components +
    hands_mean], so converting pose labels requires the MANO npz assets
    (`mano_left`/`mano_right`); without them pose/shape stay zero-filled
    (geometry labels are unaffected).
    """
    from glob import glob

    mano = None
    if mano_left and mano_right:
        from renderih_tpu.mano.params import load_mano_npz

        mano = {"left": load_mano_npz(mano_left, is_right=False),
                "right": load_mano_npz(mano_right, is_right=True)}

    os.makedirs(out_dir, exist_ok=True)
    n = len(glob(os.path.join(data_path, split, "anno", "*.pkl")))
    if limit:
        n = min(n, limit)

    images = np.memmap(
        os.path.join(out_dir, f"{split}_images.u8"), dtype=np.uint8,
        mode="w+", shape=(n, IMG_SIZE, IMG_SIZE, 3),
    )
    labels = {k: np.zeros((n,) + _label_shape(k), np.float32)
              for k in LABEL_KEYS}
    # Per-frame post-crop pinhole intrinsics ('camera' in ori_handdict,
    # `utils/dataset_gen/interhand.py:288`): enables perspective mask
    # rendering (tools/compute_maskiou.py, render_mask_perspective).
    # Note the packed v3d_* from real data are CAMERA-space verts.
    camera_in = np.zeros((n, 3, 3), np.float32)
    have_camera = True

    for i in range(n):
        img, hd = load_reference_sample(data_path, split, i)
        if img.shape[:2] != (IMG_SIZE, IMG_SIZE):
            import cv2 as cv

            img = cv.resize(img, (IMG_SIZE, IMG_SIZE))
        images[i] = img
        if "camera" in hd.get("left", {}):
            camera_in[i] = np.asarray(hd["left"]["camera"], np.float32)
        else:
            have_camera = False
        for hand in ("left", "right"):
            labels[f"v3d_{hand}"][i] = hd[hand]["verts3d"]
            labels[f"j3d_{hand}"][i] = hd[hand]["joints3d"]
            labels[f"v2d_{hand}"][i] = hd[hand]["verts2d"]
            labels[f"j2d_{hand}"][i] = hd[hand]["joints2d"]
            if mano is not None and "pose" in hd[hand]:
                import cv2 as cv

                root_aa = cv.Rodrigues(
                    np.asarray(hd[hand]["R"], np.float64).reshape(3, 3)
                )[0].reshape(3)
                pca = np.asarray(hd[hand]["pose"], np.float64).reshape(45)
                m = mano[hand]
                axis = pca @ np.asarray(m.hands_components, np.float64) \
                    + np.asarray(m.hands_mean, np.float64)
                labels[f"pose_{hand}"][i] = np.concatenate([root_aa, axis])
                labels[f"shape_{hand}"][i] = np.asarray(
                    hd[hand]["shape"], np.float32).reshape(10)
    images.flush()
    if have_camera and n > 0:
        labels["camera_in"] = camera_in
    np.savez(os.path.join(out_dir, f"{split}_labels.npz"), **labels)
    return n


def make_synthetic_packed(root: str, split: str, assets, n: int = 64,
                          seed: int = 0, render_images: bool = False,
                          reuse: bool = True,
                          scene: bool | None = None) -> "PackedInterHand":
    """Write a small synthetic packed dataset (tests / smoke runs).

    With `render_images`, images are rasterized renders of the labeled
    hands over procedural backgrounds (a LEARNABLE image->pose task —
    used by convergence runs); otherwise uint8 noise (cheap fixtures
    where pixel content is irrelevant). `scene` (default: follow
    `render_images`) switches the generator to the shared-camera
    interacting-hands layout (`synthetic_batch(scene=True)`) so rendered
    datasets look like real InterHand crops — frame-filling hand pairs
    with a real `root_rel`. `reuse` skips regeneration when a dataset
    with the same (n, seed, render_images, scene) already exists —
    resumed runs see identical data.
    """
    import json as _json

    import jax

    from renderih_tpu.data.synthetic import synthetic_batch

    os.makedirs(root, exist_ok=True)
    if scene is None:
        scene = render_images
    meta_path = os.path.join(root, f"{split}_meta.json")
    meta = {"n": n, "seed": seed, "render_images": bool(render_images),
            "scene": bool(scene), "albedo": "dense_v1"}
    if reuse and os.path.exists(meta_path):
        try:
            if _json.load(open(meta_path)) == meta:
                return PackedInterHand.load(root, split)
        except Exception:
            pass  # malformed meta: regenerate
    batch = synthetic_batch(assets, jax.random.PRNGKey(seed), batch_size=n,
                            img_size=IMG_SIZE, with_cam=render_images,
                            with_img=False, scene=scene)
    images = np.memmap(
        os.path.join(root, f"{split}_images.u8"), dtype=np.uint8,
        mode="w+", shape=(n, IMG_SIZE, IMG_SIZE, 3),
    )
    if render_images:
        import jax.numpy as jnp

        from renderih_tpu.assets import _dense_color_from_template
        from renderih_tpu.render.backgrounds import random_background
        from renderih_tpu.render.renderer import TwoHandRenderer

        renderer = TwoHandRenderer(assets, img_size=IMG_SIZE)
        # Per-vertex template-coordinate albedo (the dense-color stand-in,
        # stable across samples). A flat-colored near-spherical blob gives
        # the network no correspondence/orientation cue — with it, 3D pose
        # is unobservable and training stalls at the mean pose (~48 mm
        # PA-MPJPE floor, round-4 runs); distinct stable vertex colors
        # make image->vertex correspondence (and hence pose) learnable.
        # Counterpart of the reference pipeline's textured MANO renders
        # (`rendering_code/step4_load_mano_diffbg.py`).
        albedo_one = jnp.concatenate([
            jnp.asarray(_dense_color_from_template(assets.left.mano),
                        jnp.float32),
            jnp.asarray(_dense_color_from_template(assets.right.mano),
                        jnp.float32)], axis=0)  # (2V, 3)
        # Rasterizer intermediates are (chunk, row_block*W, F) f32 per
        # lax.map step — chunk=64 at 256^2 x 3076 faces is ~3.2 GB per
        # buffer and OOMs v5e HBM. chunk=8 bounds the step to ~400 MB.
        chunk = min(8, n)

        @jax.jit
        def render_chunk(sc_l, tr_l, sc_r, tr_r, vl, vr, key):
            albedo = jnp.broadcast_to(
                albedo_one, (vl.shape[0],) + albedo_one.shape)
            rgb, mask = renderer.render_rgb_orth(
                {"left": sc_l, "right": sc_r},
                {"left": tr_l, "right": tr_r}, vl, vr, albedo=albedo)
            bg = random_background(key, vl.shape[0], IMG_SIZE)
            img01 = jnp.where(mask[..., None] > 0, rgb, bg)
            return jnp.clip(img01 * 255.0 + 0.5, 0, 255).astype(jnp.uint8)

        for s in range(0, n, chunk):
            e = min(s + chunk, n)
            sl = slice(s, e)
            pad = chunk - (e - s)  # fixed-size chunks: compile once

            def take(x):
                x = jnp.asarray(x)[sl]
                return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))

            out = render_chunk(
                take(batch["cam_scale_left"]), take(batch["cam_trans_left"]),
                take(batch["cam_scale_right"]), take(batch["cam_trans_right"]),
                take(batch["v3d_left"]), take(batch["v3d_right"]),
                jax.random.fold_in(jax.random.PRNGKey(seed + 1), s))
            images[sl] = np.asarray(out)[: e - s]
    else:
        rng = np.random.default_rng(seed)
        images[:] = rng.integers(0, 255, images.shape, dtype=np.uint8)
    images.flush()
    labels = {k: np.zeros((n,) + _label_shape(k), np.float32)
              for k in LABEL_KEYS}
    for k in ("v3d_left", "j3d_left", "v2d_left", "j2d_left",
              "v3d_right", "j3d_right", "v2d_right", "j2d_right"):
        labels[k] = np.asarray(batch[k], np.float32)
    np.savez(os.path.join(root, f"{split}_labels.npz"), **labels)
    with open(meta_path, "w") as f:
        _json.dump(meta, f)
    return PackedInterHand.load(root, split)
