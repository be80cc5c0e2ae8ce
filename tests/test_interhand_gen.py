"""Format-contract test for the InterHand2.6M preprocessing generator.

Builds a tiny fake of the OFFICIAL InterHand2.6M release layout —
`{root}/images/{split}/...` plus
`{root}/annotations/{split}/InterHand2.6M_{split}_{data,camera,MANO_NeuralAnnot}.json`
with the exact field names, key types, and units the official release uses
(pinned from the reference reader `utils/dataset_gen/interhand.py:88-183`:
int capture/frame_idx/camera ids in `_data.json`, *string* keys in
`_camera.json`/`_MANO_NeuralAnnot.json`, `campos` in millimetres, `camrot`
a row-major 3x3, world frame in metres) — and runs
`tools/dataset_gen/interhand_gen.py` end to end on it.

Contract points verified:
  * frame selection: `interacting`-only by default; frames whose MANO fit
    is missing (NeuralAnnot `null`) are skipped.
  * the flat-hand-mean fold: NeuralAnnot poses exclude `hands_mean`; the
    reference folds it back via its full-rank axis2pca -> pca2axis round
    trip (`utils/dataset_gen/interhand.py:164-167` with
    `models/manolayer.py:163-181`), so packed verts AND packed `pose_*`
    labels must correspond to `annot45 + hands_mean`.
  * camera math: v3d == camrot @ (v_world - campos/1000)
    (`utils/dataset_gen/interhand.py:131-138`).
  * projection + crop: v2d == M_crop . hom(project(v3d)) with the
    reference `cut_img` matrix (bbox ratio 0.8, 256^2 output,
    `dataset/dataset_utils.py:12-42`).
  * single-hand packing (`--hand_type right`): absent hand zero-filled.
"""

import importlib.util
import json
import os
import sys

import numpy as np
import pytest

cv = pytest.importorskip("cv2")

from renderih_tpu.data.interhand import IMG_SIZE, PackedInterHand
from renderih_tpu.mano.params import make_synthetic_mano

_TOOLS = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "tools", "dataset_gen"))


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(_TOOLS, name + ".py"))
    mod = importlib.util.module_from_spec(spec)
    sys.path.insert(0, _TOOLS)
    spec.loader.exec_module(mod)
    return mod


def _save_mano_npz(model, path):
    from renderih_tpu.mano.params import MANO_PARENTS

    np.savez(
        path,
        v_template=np.asarray(model.v_template),
        shapedirs=np.asarray(model.shapedirs),
        posedirs=np.asarray(model.posedirs),
        J_regressor=np.asarray(model.J_regressor),
        weights=np.asarray(model.weights),
        hands_components=np.asarray(model.hands_components),
        hands_mean=np.asarray(model.hands_mean),
        faces=np.asarray(model.faces),
        kintree_parents=np.asarray(MANO_PARENTS, np.int32),
        is_right=np.asarray(bool(model.is_right), np.bool_),
    )


# Camera: identity rotation, 600 mm behind the origin on -z, so hands at
# the world origin sit ~0.6 m in front of the camera.
CAMPOS_MM = [0.0, 0.0, -600.0]
CAMROT = np.eye(3).tolist()
FOCAL = [500.0, 500.0]
PRINCPT = [256.0, 167.0]
RAW_W, RAW_H = 512, 334


def _mano_annot(rng, dz):
    return {
        "pose": rng.normal(0.0, 0.15, 48).tolist(),
        "shape": rng.normal(0.0, 0.5, 10).tolist(),
        "trans": [float(rng.normal(0.0, 0.01)),
                  float(rng.normal(0.0, 0.01)), dz],
    }


@pytest.fixture(scope="module")
def official_tree(tmp_path_factory):
    """Fake official release: 4 annotated frames across 2 captures."""
    root = tmp_path_factory.mktemp("interhand_official")
    split = "test"
    rng = np.random.default_rng(7)

    img_dir = root / "images" / split
    ann_dir = root / "annotations" / split
    ann_dir.mkdir(parents=True)

    images, annotations, mano = [], [], {}
    specs = [
        # (image_id, capture, frame, hand_type, has_mano)
        (11, 0, 100, "interacting", True),
        (12, 0, 101, "right", True),
        (13, 1, 200, "interacting", False),  # NeuralAnnot null -> skipped
        (14, 1, 201, "interacting", True),
    ]
    for img_id, cap, frame, ht, has_mano in specs:
        fname = f"Capture{cap}/cam400002/image{frame}.png"
        path = img_dir / fname
        path.parent.mkdir(parents=True, exist_ok=True)
        raw = rng.integers(0, 255, (RAW_H, RAW_W, 3), np.uint8)
        assert cv.imwrite(str(path), raw)
        images.append({
            "id": img_id, "file_name": fname, "width": RAW_W,
            "height": RAW_H, "capture": cap, "subject": 3,
            "seq_name": "0100_fake", "camera": 400002, "frame_idx": frame,
        })
        annotations.append({
            "id": img_id * 10, "image_id": img_id, "hand_type": ht,
            "hand_type_valid": 1,
        })
        entry = None
        if has_mano:
            entry = {
                "right": _mano_annot(rng, 0.02),
                "left": _mano_annot(rng, -0.02) if ht == "interacting"
                else None,
            }
        mano.setdefault(str(cap), {})[str(frame)] = entry

    with open(ann_dir / f"InterHand2.6M_{split}_data.json", "w") as f:
        json.dump({"images": images, "annotations": annotations}, f)
    with open(ann_dir / f"InterHand2.6M_{split}_camera.json", "w") as f:
        json.dump({str(c): {
            "campos": {"400002": CAMPOS_MM},
            "camrot": {"400002": CAMROT},
            "focal": {"400002": FOCAL},
            "princpt": {"400002": PRINCPT},
        } for c in (0, 1)}, f)
    with open(ann_dir / f"InterHand2.6M_{split}_MANO_NeuralAnnot.json",
              "w") as f:
        json.dump(mano, f)

    right = make_synthetic_mano(seed=0, is_right=True)
    left = make_synthetic_mano(seed=0, is_right=False)
    _save_mano_npz(right, root / "mano_right.npz")
    _save_mano_npz(left, root / "mano_left.npz")
    return root, split, mano


def _run_gen(root, split, out, hand_type="interacting"):
    gen = _load("interhand_gen")
    gen.main([
        "--data", str(root), "--split", split,
        "--mano-left", str(root / "mano_left.npz"),
        "--mano-right", str(root / "mano_right.npz"),
        "--out", str(out), "--hand_type", hand_type,
    ])
    return PackedInterHand.load(str(out), split, use_native=False)


def _expected_hand(root, hand, annot):
    """Independent recomputation of one hand's packed labels."""
    import jax.numpy as jnp

    from renderih_tpu.mano.layer import mano_forward
    from renderih_tpu.mano.params import fix_left_shapedirs, load_mano_npz
    from renderih_tpu.ops.rotation import rodrigues

    right = load_mano_npz(str(root / "mano_right.npz"))
    model = right if hand == "right" else fix_left_shapedirs(
        load_mano_npz(str(root / "mano_left.npz")), right)

    pose = np.asarray(annot["pose"], np.float64)
    pose45 = pose[3:] + np.asarray(model.hands_mean, np.float64)
    rootR = rodrigues(jnp.asarray(pose[None, :3], jnp.float32))
    v_w, j_w = mano_forward(
        model, rootR, jnp.asarray(pose45[None], jnp.float32),
        jnp.asarray(np.asarray(annot["shape"], np.float32)[None]),
        trans=jnp.asarray(np.asarray(annot["trans"], np.float32)[None]),
        center_idx=None, use_pca=False)
    v_w, j_w = np.asarray(v_w[0], np.float64), np.asarray(j_w[0], np.float64)

    R = np.asarray(CAMROT)
    t = np.asarray(CAMPOS_MM) / 1000.0
    v_c = (R @ (v_w - t).T).T
    j_c = (R @ (j_w - t).T).T

    def proj(x):
        return x[:, :2] / x[:, 2:3] * np.asarray(FOCAL) + np.asarray(PRINCPT)

    return v_c, j_c, proj(v_c), proj(j_c), np.concatenate([pose[:3], pose45])


def _crop_matrix(pts_list, radio=0.8):
    mins = np.min([p.min(axis=0) for p in pts_list], axis=0)
    maxs = np.max([p.max(axis=0) for p in pts_list], axis=0)
    mid = (mins + maxs) / 2
    L = np.max(maxs - mins) / 2 / radio
    return IMG_SIZE / 2 / L * np.array(
        [[1, 0, L - mid[0]], [0, 1, L - mid[1]]])


def test_interacting_pack(official_tree, tmp_path):
    root, split, mano = official_tree
    ds = _run_gen(root, split, tmp_path / "packed")

    # 2 interacting frames with MANO; the 'right' frame and the
    # null-NeuralAnnot frame are dropped.
    assert len(ds) == 2
    batch = ds.batch(np.arange(2))
    assert batch["img_u8"].shape == (2, IMG_SIZE, IMG_SIZE, 3)
    assert batch["img_u8"].any(), "crop produced an all-black image"

    for i, (cap, frame) in enumerate([("0", "100"), ("1", "201")]):
        exp = {h: _expected_hand(root, h, mano[cap][frame][h])
               for h in ("left", "right")}
        M = _crop_matrix([exp[h][k] for h in ("left", "right")
                          for k in (2, 3)])

        for hand in ("left", "right"):
            v_c, j_c, v2d, j2d, pose_full = exp[hand]
            np.testing.assert_allclose(
                batch[f"v3d_{hand}"][i], v_c, atol=1e-6)
            np.testing.assert_allclose(
                batch[f"j3d_{hand}"][i], j_c, atol=1e-6)
            hom = lambda x: np.concatenate(
                [x, np.ones_like(x[:, :1])], -1) @ M.T
            np.testing.assert_allclose(
                batch[f"v2d_{hand}"][i], hom(v2d), atol=1e-3)
            np.testing.assert_allclose(
                batch[f"j2d_{hand}"][i], hom(j2d), atol=1e-3)
            # pose labels are the *evaluated* rotations (mean folded in)
            np.testing.assert_allclose(
                batch[f"pose_{hand}"][i], pose_full, atol=1e-6)
            # cropped 2d labels land inside the 256^2 frame (ratio 0.8)
            assert batch[f"v2d_{hand}"][i].min() > -1.0
            assert batch[f"v2d_{hand}"][i].max() < IMG_SIZE + 1.0


def test_pack_reference_layout(official_tree, tmp_path):
    """`pack_reference_dataset` on a fake of the reference's PREPROCESSED
    layout ({split}/img/{i}.jpg + {split}/anno/{i}.pkl +
    {split}/ori_handdict/{i}.npy). Pose contract: ori_handdict stores
    pose as 45 PCA coefficients + root rotmat `R`
    (`utils/dataset_gen/interhand.py:164-175`); packing converts to our
    48-d evaluated axis-angle [rodrigues(R), pca @ C + mean]."""
    import pickle

    from renderih_tpu.data.interhand import pack_reference_dataset
    from renderih_tpu.mano.params import load_mano_npz

    root, split, _ = official_tree
    rng = np.random.default_rng(3)
    src = tmp_path / "refdata"
    for d in ("img", "anno", "ori_handdict"):
        (src / split / d).mkdir(parents=True)

    mano = {"left": load_mano_npz(str(root / "mano_left.npz")),
            "right": load_mano_npz(str(root / "mano_right.npz"))}
    n = 2
    truth = []
    for i in range(n):
        img = rng.integers(0, 255, (IMG_SIZE, IMG_SIZE, 3), np.uint8)
        assert cv.imwrite(str(src / split / "img" / f"{i}.jpg"), img)
        with open(src / split / "anno" / f"{i}.pkl", "wb") as f:
            pickle.dump({}, f)
        hd = {}
        for hand in ("left", "right"):
            aa = rng.normal(0.0, 0.3, 3)
            R = cv.Rodrigues(aa)[0][None]  # (1, 3, 3) like the reference
            hd[hand] = {
                "verts3d": rng.normal(size=(778, 3)).astype(np.float32),
                "joints3d": rng.normal(size=(21, 3)).astype(np.float32),
                "verts2d": rng.uniform(0, 256, (778, 2)).astype(np.float32),
                "joints2d": rng.uniform(0, 256, (21, 2)).astype(np.float32),
                "R": R.astype(np.float32),
                "pose": rng.normal(0.0, 0.5, (1, 45)).astype(np.float32),
                "shape": rng.normal(0.0, 0.5, (1, 10)).astype(np.float32),
                "camera": np.eye(3, dtype=np.float32),
            }
        np.save(src / split / "ori_handdict" / f"{i}.npy", hd)
        truth.append(hd)

    out = tmp_path / "packed_ref"
    got = pack_reference_dataset(
        str(src), split, str(out),
        mano_left=str(root / "mano_left.npz"),
        mano_right=str(root / "mano_right.npz"))
    assert got == n

    ds = PackedInterHand.load(str(out), split, use_native=False)
    batch = ds.batch(np.arange(n))
    for i in range(n):
        for hand in ("left", "right"):
            hd = truth[i][hand]
            np.testing.assert_allclose(
                batch[f"v3d_{hand}"][i], hd["verts3d"], atol=1e-6)
            root_aa = cv.Rodrigues(
                np.asarray(hd["R"], np.float64).reshape(3, 3))[0].reshape(3)
            m = mano[hand]
            axis = (hd["pose"].reshape(45).astype(np.float64)
                    @ np.asarray(m.hands_components, np.float64)
                    + np.asarray(m.hands_mean, np.float64))
            np.testing.assert_allclose(
                batch[f"pose_{hand}"][i],
                np.concatenate([root_aa, axis]), atol=1e-5)
            np.testing.assert_allclose(
                batch[f"shape_{hand}"][i], hd["shape"].reshape(10),
                atol=1e-6)


def test_single_hand_pack(official_tree, tmp_path):
    root, split, mano = official_tree
    ds = _run_gen(root, split, tmp_path / "packed_r", hand_type="right")

    assert len(ds) == 1  # only the one 'right' frame
    batch = ds.batch(np.arange(1))
    # absent left hand zero-filled (reference `utils/interhand_single.py`)
    assert not batch["v3d_left"].any()
    assert not batch["pose_left"].any()
    assert batch["v3d_right"].any()

    v_c, j_c, v2d, j2d, pose_full = _expected_hand(
        root, "right", mano["0"]["101"]["right"])
    np.testing.assert_allclose(batch["v3d_right"][0], v_c, atol=1e-6)
    np.testing.assert_allclose(batch["pose_right"][0], pose_full, atol=1e-6)


# ---------------------------------------------------------------------------
# Adversarial official-format fixtures: malformed entries must fail with a
# CLEAR error naming the offending capture/frame/hand — never silently pack
# garbage. Contract source: `utils/dataset_gen/interhand.py:88-183,252-291`.
# ---------------------------------------------------------------------------

import shutil


def _clone_tree(official_tree, tmp_path, mutate):
    """Copy the fake official release and let `mutate(data, cams, mano)`
    corrupt the JSON dicts before re-writing them."""
    root, split, _ = official_tree
    dst = tmp_path / "mutated"
    shutil.copytree(root, dst)
    ann = dst / "annotations" / split
    names = {
        "data": ann / f"InterHand2.6M_{split}_data.json",
        "camera": ann / f"InterHand2.6M_{split}_camera.json",
        "mano": ann / f"InterHand2.6M_{split}_MANO_NeuralAnnot.json",
    }
    loaded = {k: json.load(open(p)) for k, p in names.items()}
    mutate(loaded["data"], loaded["camera"], loaded["mano"])
    for k, p in names.items():
        with open(p, "w") as f:
            json.dump(loaded[k], f)
    return dst, split


def _gen_argv(root, split, out, hand_type="interacting"):
    return ["--data", str(root), "--split", split,
            "--mano-left", str(root / "mano_left.npz"),
            "--mano-right", str(root / "mano_right.npz"),
            "--out", str(out), "--hand_type", hand_type]


def test_malformed_pose_length_clear_error(official_tree, tmp_path):
    def mutate(data, cams, mano):
        mano["0"]["100"]["right"]["pose"] = [0.0] * 45  # 48 expected

    root, split = _clone_tree(official_tree, tmp_path, mutate)
    gen = _load("interhand_gen")
    with pytest.raises(ValueError, match=r"capture 0 frame 100.*'right'.*"
                                         r"'pose' has 45 values"):
        gen.main(_gen_argv(root, split, tmp_path / "out"))


def test_non_numeric_trans_clear_error(official_tree, tmp_path):
    def mutate(data, cams, mano):
        mano["1"]["201"]["left"]["trans"] = ["a", "b", "c"]

    root, split = _clone_tree(official_tree, tmp_path, mutate)
    gen = _load("interhand_gen")
    with pytest.raises(ValueError, match=r"capture 1 frame 201.*'left'"):
        gen.main(_gen_argv(root, split, tmp_path / "out"))


def test_non_dict_mano_entry_clear_error(official_tree, tmp_path):
    def mutate(data, cams, mano):
        mano["0"]["100"]["right"] = [1.0, 2.0]  # not a dict

    root, split = _clone_tree(official_tree, tmp_path, mutate)
    gen = _load("interhand_gen")
    with pytest.raises(ValueError, match="expected a dict"):
        gen.main(_gen_argv(root, split, tmp_path / "out"))


def test_nested_pose_arrays_accepted(official_tree, tmp_path):
    """Real-world NeuralAnnot exports sometimes nest (1, 48) — accept."""
    def mutate(data, cams, mano):
        for cap in mano.values():
            for frame in cap.values():
                if not frame:
                    continue
                for hand in frame.values():
                    if hand:
                        hand["pose"] = [hand["pose"]]  # (1, 48)
                        hand["shape"] = [hand["shape"]]

    root, split = _clone_tree(official_tree, tmp_path, mutate)
    gen = _load("interhand_gen")
    out = tmp_path / "out_nested"
    gen.main(_gen_argv(root, split, out))
    got = PackedInterHand.load(str(out), split, use_native=False)
    assert len(got) == 2
    assert got.batch(np.arange(2))["v3d_right"].any()


def test_unknown_image_id_clear_error(official_tree, tmp_path):
    def mutate(data, cams, mano):
        data["annotations"][0]["image_id"] = 999

    root, split = _clone_tree(official_tree, tmp_path, mutate)
    gen = _load("interhand_gen")
    with pytest.raises(ValueError, match="image_id 999"):
        gen.main(_gen_argv(root, split, tmp_path / "out"))


def test_missing_camera_clear_error(official_tree, tmp_path):
    def mutate(data, cams, mano):
        del cams["0"]["campos"]["400002"]

    root, split = _clone_tree(official_tree, tmp_path, mutate)
    gen = _load("interhand_gen")
    with pytest.raises(ValueError, match="camera '400002' of capture '0'"):
        gen.main(_gen_argv(root, split, tmp_path / "out"))


def test_missing_image_file_clear_error(official_tree, tmp_path):
    root, split = _clone_tree(official_tree, tmp_path,
                              lambda *a: None)
    victim = (root / "images" / split / "Capture0" / "cam400002"
              / "image100.png")
    victim.unlink()
    gen = _load("interhand_gen")
    with pytest.raises(FileNotFoundError, match="image100.png"):
        gen.main(_gen_argv(root, split, tmp_path / "out"))


def test_left_single_hand_pack(official_tree, tmp_path):
    """--hand_type left on a tree with no left-only frames -> 0 frames,
    valid (empty) pack, no crash."""
    root, split, _ = official_tree
    gen = _load("interhand_gen")
    out = tmp_path / "packed_l"
    gen.main(_gen_argv(root, split, out, hand_type="left"))
    labels = np.load(out / f"{split}_labels.npz")
    assert labels["v3d_left"].shape[0] == 0
