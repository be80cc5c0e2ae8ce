"""Ego3DHands / H2O3D converter tests on synthetic raw fixtures."""

import argparse
import importlib.util
import os
import pickle
import sys

import numpy as np
import pytest

cv = pytest.importorskip("cv2")

_TOOLS = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "tools", "dataset_gen"))


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(_TOOLS, name + ".py"))
    mod = importlib.util.module_from_spec(spec)
    sys.path.insert(0, _TOOLS)
    spec.loader.exec_module(mod)
    return mod


def test_ego3d_converter(tmp_path):
    gen = _load("other_datasets_gen")
    rng = np.random.default_rng(0)
    data = tmp_path / "raw"
    for i in range(3):
        d = data / f"seq{i}"
        d.mkdir(parents=True)
        img = rng.integers(0, 255, (480, 640, 3), np.uint8)
        cv.imwrite(str(d / "color_new.png"), img)
        j2d = rng.uniform(0.2, 0.8, (2, 22, 2))  # normalized (row, col)
        j3d = rng.normal(size=(2, 22, 3))
        np.save(d / "location_2d.npy", j2d)
        np.save(d / "location_3d_canonical.npy", j3d)

    out = tmp_path / "packed"
    gen.convert_ego3d(argparse.Namespace(
        data=str(data), split="train", out=str(out), limit=None))

    labels = np.load(out / "train_labels.npz")
    assert labels["j3d_left"].shape == (3, 21, 3)
    assert np.all(np.isfinite(labels["j2d_right"]))
    # 2D labels land inside the 256 crop (crop is built from the joints)
    assert labels["j2d_left"].min() > -1 and labels["j2d_left"].max() < 257
    img = np.memmap(out / "train_images.u8", dtype=np.uint8,
                    shape=(3, 256, 256, 3))
    assert img.max() > 0

    import json
    meta = json.load(open(out / "train_meta.json"))
    assert meta["joints_only"] and meta["count"] == 3


def test_h2o3d_converter_joints_only(tmp_path):
    gen = _load("other_datasets_gen")
    rng = np.random.default_rng(1)
    data = tmp_path / "h2o3d"
    seq = data / "train" / "ABC1" / "rgb"
    meta_dir = data / "train" / "ABC1" / "meta"
    seq.mkdir(parents=True)
    meta_dir.mkdir(parents=True)

    names = []
    for i in range(2):
        f = f"{i:04d}"
        names.append(f"ABC1/{f}")
        img = rng.integers(0, 255, (480, 640, 3), np.uint8)
        cv.imwrite(str(seq / (f + ".jpg")), img)
        cam = np.array([[600.0, 0, 320.0], [0, 600.0, 240.0], [0, 0, 1]])
        anno = {
            "camMat": cam,
            # OpenGL frame: negative z in front of the camera
            "rightHandJoints3D": rng.normal(0, 0.03, (21, 3)) + [0, 0, -0.5],
            "leftHandJoints3D": rng.normal(0, 0.03, (21, 3)) + [0.1, 0, -0.5],
            "rightHandPose": rng.normal(0, 0.1, (48,)),
            "leftHandPose": rng.normal(0, 0.1, (48,)),
            "rightHandTrans": np.zeros(3),
            "leftHandTrans": np.zeros(3),
            "handBeta": np.zeros(10),
        }
        with open(meta_dir / (f + ".pkl"), "wb") as fh:
            pickle.dump(anno, fh)
    with open(data / "train.txt", "w") as fh:
        fh.write("\n".join(names) + "\n")

    out = tmp_path / "packed"
    gen.convert_h2o3d(argparse.Namespace(
        data=str(data), mode="train", split="train", out=str(out),
        mano_left=None, mano_right=None, limit=None))

    labels = np.load(out / "train_labels.npz")
    assert labels["j3d_right"].shape == (2, 21, 3)
    # OpenGL -> OpenCV: z becomes positive (in front of the camera)
    assert np.all(labels["j3d_right"][..., 2] > 0)
    assert labels["j2d_left"].min() > -1 and labels["j2d_left"].max() < 257
