"""Mask-IoU tool: end-to-end on a synthetic packed dataset.

Reference equivalent: `utils/compute_maskiou.py` + `utils/get_maskiou.py`
render each hand separately with pytorch3d and intersect the masks; ours
uses the JAX rasterizer. The IoU vector buckets eval metrics by
interaction severity (`apps/eval_interhand.py:230-235`).
"""

import importlib.util
import os
import sys

import numpy as np

from renderih_tpu.assets import make_synthetic_assets
from renderih_tpu.data.interhand import make_synthetic_packed

_TOOL = os.path.abspath(os.path.join(
    os.path.dirname(__file__), "..", "tools", "compute_maskiou.py"))


def _load_tool():
    spec = importlib.util.spec_from_file_location("compute_maskiou", _TOOL)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_maskiou_end_to_end(tmp_path):
    assets = make_synthetic_assets(seed=0)
    dataset = make_synthetic_packed(str(tmp_path / "packed"), "test",
                                    assets, n=8)
    out = tmp_path / "iou.npy"
    tool = _load_tool()
    tool.main(["--data", str(tmp_path / "packed"), "--split", "test",
               "--out", str(out), "--res", "32", "--bs", "8"])

    iou = np.load(out)
    assert iou.shape == (len(dataset),)
    assert np.all((iou >= 0.0) & (iou <= 1.0))
    # synthetic hands share the image crop; at least some frames must
    # actually overlap, and the vector must not be constant
    assert iou.max() > 0.0
    assert iou.std() > 0.0 or len(set(np.round(iou, 5))) > 1
