"""JSONL metrics writer (reference: rank-0 text log lines,
`core/lijun_trainer.py:318-340`)."""

import json
import os

import numpy as np

from renderih_tpu.utils.metrics_writer import MetricsWriter


def test_writes_jsonl_records(tmp_path):
    w = MetricsWriter(str(tmp_path))
    w.write(1, {"total": 2.5, "vert3d": np.float32(0.25)}, prefix="train/")
    w.write(2, {"mpjpe_mm": 7.1}, prefix="eval/")
    # non-numeric values are skipped, not fatal
    w.write(3, {"note": "text", "ok": 1.0})
    w.close()

    lines = [json.loads(l) for l in
             open(os.path.join(str(tmp_path), "metrics.jsonl"))]
    assert len(lines) == 3
    assert lines[0]["step"] == 1 and lines[0]["train/total"] == 2.5
    assert lines[0]["train/vert3d"] == 0.25
    assert lines[1]["eval/mpjpe_mm"] == 7.1
    assert "note" not in lines[2] and lines[2]["ok"] == 1.0
    assert all("time" in l for l in lines)


def test_append_across_instances(tmp_path):
    MetricsWriter(str(tmp_path)).write(1, {"a": 1.0})
    w = MetricsWriter(str(tmp_path))
    w.write(2, {"a": 2.0})
    w.close()
    lines = open(os.path.join(str(tmp_path), "metrics.jsonl")).readlines()
    assert len(lines) == 2  # append mode: restart does not clobber history


def test_write_image_saves_png(tmp_path):
    """Render-to-vis path (reference `utils/tb_utils.py:48-111`)."""
    w = MetricsWriter(str(tmp_path))
    img_u8 = (np.arange(16 * 16 * 3) % 256).astype(np.uint8).reshape(16, 16, 3)
    w.write_image(7, "eval/overlay_0", img_u8)
    w.write_image(7, "eval/overlay_1", img_u8.astype(np.float32) / 255.0)
    w.close()
    vis = os.path.join(str(tmp_path), "vis")
    files = sorted(os.listdir(vis))
    assert files == ["eval_overlay_0_step0000007.png",
                     "eval_overlay_1_step0000007.png"]
    from PIL import Image

    back = np.asarray(Image.open(os.path.join(vis, files[0])))
    np.testing.assert_array_equal(back, img_u8)
