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
