"""Structured training-metrics logging (JSONL + optional TensorBoard).

Replaces the reference's plain-text rank-0 log lines + commented-out
SummaryWriter scaffolding (`core/lijun_trainer.py:318-340`,
`utils/tb_utils.py`): every record is one JSON line in
`{dir}/metrics.jsonl`, trivially machine-readable; TensorBoard output is
attempted when the package exists, silently skipped otherwise.

`write_image` covers the reference's render-to-TB training visualization
(`utils/tb_utils.py:48-111`, `core/vis_train.py:64` — drawing predicted
meshes over the input images): images land as PNGs under `{dir}/vis/`
AND in TensorBoard when available, so training health is inspectable
without TB too.
"""

from __future__ import annotations

import json
import os
import time


class MetricsWriter:
    def __init__(self, out_dir: str, filename: str = "metrics.jsonl"):
        os.makedirs(out_dir, exist_ok=True)
        self._path = os.path.join(out_dir, filename)
        self._file = open(self._path, "a", buffering=1)
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter  # optional

            self._tb = SummaryWriter(os.path.join(out_dir, "tb"))
        except Exception:
            self._tb = None

    def write(self, step: int, metrics: dict, prefix: str = "") -> None:
        record = {"step": int(step), "time": time.time()}
        for k, v in metrics.items():
            try:
                record[f"{prefix}{k}"] = float(v)
            except (TypeError, ValueError):
                continue
        self._file.write(json.dumps(record) + "\n")
        if self._tb is not None:
            for k, v in record.items():
                if k not in ("step", "time"):
                    self._tb.add_scalar(k, v, step)

    def write_image(self, step: int, tag: str, img) -> None:
        """Save one HxWx3 image (uint8 or float [0,1]) as a PNG under
        `{dir}/vis/` and to TensorBoard when available."""
        import numpy as np

        img = np.asarray(img)
        if img.dtype != np.uint8:
            img = (np.clip(img, 0.0, 1.0) * 255).astype(np.uint8)
        vis_dir = os.path.join(os.path.dirname(self._path), "vis")
        os.makedirs(vis_dir, exist_ok=True)
        safe = tag.replace("/", "_")
        try:
            from PIL import Image

            Image.fromarray(img).save(
                os.path.join(vis_dir, f"{safe}_step{int(step):07d}.png"))
        except Exception:
            pass
        if self._tb is not None:
            self._tb.add_image(tag, img, step, dataformats="HWC")

    def close(self) -> None:
        self._file.close()
        if self._tb is not None:
            self._tb.close()
