"""Structured training-metrics logging (JSONL + optional TensorBoard).

Replaces the reference's plain-text rank-0 log lines + commented-out
SummaryWriter scaffolding (`core/lijun_trainer.py:318-340`,
`utils/tb_utils.py`): every record is one JSON line in
`{dir}/metrics.jsonl`, trivially machine-readable; TensorBoard output is
attempted when the package exists, silently skipped otherwise.
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

    def close(self) -> None:
        self._file.close()
        if self._tb is not None:
            self._tb.close()
