"""Profiling / timing utilities.

Parity with the reference's (mostly dormant) tracing surface — the
warm-up `Timer` (`common/timer.py:10-38`) and `AverageMeter`
(`common/logger.py:17-32`) — plus what the reference lacks and a TPU
deployment actually needs:

* `device_timer` blocks on device completion (`block_until_ready`)
  before reading the clock, so timings measure the XLA program and not
  just the dispatch (the reference's `time.time()` around a CUDA launch
  under-reports, `apps/eval_interhand.py:310-312`).
* `trace` wraps `jax.profiler.trace` to capture a TensorBoard-viewable
  XLA trace (HLO, fusion, per-op device time) for any code region.
"""

from __future__ import annotations

import contextlib
import time

import jax


class AverageMeter:
    """Running average (`common/logger.py:17-32`)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1):
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum / self.count if self.count else 0.0


class Timer:
    """Wall-clock timer whose average skips warm-up calls.

    The reference's `Timer` (`common/timer.py:10-38`) divides by
    `calls - warm_up` so the first (compile-dominated) iterations do not
    pollute the average — exactly the right semantics for jitted code.
    """

    def __init__(self, warm_up: int = 1):
        self.warm_up = warm_up
        self.reset()

    def reset(self):
        self.calls = 0
        self.total_time = 0.0
        self.diff = 0.0
        self._start = None

    def tic(self):
        self._start = time.perf_counter()

    def toc(self, average: bool = True) -> float:
        self.diff = time.perf_counter() - self._start
        self.calls += 1
        if self.calls > self.warm_up:
            self.total_time += self.diff
        return self.average_time if average else self.diff

    @property
    def average_time(self) -> float:
        timed = self.calls - self.warm_up
        return self.total_time / timed if timed > 0 else self.diff

    @contextlib.contextmanager
    def time(self):
        self.tic()
        try:
            yield self
        finally:
            self.toc()


@contextlib.contextmanager
def device_timer(result_holder: dict, key: str = "seconds"):
    """Time a block including device execution.

    Usage:
        t = {}
        with device_timer(t):
            out = step(...)         # async dispatch
            t["out"] = out          # anything stored is block_until_ready'd
        print(t["seconds"])
    """
    start = time.perf_counter()
    try:
        yield result_holder
    finally:
        for v in list(result_holder.values()):
            try:
                jax.block_until_ready(v)
            except Exception:
                pass
        result_holder[key] = time.perf_counter() - start


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture an XLA profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
