"""Observability: metrics writing + profiling hooks.

The reference has only rank-0 Python logging and an unused TensorBoard
writer (SURVEY.md §5). Here metrics are first-class: JSONL event stream
(always), optional TensorBoard when the package exists, and `jax.profiler`
trace capture around training steps for XLA-level performance work.
"""
from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Any


class MetricsWriter:
    """Append-only JSONL metrics stream + optional TensorBoard mirror."""

    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, "metrics.jsonl")
        self._f = open(self.path, "a", buffering=1)
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir)
            except Exception:
                self._tb = None

    def write(self, step: int, metrics: dict[str, Any]):
        rec = {"step": step, "time": time.time()}
        rec.update({k: float(v) for k, v in metrics.items()})
        self._f.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            for k, v in metrics.items():
                self._tb.add_scalar(k, float(v), step)

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()


def read_metrics(log_dir: str) -> list[dict]:
    path = os.path.join(log_dir, "metrics.jsonl")
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


@contextlib.contextmanager
def profile_trace(log_dir: str | None):
    """Capture a jax.profiler trace (view with TensorBoard or xprof)."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling steps/sec with device-sync on read (train:693-702 parity)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._t0 = time.time()
        self._n = 0

    def tick(self, n: int = 1):
        self._n += n

    @property
    def steps_per_sec(self) -> float:
        dt = time.time() - self._t0
        return self._n / dt if dt > 0 else float("inf")
