"""Asynchronous host->device batch prefetching.

Replaces the reference's torch DataLoader worker pool (fork context, 60000s
timeout workaround — train_DFOLD_dynamics.py:548-574) with a simple
double-buffering thread: while the accelerator runs step N, the host
extracts and transfers batch N+1 (and N+2, ...). With on-device
featurization (data/featurize.py) the host work is just mmap reads + stacks,
so a single thread keeps a TPU fed.
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator

import jax

_SENTINEL = object()


class DevicePrefetcher:
    """Wraps a host-batch iterator; yields device-resident batches.

    Args:
        it: source iterator of host (numpy) batches.
        buffer_size: number of in-flight device batches (2 = double buffer).
        place: batch -> device batch (default jax.device_put; pass a
            sharded placement like parallel.mesh.shard_batch for meshes).

    Abandoning the iterator mid-epoch (e.g. Experiment.train hitting
    max_steps) must call close() — otherwise the worker thread stays
    blocked in q.put holding buffer_size device-resident batches (hundreds
    of MB of HBM at flagship shapes) for the life of the process. Use as a
    context manager or rely on the consumer calling close() on early exit.
    """

    def __init__(self, it: Iterable, buffer_size: int = 2,
                 place: Callable | None = None):
        self._q: queue.Queue = queue.Queue(maxsize=buffer_size)
        self._place = place or jax.device_put
        self._err: BaseException | None = None
        self._stop = threading.Event()

        def worker():
            try:
                for batch in it:
                    placed = self._place(batch)
                    # poll the put so close() can unblock us
                    while not self._stop.is_set():
                        try:
                            self._q.put(placed, timeout=0.1)
                            break
                        except queue.Full:
                            continue
                    if self._stop.is_set():
                        return
            except BaseException as e:  # propagate into the consumer
                self._err = e
            finally:
                # The sentinel MUST be delivered (or close() observed): a
                # fast producer can fill the buffer and finish before the
                # consumer takes its first batch, and a dropped sentinel
                # (put_nowait + swallowed queue.Full) leaves the consumer
                # blocked in q.get() forever once it drains the buffer.
                while not self._stop.is_set():
                    try:
                        self._q.put(_SENTINEL, timeout=0.1)
                        break
                    except queue.Full:
                        continue

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def close(self, timeout: float = 5.0):
        """Stop the worker and release buffered device batches."""
        self._stop.set()
        while True:  # drain so a blocked put can observe the stop flag
            try:
                self._q.get_nowait()
            except queue.Empty:
                break
        self._thread.join(timeout=timeout)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __iter__(self) -> Iterator:
        while True:
            item = self._q.get()
            if item is _SENTINEL:
                if self._err is not None:
                    raise self._err
                return
            yield item


def prefetch_to_device(it: Iterable, buffer_size: int = 2, place=None):
    return DevicePrefetcher(it, buffer_size=buffer_size, place=place)
