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
    """

    def __init__(self, it: Iterable, buffer_size: int = 2,
                 place: Callable | None = None):
        self._q: queue.Queue = queue.Queue(maxsize=buffer_size)
        self._place = place or jax.device_put
        self._err: BaseException | None = None

        def worker():
            try:
                for batch in it:
                    self._q.put(self._place(batch))
            except BaseException as e:  # propagate into the consumer
                self._err = e
            finally:
                self._q.put(_SENTINEL)

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

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
