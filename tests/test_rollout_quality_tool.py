"""Pure helpers of tools/rollout_quality_experiment.py (the north-star
rollout QUALITY harness; the device-heavy main() is exercised on TPU and
its artifact committed as docs/artifacts/rollout_quality_1000.json)."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.rollout_quality_experiment import bucket_slices  # noqa: E402


def test_bucket_slices_partition_horizon():
    out = bucket_slices(1000, [32, 128, 512, 1000])
    assert [label for label, _ in out] == ["32", "128", "512", "1000"]
    # contiguous, disjoint, covering [0, 1000)
    prev = 0
    for _, sl in out:
        assert sl.start == prev
        assert sl.stop > sl.start
        prev = sl.stop
    assert prev == 1000
    # buckets index a horizon-length series without overlap
    series = np.zeros(1000)
    for _, sl in out:
        series[sl] += 1
    assert (series == 1).all()


def test_bucket_slices_drops_buckets_beyond_horizon():
    out = bucket_slices(100, [32, 128, 512])
    assert [label for label, _ in out] == ["32"]
    assert out[0][1] == slice(0, 32)
