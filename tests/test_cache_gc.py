"""Committed-compile-cache hygiene (tools/cache_gc.py + the staleness
warning in utils/compile_cache)."""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools import cache_gc  # noqa: E402


def _fill(d, names):
    for n in names:
        (d / n).write_bytes(b"x" * 100)


def test_record_then_clean(tmp_path, capsys):
    _fill(tmp_path, ["a-cache", "b-cache"])
    cache_gc.record(str(tmp_path))
    m = json.loads((tmp_path / "MANIFEST.json").read_text())
    assert set(m["entries"]) == {"a-cache", "b-cache"}
    assert m["total_bytes"] == 200
    assert cache_gc.gc(str(tmp_path), apply=False, live_dir=None) == 0


def test_orphan_detection_and_apply(tmp_path, capsys):
    _fill(tmp_path, ["a-cache"])
    cache_gc.record(str(tmp_path))
    _fill(tmp_path, ["orphan-cache"])
    assert cache_gc.gc(str(tmp_path), apply=False, live_dir=None) == 1
    assert (tmp_path / "orphan-cache").exists()  # report only
    assert cache_gc.gc(str(tmp_path), apply=True, live_dir=None) == 1
    assert not (tmp_path / "orphan-cache").exists()
    assert (tmp_path / "a-cache").exists()


def test_live_dir_compare(tmp_path):
    cache = tmp_path / "cache"
    live = tmp_path / "live"
    cache.mkdir(), live.mkdir()
    _fill(cache, ["keep-cache", "dead-cache"])
    _fill(live, ["keep-cache"])
    cache_gc.record(str(cache))
    assert cache_gc.gc(str(cache), apply=True, live_dir=str(live)) == 1
    assert (cache / "keep-cache").exists()
    assert not (cache / "dead-cache").exists()


def test_stale_toolchain_flagged(tmp_path, caplog):
    _fill(tmp_path, ["a-cache"])
    cache_gc.record(str(tmp_path))
    m = json.loads((tmp_path / "MANIFEST.json").read_text())
    m["toolchain"]["jax"] = "0.0.1-ancient"
    (tmp_path / "MANIFEST.json").write_text(json.dumps(m))
    assert cache_gc.gc(str(tmp_path), apply=False, live_dir=None) >= 1

    # the loud warning on enable_persistent_cache (the path every CLI hits)
    import logging

    from dynamicpdb_tpu.utils import compile_cache

    with caplog.at_level(logging.WARNING, logger=compile_cache.log.name):
        compile_cache._warn_if_stale(str(tmp_path))
    assert any("STALE compile cache" in r.message for r in caplog.records)
