"""Serving endpoint (serve_cli): model loads once, rollouts answer over
HTTP with shape-stable padding and a compiled-fn cache. Runs a REAL
ThreadingHTTPServer on an ephemeral port and drives it with stdlib
urllib — no HTTP frameworks on either side."""
import io
import json
import threading
import urllib.error
import urllib.request

import jax
import numpy as np
import pytest

from dynamicpdb_tpu.data.synthetic import make_window
from dynamicpdb_tpu.serve_cli import RAW_KEYS, RolloutService, make_server
from dynamicpdb_tpu.train.experiment import Trainer
from tests.test_train import TINY_CFG

pytestmark = pytest.mark.heavy  # tiny-model rollout compiles


@pytest.fixture(scope="module")
def server():
    trainer = Trainer(TINY_CFG)
    window = make_window(n_res=8, frame_time=2, seed=0)
    params, _ = trainer.init_params(jax.random.PRNGKey(1), window)
    service = RolloutService(trainer, params, pad_to=8, step=7)
    srv = make_server(service, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", service
    srv.shutdown()


def _post_window(base, raw, query="n_steps=3&num_t=2"):
    buf = io.BytesIO()
    np.savez(buf, **raw)
    req = urllib.request.Request(f"{base}/rollout?{query}",
                                 data=buf.getvalue())
    with urllib.request.urlopen(req, timeout=300) as resp:
        return np.load(io.BytesIO(resp.read()))


def test_healthz(server):
    base, _ = server
    with urllib.request.urlopen(f"{base}/healthz", timeout=60) as resp:
        h = json.loads(resp.read())
    assert h["status"] == "ok"
    assert h["pad_to"] == 8 and h["step"] == 7


def test_rollout_roundtrip_and_padding(server):
    base, service = server
    raw = {k: make_window(n_res=8, frame_time=2, seed=3)[k]
           for k in RAW_KEYS}
    out = _post_window(base, raw)
    assert out["atom_traj"].shape == (3, 8, 37, 3)
    assert out["rigid_traj"].shape == (3, 8, 7)
    assert np.isfinite(out["atom_traj"]).all()

    # shorter protein: padded to 8 on device, un-padded in the response,
    # and the SAME compiled fn serves it (no second compile)
    n_compiled = len(service._compiled)
    raw5 = {k: make_window(n_res=5, frame_time=2, seed=4)[k]
            for k in RAW_KEYS}
    out5 = _post_window(base, raw5)
    assert out5["atom_traj"].shape == (3, 5, 37, 3)
    assert np.isfinite(out5["atom_traj"]).all()
    assert len(service._compiled) == n_compiled

    # determinism contract: same window + seed -> same trajectory
    again = _post_window(base, raw5)
    np.testing.assert_array_equal(out5["atom_traj"], again["atom_traj"])


def test_rollout_errors(server):
    base, _ = server
    raw = {k: make_window(n_res=8, frame_time=2, seed=3)[k]
           for k in RAW_KEYS}

    def post_expect_400(query, body_raw=None, drop=None):
        body = dict(body_raw or raw)
        if drop:
            body.pop(drop)
        buf = io.BytesIO()
        np.savez(buf, **body)
        req = urllib.request.Request(f"{base}/rollout?{query}",
                                     data=buf.getvalue())
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=60)
        assert e.value.code == 400
        return json.loads(e.value.read())["error"]

    assert "n_steps" in post_expect_400("")  # missing n_steps
    assert "missing keys" in post_expect_400("n_steps=2&num_t=2",
                                             drop="force")
    # oversize protein: pad_window's loud static-shape error, not a crash
    big = {k: make_window(n_res=12, frame_time=2, seed=5)[k]
           for k in RAW_KEYS}
    assert "pad_to" in post_expect_400("n_steps=2&num_t=2", body_raw=big)

    # unknown path -> 404
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(f"{base}/nope", timeout=60)
    assert e.value.code == 404
