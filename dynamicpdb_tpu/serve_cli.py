"""Trajectory-extension serving endpoint (beyond-reference).

The reference has no serving story at all — trajectories come out of a
research eval script. This module turns a trained checkpoint into a
long-lived process that loads the model once, compiles the rollout once
per requested shape, and answers HTTP requests from then on at the
measured 331-fps single-chip rollout rate (bench.py):

    python -m dynamicpdb_tpu.serve_cli --ckpt ckpt/step_1000.ckpt \
        --port 8765 [--pad-to 256] [overrides...]

API (stdlib-only on both ends):
  GET  /healthz             -> {"status": "ok", device, step, pad_to}
  POST /rollout?n_steps=64[&num_t=10&noise_scale=0.1&fast_x0=0&seed=0]
       body: an .npz with the raw window keys (atom37 [F,N,37,3],
       atom37_mask, aatype, residue_index, force, vel, node_repr,
       edge_repr — the bundle layout preprocess/pack.py writes)
       -> an .npz with atom_traj [n_steps,N,37,3] and rigid_traj
       [n_steps,N,7], residue axis un-padded back to the request's N.

Requests are padded to a fixed residue count (``--pad-to``, default the
config's filtering.max_len) so every request of any length ≤ pad_to hits
ONE compiled executable; distinct (n_steps, num_t, noise_scale, fast_x0)
combinations compile once each and are cached for the process lifetime.
Device work is single-flighted behind a lock (one chip, one stream);
the HTTP layer is threaded so health checks never queue behind a
rollout. Client example:

    import urllib.request, io, numpy as np
    buf = io.BytesIO(); np.savez(buf, **window)
    req = urllib.request.Request(
        "http://localhost:8765/rollout?n_steps=64", data=buf.getvalue())
    out = np.load(io.BytesIO(urllib.request.urlopen(req).read()))
"""
from __future__ import annotations

import io
import json
import logging
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

log = logging.getLogger("serve")

RAW_KEYS = ("atom37", "atom37_mask", "aatype", "residue_index",
            "force", "vel", "node_repr", "edge_repr")


class RolloutService:
    """Model + compiled-rollout cache; pure Python, HTTP-free (testable)."""

    def __init__(self, trainer, params, pad_to: int, step: int = -1):
        self.trainer = trainer
        self.params = params
        self.pad_to = pad_to
        self.step = step
        self._compiled: dict[tuple, object] = {}
        self._lock = threading.Lock()

    def health(self) -> dict:
        import jax

        return {
            "status": "ok",
            "device": str(jax.devices()[0]),
            "step": self.step,
            "pad_to": self.pad_to,
            "compiled_rollouts": sorted(
                str(k) for k in self._compiled
            ),
        }

    def _rollout_fn(self, n_steps: int, num_t: int, noise_scale: float,
                    fast_x0: bool):
        import jax

        from dynamicpdb_tpu.sampling.reverse import rollout

        key_t = (n_steps, num_t, float(noise_scale), bool(fast_x0))
        fn = self._compiled.get(key_t)
        if fn is None:
            fn = jax.jit(
                lambda p, k, f: rollout(
                    k, self.trainer.model, p, self.trainer.diffuser, f,
                    n_steps=n_steps, num_t=num_t,
                    noise_scale=noise_scale, fast_x0=fast_x0,
                )
            )
            self._compiled[key_t] = fn
        return fn

    def extend(self, raw: dict, *, n_steps: int, num_t: int = 10,
               noise_scale: float = 0.1, fast_x0: bool = False,
               seed: int = 0) -> dict:
        """Raw window dict -> {atom_traj, rigid_traj} numpy arrays."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from dynamicpdb_tpu.data.dataset import pad_window
        from dynamicpdb_tpu.data.featurize import (
            eval_init_window,
            featurize_window,
        )

        missing = [k for k in RAW_KEYS if k not in raw]
        if missing:
            raise ValueError(f"window is missing keys: {missing}")
        if not 1 <= n_steps <= 100_000:
            raise ValueError(f"n_steps out of range: {n_steps}")
        n = int(raw["aatype"].shape[0])
        padded = pad_window({k: raw[k] for k in RAW_KEYS}, self.pad_to)
        feats = featurize_window(
            jax.tree_util.tree_map(jnp.asarray, padded)
        )
        feats = eval_init_window(
            jax.random.PRNGKey(seed), feats, self.trainer.diffuser
        )
        fn = self._rollout_fn(n_steps, num_t, noise_scale, fast_x0)
        with self._lock:  # one chip: single-flight the device work
            atom_traj, rigid_traj = fn(
                self.params, jax.random.PRNGKey(seed + 1), feats
            )
        return {
            "atom_traj": np.asarray(atom_traj)[:, :n],
            "rigid_traj": np.asarray(rigid_traj)[:, :n],
        }


def make_handler(service: RolloutService):
    import numpy as np

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *a):  # route through logging, not stderr
            log.info("%s " + fmt, self.client_address[0], *a)

        def _json(self, code: int, obj: dict):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if urlparse(self.path).path == "/healthz":
                return self._json(200, service.health())
            return self._json(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            url = urlparse(self.path)
            if url.path != "/rollout":
                return self._json(404, {"error": f"unknown path {url.path}"})
            q = parse_qs(url.query)

            def arg(name, cast, default):
                return cast(q[name][0]) if name in q else default

            try:
                n_steps = arg("n_steps", int, None)
                if n_steps is None:
                    raise ValueError("n_steps query parameter is required")
                body = self.rfile.read(
                    int(self.headers.get("Content-Length", 0))
                )
                with np.load(io.BytesIO(body), allow_pickle=False) as z:
                    raw = {k: z[k] for k in z.files}
                out = service.extend(
                    raw,
                    n_steps=n_steps,
                    num_t=arg("num_t", int, 10),
                    noise_scale=arg("noise_scale", float, 0.1),
                    fast_x0=bool(arg("fast_x0", int, 0)),
                    seed=arg("seed", int, 0),
                )
            except (ValueError, KeyError) as e:
                return self._json(400, {"error": str(e)})
            buf = io.BytesIO()
            np.savez(buf, **out)
            payload = buf.getvalue()
            self.send_response(200)
            self.send_header("Content-Type", "application/octet-stream")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

    return Handler


def make_server(service: RolloutService, host: str = "127.0.0.1",
                port: int = 0) -> ThreadingHTTPServer:
    return ThreadingHTTPServer((host, port), make_handler(service))


def main(argv=None):
    import argparse

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--ckpt", required=True)
    parser.add_argument("--config", default=None)
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8765)
    parser.add_argument("--pad-to", type=int, default=None,
                        help="fixed residue count every request pads to "
                             "(default: data.filtering.max_len)")
    parser.add_argument("--ema", action="store_true",
                        help="serve the EMA weights from the checkpoint's "
                        "optimizer state (train with experiment.ema_decay "
                        "and pass the same override)")
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO)

    from dynamicpdb_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    import jax

    from dynamicpdb_tpu import config as config_lib
    from dynamicpdb_tpu.data.realistic import make_realistic_window
    from dynamicpdb_tpu.train import checkpoint as ckpt_lib
    from dynamicpdb_tpu.train.experiment import Trainer

    cfg = (
        config_lib.load_yaml(args.config, args.overrides)
        if args.config
        else config_lib.apply_overrides(config_lib.Config(), args.overrides)
    )
    pad_to = args.pad_to or cfg.data.filtering.max_len

    # template window at the serving shape to init the param structure
    trainer = Trainer(cfg)
    tmpl = make_realistic_window(
        n_res=pad_to, frame_time=cfg.data.frame_time, seed=0
    )
    tmpl = {k: tmpl[k] for k in RAW_KEYS}
    params, opt_template = trainer.init_params(jax.random.PRNGKey(0), tmpl)
    state = ckpt_lib.restore(
        args.ckpt, params, opt_template if args.ema else None
    )
    params = state["params"]
    if args.ema:
        from dynamicpdb_tpu.train.optim import ema_params

        if state["opt_state"] is None:
            raise SystemExit("--ema: checkpoint has no optimizer state")
        params = ema_params(state["opt_state"])

    service = RolloutService(trainer, params, pad_to,
                             step=state.get("step", -1))
    server = make_server(service, args.host, args.port)
    log.info("serving %s (step %s) on http://%s:%d  pad_to=%d%s",
             args.ckpt, state.get("step"), *server.server_address, pad_to,
             " [EMA weights]" if args.ema else "")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
