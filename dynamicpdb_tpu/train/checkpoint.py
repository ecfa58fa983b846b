"""Checkpoint save/restore (msgpack via flax.serialization).

Upgrades the reference's torch-pickle checkpoints
(/root/reference/src/data/utils.py:324-362): full state = params + optimizer
state + step/epoch + config snapshot, all restored on resume (the reference
writes optimizer state but its warm start never restores it,
train_DFOLD_dynamics.py:468-499). Atomic write (tmp + rename) so a preempted
job never leaves a truncated checkpoint.
"""
from __future__ import annotations

import json
import os

from flax import serialization

from dynamicpdb_tpu.config import to_dict


def save(path: str, params, opt_state, step: int, epoch: int, cfg=None):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {
        "params": serialization.to_bytes(params),
        "opt_state": serialization.to_bytes(opt_state),
        "step": step,
        "epoch": epoch,
        "config": json.dumps(to_dict(cfg)) if cfg is not None else None,
    }
    blob = serialization.msgpack_serialize(payload)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)


def restore(path: str, params_template, opt_state_template=None) -> dict:
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    params = serialization.from_bytes(params_template, payload["params"])
    opt_state = None
    if opt_state_template is not None and payload.get("opt_state"):
        opt_state = serialization.from_bytes(
            opt_state_template, payload["opt_state"]
        )
    return {
        "params": params,
        "opt_state": opt_state,
        "step": int(payload["step"]),
        "epoch": int(payload["epoch"]),
        "config": json.loads(payload["config"]) if payload.get("config") else None,
    }
