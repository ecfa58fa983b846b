"""Worker for the REAL multi-process training test (test_parallel.py::
test_two_process_training_matches_single_process).

Run as: python tests/mp_worker.py <process_id> <port> <out_json> [flat|hybrid]

Two of these form a 2-process x 4-device CPU cluster (Gloo collectives)
— the closest a single host gets to a multi-host TPU pod. Exercises
the genuine multi-host code path end-to-end: jax.distributed init, a
global 8-device mesh spanning both processes, EpochSampler host
striding, shard_batch's make_array_from_process_local_data assembly,
replicated param placement, ZeRO moment sharding over 'data', and the
cross-process gradient psum. The parent test compares the resulting
loss/params against a single-process 8-device run of the same batch.
"""
import json
import os
import sys

pid = int(sys.argv[1])
port = sys.argv[2]
out_path = sys.argv[3]
# mesh topology: 'flat' = (8,) over 'data'; 'hybrid' = ('slice','data')
# 2x4 where the process boundary IS the slice boundary — structurally the
# multi-host Multislice layout (gradient combine crosses processes once)
mesh_kind = sys.argv[4] if len(sys.argv) > 4 else "flat"

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)

os.environ["JAX_PLATFORMS"] = "cpu"
# core-starved-host hardening (the parent strips XLA_FLAGS): the 4
# serialized partitions can exceed XLA-CPU's default 40 s rendezvous
# abort, and the AVX2 pin makes the committed compile cache loadable
from dynamicpdb_tpu.utils.platform import raise_cpu_collective_timeouts  # noqa: E402

raise_cpu_collective_timeouts()
if "xla_cpu_max_isa" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_cpu_max_isa=AVX2"
    ).strip()
from dynamicpdb_tpu.utils.compile_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache(os.path.join(repo, ".cache", "jax_tests"))
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid
)

import numpy as np  # noqa: E402

from dynamicpdb_tpu.data.dataset import EpochSampler  # noqa: E402
from dynamicpdb_tpu.data.synthetic import make_window  # noqa: E402
from dynamicpdb_tpu.parallel import mesh as mesh_lib  # noqa: E402
from dynamicpdb_tpu.train.experiment import Trainer  # noqa: E402
from tests.test_train import TINY_CFG  # noqa: E402

assert jax.process_count() == 2 and jax.device_count() == 8

window = make_window(n_res=8, frame_time=2, seed=0)
if mesh_kind == "hybrid":
    mesh = mesh_lib.make_hybrid_mesh(n_slices=2)
    assert mesh.axis_names == ("slice", "data")
    # each process's 4 local devices must form one complete slice row
    local_ids = {d.id for d in jax.local_devices()}
    assert {d.id for d in mesh.devices[pid]} == local_ids
else:
    mesh = mesh_lib.make_mesh((8,), ("data",))
trainer = Trainer(TINY_CFG, mesh=mesh)
key = jax.random.PRNGKey(0)
params, opt_state = trainer.init_params(key, window)

# host-strided local rows: the sampler contract says each host consumes
# batch_size/num_hosts copies of the SAME protein per batch
sampler = EpochSampler(
    n_items=1, batch_size=8, seed=0, num_hosts=2, host_index=pid,
    shuffle=False,
)
assert sampler.local_batch_size == 4
local = {k: np.stack([v] * sampler.local_batch_size)
         for k, v in window.items()}
batch = mesh_lib.shard_batch(mesh, local)
leading = jax.tree_util.tree_leaves(batch)[0]
assert leading.shape[0] == 8, "global batch must be assembled, not local"

# checkpoint round trip through the CROSS-PROCESS sharded state: the ZeRO
# moments span both processes' devices (non-addressable leaves), so save
# must all-gather collectively and restore must re-place per template
# sharding (train/checkpoint.py). Running the verified step from the
# RESTORED state makes the parent's loss/params equality assertions also
# certify the round trip.
from dynamicpdb_tpu.train import checkpoint as ckptlib  # noqa: E402
from jax.experimental import multihost_utils  # noqa: E402

ckpt_path = os.path.join(os.path.dirname(out_path), f"mp_{mesh_kind}.ckpt")
want_shardings = [
    x.sharding for x in jax.tree_util.tree_leaves(opt_state)
]
ckptlib.save(ckpt_path, params, opt_state, 0, 0)
multihost_utils.sync_global_devices("ckpt_written")
state = ckptlib.restore(ckpt_path, params, opt_state)
# broadcast=True restore: the non-writer process is handed a NONEXISTENT
# path — process 0 reads the blob and broadcasts it, proving per-host-disk
# pods (no shared filesystem) can resume
restore_path = ckpt_path if pid == 0 else ckpt_path + ".not-on-this-host"
state = ckptlib.restore(restore_path, params, opt_state, broadcast=True)
params, opt_state = state["params"], state["opt_state"]
for a, want in zip(jax.tree_util.tree_leaves(opt_state), want_shardings):
    assert isinstance(a, jax.Array) and a.sharding == want, (
        type(a), getattr(a, "sharding", None), want
    )

step = trainer.compiled_train_step(opt_state)
params, opt_state, aux = step(params, opt_state, key, batch)

# parameter checksum: identical across processes AND vs single-process
ck = float(
    sum(float(jax.numpy.sum(jax.numpy.abs(x)))
        for x in jax.tree_util.tree_leaves(params))
)
result = {
    "pid": pid,
    "loss": float(aux["total_loss"]),
    "grad_norm": float(aux["grad_norm"]),
    "param_checksum": ck,
}
with open(out_path, "w") as f:
    json.dump(result, f)
print("mp_worker", result, flush=True)
