"""Data-parallel training over a virtual 8-device CPU mesh."""
import numpy as np
import pytest
# compile/oracle-heavy on a 1-core host (measured, Makefile header):
# run via `make heavy`; excluded from the default `make test` tier
pytestmark = pytest.mark.heavy

import jax
import jax.numpy as jnp

from dynamicpdb_tpu.data.synthetic import make_window
from dynamicpdb_tpu.parallel import mesh as mesh_lib
from dynamicpdb_tpu.train.experiment import Trainer
from tests.test_train import TINY_CFG


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_data_parallel_train_step_matches_single_device():
    window = make_window(n_res=8, frame_time=2, seed=0)
    key = jax.random.PRNGKey(0)

    # single-device: batch of 8 identical windows
    tr1 = Trainer(TINY_CFG)
    params, opt_state = tr1.init_params(key, window)
    batch = jax.tree_util.tree_map(lambda x: jnp.asarray(np.stack([x] * 8)), window)
    p1, _, aux1 = tr1.compiled_train_step()(params, opt_state, key, batch)

    # 8-device data parallel on the same batch, with ZeRO-sharded moments
    # (the production default, experiment.zero_opt_state=True)
    mesh = mesh_lib.make_mesh((8,), ("data",))
    tr8 = Trainer(TINY_CFG, mesh=mesh)
    params8, opt_state8 = tr8.init_params(key, window)
    # the big moment leaves must actually be sharded over 'data'
    n_sharded = sum(
        1 for leaf in jax.tree_util.tree_leaves(opt_state8)
        if leaf.ndim > 0
        and leaf.addressable_shards[0].data.size < leaf.size
    )
    assert n_sharded > 0, "ZeRO sharded no optimizer-state leaves"
    sharded = mesh_lib.shard_batch(mesh, batch)
    p8, _, aux8 = tr8.compiled_train_step(opt_state8)(
        params8, opt_state8, key, sharded
    )

    # same data + same key => identical loss and identical updated params
    np.testing.assert_allclose(
        float(aux1["total_loss"]), float(aux8["total_loss"]), rtol=1e-5
    )
    l1 = jax.tree_util.tree_leaves(p1)
    l8 = jax.tree_util.tree_leaves(p8)
    for a, b in zip(l1, l8):
        # float32 all-reduce order differs from the single-device reduction
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_graft_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8, flagship=False)


@pytest.mark.slow
@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_graft_dryrun_multichip_flagship():
    """Full driver path incl. the flagship-width model (~5 min CPU
    compile; the driver also runs this directly at round end)."""
    import __graft_entry__ as g

    g.dryrun_multichip(8, flagship=True)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_hybrid_slice_mesh_matches_flat_dp():
    """Multislice-style ('slice','data') mesh must reproduce flat-DP losses
    (CPU emulation: 2 slices x 4 devices; on hardware 'slice' rides DCN)."""
    window = make_window(n_res=8, frame_time=2, seed=0)
    key = jax.random.PRNGKey(0)
    batch = jax.tree_util.tree_map(lambda x: jnp.asarray(np.stack([x] * 8)), window)

    flat = Trainer(TINY_CFG, mesh=mesh_lib.make_mesh((8,), ("data",)))
    p, o = flat.init_params(key, window)
    _, _, aux_flat = flat.compiled_train_step()(
        p, o, key, mesh_lib.shard_batch(flat.mesh, batch)
    )

    hybrid_mesh = mesh_lib.make_hybrid_mesh(n_slices=2)
    assert hybrid_mesh.axis_names == ("slice", "data")
    assert dict(hybrid_mesh.shape) == {"slice": 2, "data": 4}
    hyb = Trainer(TINY_CFG, mesh=hybrid_mesh)
    p2, o2 = hyb.init_params(key, window)
    sharded = mesh_lib.shard_batch(hybrid_mesh, batch)
    # leading axis must be split across all 8 devices (slice x data)
    assert len(jax.tree_util.tree_leaves(sharded)[0].addressable_shards) == 8
    _, _, aux_hyb = hyb.compiled_train_step()(p2, o2, key, sharded)

    np.testing.assert_allclose(
        float(aux_flat["total_loss"]), float(aux_hyb["total_loss"]), rtol=1e-5
    )


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_tensor_parallel_sharding_matches_dp():
    """DP+TP (4x2 mesh, model-sharded params) must reproduce the DP loss."""
    from dynamicpdb_tpu.parallel import sharding as sharding_lib

    window = make_window(n_res=8, frame_time=2, seed=0)
    key = jax.random.PRNGKey(0)

    tr = Trainer(TINY_CFG)
    params, opt_state = tr.init_params(key, window)
    batch8 = jax.tree_util.tree_map(lambda x: jnp.asarray(np.stack([x] * 8)), window)
    _, _, aux_dp = jax.jit(tr.train_step)(params, opt_state, key, batch8)

    mesh = mesh_lib.make_mesh((4, 2), ("data", "model"))
    tr2 = Trainer(TINY_CFG, mesh=mesh)
    p2, o2 = tr2.init_params(key, window)
    p2 = sharding_lib.shard_params(p2, mesh)
    o2 = jax.tree_util.tree_map(
        lambda v, s: jax.device_put(v, s), o2,
        sharding_lib.tree_shardings(o2, mesh),
    )
    batch4 = jax.tree_util.tree_map(lambda x: jnp.asarray(np.stack([x] * 4)), window)
    batch4 = mesh_lib.shard_batch(mesh, batch4)
    _, _, aux_tp = jax.jit(tr2.train_step)(p2, o2, key, batch4)

    # same windows (identical copies) => same mean loss regardless of layout
    np.testing.assert_allclose(
        float(aux_dp["total_loss"]), float(aux_tp["total_loss"]), rtol=2e-4
    )


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_zero_opt_state_matches_replicated_dp(tmp_path):
    """ZeRO-sharded AMSGrad moments (experiment.zero_opt_state=True) must
    produce the same updates as fully-replicated moments over 2 steps, and
    survive a checkpoint save/restore round trip (restore re-places every
    leaf with the template's sharding — train/checkpoint._place_like — so
    the ZeRO layout survives a resume; the cross-process gather half of
    save() is certified by the 2-process cluster test via mp_worker)."""
    import dataclasses

    from dynamicpdb_tpu.train import checkpoint as ckptlib

    window = make_window(n_res=8, frame_time=2, seed=0)
    key = jax.random.PRNGKey(0)
    batch = jax.tree_util.tree_map(
        lambda x: jnp.asarray(np.stack([x] * 8)), window
    )
    mesh = mesh_lib.make_mesh((8,), ("data",))
    sharded = mesh_lib.shard_batch(mesh, batch)

    results = []
    for zero in (True, False):
        cfg = dataclasses.replace(
            TINY_CFG,
            experiment=dataclasses.replace(
                TINY_CFG.experiment, zero_opt_state=zero
            ),
        )
        tr = Trainer(cfg, mesh=mesh)
        p, o = tr.init_params(key, window)
        step = tr.compiled_train_step(o)
        p, o, _ = step(p, o, key, sharded)
        if zero:
            # checkpoint round trip through the SHARDED state
            want = [x.sharding for x in jax.tree_util.tree_leaves(o)]
            ckptlib.save(str(tmp_path / "z.ckpt"), p, o, 2, 0)
            state = ckptlib.restore(str(tmp_path / "z.ckpt"), p, o)
            p, o = state["params"], state["opt_state"]
            for leaf, ws in zip(jax.tree_util.tree_leaves(o), want):
                assert leaf.sharding == ws, (leaf.sharding, ws)
        p, o, aux = step(p, o, jax.random.PRNGKey(1), sharded)
        results.append((p, float(aux["total_loss"])))

    (pz, lz), (pr, lr) = results
    np.testing.assert_allclose(lz, lr, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(pz),
                    jax.tree_util.tree_leaves(pr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_sequence_parallel_matches_data_parallel():
    """Residue-axis sequence parallelism (parallel/sp.py): a ('data','seq')
    2x4 mesh must reproduce the pure-DP losses and parameter updates, with
    the node/edge activations ACTUALLY sharded over 'seq' (asserted via the
    compiled step's sharding constraints surviving into the executable —
    checked indirectly: per-device output equality + the train step runs
    with batch replicated over 'seq')."""
    window = make_window(n_res=8, frame_time=2, seed=0)
    key = jax.random.PRNGKey(0)
    batch = jax.tree_util.tree_map(lambda x: jnp.asarray(np.stack([x] * 8)), window)

    dp = Trainer(TINY_CFG, mesh=mesh_lib.make_mesh((8,), ("data",)))
    p, o = dp.init_params(key, window)
    p1, _, aux_dp = dp.compiled_train_step()(
        p, o, key, mesh_lib.shard_batch(dp.mesh, batch)
    )

    spmesh = mesh_lib.make_mesh((2, 4), ("data", "seq"))
    tr = Trainer(TINY_CFG, mesh=spmesh)
    p2, o2 = tr.init_params(key, window)
    sharded = mesh_lib.shard_batch(spmesh, batch)
    # batch axis splits over 'data' only: 2 distinct shards across 8 devices
    leaf = jax.tree_util.tree_leaves(sharded)[0]
    assert len({s.index for s in leaf.addressable_shards}) == 2
    p2, _, aux_sp = tr.compiled_train_step()(p2, o2, key, sharded)

    np.testing.assert_allclose(
        float(aux_dp["total_loss"]), float(aux_sp["total_loss"]), rtol=1e-5
    )
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_sequence_parallel_shards_edge_activation():
    """The O(N^2) pair tensor must actually be partitioned over 'seq':
    lower the model forward on the seq mesh and check the edge-expansion
    constraint reaches the compiled HLO (sharding ops present)."""
    from dynamicpdb_tpu.data.featurize import (
        diffuse_training_window,
        featurize_window,
    )
    from dynamicpdb_tpu.parallel import sp

    window = make_window(n_res=8, frame_time=2, seed=0)
    spmesh = mesh_lib.make_mesh((2, 4), ("data", "seq"))
    tr = Trainer(TINY_CFG, mesh=spmesh)
    key = jax.random.PRNGKey(0)
    params, _ = tr.init_params(key, window)

    with sp.activated(spmesh):
        feats = featurize_window(jax.tree_util.tree_map(jnp.asarray, window))
        feats = diffuse_training_window(
            key, feats, tr.diffuser, TINY_CFG.data.min_t
        )
        hlo = jax.jit(tr.model.apply).lower(params, feats).as_text()
    # jax >= 0.5 lowers partitioning through the Shardy dialect; older
    # stacks used mhlo sharding= attributes — accept either marker
    n_constraints = hlo.count("sdy.sharding_constraint") + hlo.count(
        "sharding="
    )
    assert n_constraints > 0, "no sharding constraints reached the lowered HLO"
    assert '"seq"' in hlo or "'seq'" in hlo or "seq" in hlo


@pytest.mark.slow
@pytest.mark.parametrize("mesh_kind", ["flat", "hybrid"])
@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_two_process_training_matches_single_process(tmp_path, mesh_kind):
    """REAL multi-process validation (2 CPU processes x 4 devices, Gloo):
    jax.distributed init, global mesh spanning processes, host-strided
    local batches assembled via make_array_from_process_local_data
    (mesh_lib.shard_batch's multi-host branch), replicated params, ZeRO
    moments, cross-process gradient psum. Both workers must agree with
    each other AND with a single-process 8-device run of the same batch.

    mesh_kind='hybrid' runs the ('slice','data') Multislice layout with
    the process boundary as the slice boundary — the actual multi-host
    production topology (one cross-process combine per step)."""
    import json
    import os
    import socket
    import subprocess
    import sys as _sys

    # single-process ground truth (same batch: 8 copies of one window)
    window = make_window(n_res=8, frame_time=2, seed=0)
    key = jax.random.PRNGKey(0)
    mesh = mesh_lib.make_mesh((8,), ("data",))
    tr = Trainer(TINY_CFG, mesh=mesh)
    params, opt_state = tr.init_params(key, window)
    batch = jax.tree_util.tree_map(
        lambda x: jnp.asarray(np.stack([x] * 8)), window
    )
    p1, _, aux1 = tr.compiled_train_step(opt_state)(
        params, opt_state, key, mesh_lib.shard_batch(mesh, batch)
    )
    ck1 = float(
        sum(float(jnp.sum(jnp.abs(x)))
            for x in jax.tree_util.tree_leaves(p1))
    )

    with socket.socket() as s:  # free port for the coordinator
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    worker = os.path.join(os.path.dirname(__file__), "mp_worker.py")
    outs = [str(tmp_path / f"mp{i}.json") for i in range(2)]
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [_sys.executable, worker, str(i), str(port), outs[i], mesh_kind],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        )
        for i in range(2)
    ]
    try:
        # 900 s: a 1-core host serializes both workers' compiles (cold
        # cache); multi-core hosts finish in a fraction of this
        logs = [p.communicate(timeout=900)[0].decode() for p in procs]
    finally:
        # a timeout must not leave detached workers holding the port/CPU
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, lg in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{lg[-3000:]}"
    r0, r1 = (json.load(open(o)) for o in outs)

    assert abs(r0["loss"] - r1["loss"]) < 1e-6  # replicated output agrees
    np.testing.assert_allclose(r0["loss"], float(aux1["total_loss"]),
                               rtol=1e-5)
    # BOTH workers' post-update params must match the single-process run —
    # an asymmetric corruption on process 1 must not pass on r0 alone
    np.testing.assert_allclose(r0["param_checksum"], ck1, rtol=1e-5)
    np.testing.assert_allclose(r1["param_checksum"], ck1, rtol=1e-5)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_grad_accum_under_data_parallel_matches_plain_dp():
    """grad_accum composes with the DP mesh: a 16-window global batch
    stepped as 2 micro-batches of 8 must reproduce the plain DP step."""
    import dataclasses

    window = make_window(n_res=8, frame_time=2, seed=0)
    key = jax.random.PRNGKey(0)
    batch = jax.tree_util.tree_map(
        lambda x: jnp.asarray(np.stack([x] * 16)), window
    )
    mesh = mesh_lib.make_mesh((8,), ("data",))

    tr = Trainer(TINY_CFG, mesh=mesh)
    p, o = tr.init_params(key, window)
    p1, _, aux1 = tr.compiled_train_step(o)(
        p, o, key, mesh_lib.shard_batch(mesh, batch)
    )

    cfg2 = dataclasses.replace(
        TINY_CFG, experiment=dataclasses.replace(
            TINY_CFG.experiment, grad_accum=2
        ),
    )
    tr2 = Trainer(cfg2, mesh=mesh)
    p2, o2 = tr2.init_params(key, window)
    p2, _, aux2 = tr2.compiled_train_step(o2)(
        p2, o2, key, mesh_lib.shard_batch(mesh, batch)
    )

    np.testing.assert_allclose(
        float(aux1["total_loss"]), float(aux2["total_loss"]), rtol=1e-5
    )
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)
