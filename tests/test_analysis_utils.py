import numpy as np

import jax.numpy as jnp

from dynamicpdb_tpu.analysis.contact_order import contact_matrix, contact_order
from dynamicpdb_tpu.analysis.plotting import plot_loss_curves, plot_rot_trans_curves
from dynamicpdb_tpu.utils.logging import MetricsWriter, StepTimer, read_metrics


def test_contact_order_line_vs_compact():
    # extended chain: only sequential neighbors in contact -> low CO
    line = jnp.asarray(np.arange(20)[:, None] * [4.0, 0, 0])
    co_line = float(contact_order(line, cutoff=8.0))
    # compact cluster: everything contacts everything -> higher CO
    rng = np.random.default_rng(0)
    blob = jnp.asarray(rng.normal(size=(20, 3)) * 2)
    co_blob = float(contact_order(blob, cutoff=8.0))
    assert co_blob > co_line
    cm = contact_matrix(line, cutoff=8.0)
    assert bool(cm[0, 1]) and not bool(cm[0, 5])


def test_metrics_writer_roundtrip(tmp_path):
    w = MetricsWriter(str(tmp_path), use_tensorboard=False)
    w.write(1, {"loss": 2.0})
    w.write(2, {"loss": 1.0})
    w.close()
    recs = read_metrics(str(tmp_path))
    assert [r["step"] for r in recs] == [1, 2]
    assert recs[1]["loss"] == 1.0


def test_plotting_writes_files(tmp_path):
    hist = [{"step": i, "total_loss": 10 / (i + 1), "rot_loss": 1.0} for i in range(5)]
    p1 = plot_loss_curves(hist, str(tmp_path / "loss.png"))
    p2 = plot_rot_trans_curves(
        {"rot": [3, 2, 1], "ref_rot": [3, 3, 3], "trans": [1, 0.5, 0.2]},
        str(tmp_path / "curves.png"),
    )
    import os

    assert os.path.getsize(p1) > 0 and os.path.getsize(p2) > 0


def test_step_timer():
    t = StepTimer()
    t.tick(5)
    assert t.steps_per_sec > 0


def test_plot_sample_grid_and_frames_and_animation(tmp_path):
    from dynamicpdb_tpu.analysis import plotting as P
    from dynamicpdb_tpu.data.synthetic import make_window

    w = make_window(n_res=10, frame_time=4, seed=0)
    p1 = P.plot_sample_grid(
        w["atom37"], str(tmp_path / "grid.png"), true_bb=w["atom37"][0]
    )
    rigids = np.concatenate(
        [np.tile([1.0, 0, 0, 0], (4, 10, 1)), w["atom37"][:, :, 1]], -1
    )
    p2 = P.viz_frames(rigids, str(tmp_path / "frames.png"), title="t")
    p3 = P.write_traj_animation(w["atom37"], str(tmp_path / "traj.gif"))
    import os

    for p in (p1, p2, p3):
        assert os.path.getsize(p) > 1000
