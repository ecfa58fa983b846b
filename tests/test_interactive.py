"""Interactive (plotly-format) visualization: figure dicts must be valid
plotly JSON (schema-level checks; the plotly package itself is not
installed here — the module intentionally has no dependency on it)."""
import json

import numpy as np

from dynamicpdb_tpu.analysis import interactive as iv


def test_scatter3d_matches_reference_trace_shape():
    pos = np.arange(30, dtype=float).reshape(10, 3)
    tr = iv.scatter3d(pos, mode="lines+markers", marker_size=3,
                      name="CA", opacity=0.8, colorscale="Viridis")
    assert tr["type"] == "scatter3d"
    assert tr["x"] == pos[:, 0].tolist()
    assert tr["mode"] == "lines+markers"
    assert tr["marker"]["size"] == 3 and tr["marker"]["colorscale"]
    json.dumps(tr)  # strictly serializable


def test_cone_trace_uvw():
    tail = np.zeros((5, 3))
    head = np.ones((5, 3))
    tr = iv.cones(tail, head, name="force", sizeref=2.0)
    assert tr["type"] == "cone"
    assert tr["u"] == [1.0] * 5 and tr["w"] == [1.0] * 5
    assert tr["sizemode"] == "absolute" and tr["sizeref"] == 2.0


def test_trajectory_figure_animates_all_frames():
    traj = np.random.default_rng(0).normal(size=(6, 12, 3))
    forces = np.random.default_rng(1).normal(size=(6, 12, 3))
    fig = iv.trajectory_figure(traj, forces=forces, title="traj")
    assert len(fig["frames"]) == 6
    assert all(len(f["data"]) == 2 for f in fig["frames"])  # CA + cones
    # Play button + slider with one step per frame
    assert fig["layout"]["updatemenus"][0]["buttons"][0]["label"] == "Play"
    assert len(fig["layout"]["sliders"][0]["steps"]) == 6
    # cube aspect + shared range for stable animation
    scene = fig["layout"]["scene"]
    assert scene["aspectmode"] == "cube"
    assert scene["xaxis"]["range"] == scene["zaxis"]["range"]
    json.dumps(fig)


def test_trajectory_figure_accepts_atom37():
    a37 = np.random.default_rng(0).normal(size=(4, 8, 37, 3))
    fig = iv.trajectory_figure(a37)
    assert len(fig["frames"]) == 4
    assert len(fig["data"][0]["x"]) == 8  # CA column only


def test_write_html_roundtrips_figure(tmp_path):
    fig = iv.comparison_figure(np.zeros((5, 3)), np.ones((5, 3)),
                               title="pred vs gt")
    path = iv.write_html(fig, str(tmp_path / "fig.html"))
    html = open(path).read()
    assert "plotly" in html and "newPlot" in html
    # the embedded JSON block must parse back to the same figure
    start = html.index('id="figure-data">') + len('id="figure-data">')
    end = html.index("</script>", start)
    assert json.loads(html[start:end]) == json.loads(iv.to_json(fig))
