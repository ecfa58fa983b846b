import numpy as np
from scipy.spatial.transform import Rotation

from dynamicpdb_tpu.analysis import structure_checks as sc
from dynamicpdb_tpu.data.synthetic import make_window

RNG = np.random.default_rng(0)


def _ideal_chain(n=30):
    """CA chain at ideal 3.8 A spacing along x."""
    return np.arange(n)[:, None] * [sc.CA_CA_IDEAL, 0.0, 0.0]


def test_ca_ca_distance_ideal_chain():
    dev, valid = sc.ca_ca_distance(_ideal_chain())
    assert dev < 1e-6 and valid == 1.0


def test_ca_ca_clashes():
    ca = _ideal_chain(10)
    n, pct = sc.ca_ca_clashes(ca)
    assert n == 0
    ca_bad = np.concatenate([ca, ca[:1] + 0.5])  # overlapping atom
    n2, _ = sc.ca_ca_clashes(ca_bad)
    assert n2 >= 1


def test_tm_score_identity_and_rigid_motion():
    ca = RNG.normal(size=(50, 3)) * 5
    assert sc.tm_score(ca, ca) > 0.999
    rot = Rotation.random(random_state=0).as_matrix()
    moved = ca @ rot.T + [10, -5, 3]
    assert sc.tm_score(moved, ca) > 0.999
    scrambled = RNG.normal(size=(50, 3)) * 5
    assert sc.tm_score(scrambled, ca) < 0.4


def test_violation_metrics_finite_on_reasonable_geometry():
    from dynamicpdb_tpu.analysis.violations import compute_violation_metrics

    w = make_window(n_res=20, frame_time=1, seed=1)
    out = compute_violation_metrics(
        w["atom37"][0], w["atom37_mask"], w["aatype"].astype(np.int64),
        np.arange(20, dtype=np.int64),
    )
    for k in ("violations_between_residue_bond",
              "violations_between_residue_clash",
              "violations_within_residue", "violations_per_residue"):
        assert 0.0 <= out[k] <= 1.0


def test_protein_metrics_aggregate():
    w = make_window(n_res=16, frame_time=1, seed=2)
    m = sc.protein_metrics(w["atom37"][0], w["atom37_mask"], w["atom37"][0],
                           aatype=w["aatype"])
    for k in (
        "ca_ca_bond_dev", "violations_per_residue", "radius_of_gyration",
        "helix_percent", "tm_score",
    ):
        assert k in m and np.isfinite(m[k])
    assert m["tm_score"] > 0.999  # self-comparison


def test_ss_fractions_helix_vs_extended():
    # synthetic helix generator should read mostly helix
    from dynamicpdb_tpu.data.synthetic import helix_backbone

    helix37 = np.zeros((30, 37, 3))
    helix37[:, 1] = helix_backbone(30)
    f = sc.secondary_structure_fractions(helix37)
    assert f["helix_percent"] > 0.5
    ext37 = np.zeros((30, 37, 3))
    ext37[:, 1] = _ideal_chain(30)
    f2 = sc.secondary_structure_fractions(ext37)
    assert f2["strand_percent"] > 0.5
