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


# secondary-structure validation lives in tests/test_dssp.py (ideal-geometry
# constructs; the old CA-distance heuristic asserted DSSP-incorrect behavior)


def test_tm_score_analytic_partial_match():
    """k of L residues identical, rest displaced far: TM ~= k/L (each
    matching residue scores 1, displaced ones ~0) — the multi-seed search
    must find the matching fragment even though a global superposition
    would be dominated by the displaced half."""
    L, k = 64, 48
    ca = RNG.normal(size=(L, 3)) * 6
    pred = ca.copy()
    pred[k:] += 300.0  # far away
    s = sc.tm_score(pred, ca)
    assert abs(s - k / L) < 0.03, s
    # and the same with the mismatching part FIRST
    pred2 = ca.copy()
    pred2[: L - k] -= 300.0
    s2 = sc.tm_score(pred2, ca)
    assert abs(s2 - k / L) < 0.03, s2


def test_tm_score_random_structures_score_low():
    """Unrelated compact chains score ~0.1-0.3 (Zhang & Skolnick: random
    pairs average ~0.17 regardless of length)."""
    from dynamicpdb_tpu.data.synthetic import helix_backbone

    scores = []
    for seed in range(4):
        rng = np.random.default_rng(seed)
        a = np.cumsum(rng.normal(size=(80, 3)) * 2.2, axis=0)
        b = np.cumsum(rng.normal(size=(80, 3), loc=0.01) * 2.2, axis=0)[::-1]
        scores.append(sc.tm_score(a, b))
    assert np.mean(scores) < 0.35
    assert all(s > 0.05 for s in scores)


def test_tm_score_monotone_in_noise():
    ca = RNG.normal(size=(60, 3)) * 5
    prev = 1.01
    for sigma in (0.0, 0.5, 1.5, 4.0):
        s = sc.tm_score(ca + RNG.normal(size=ca.shape) * sigma, ca)
        assert s <= prev + 0.02
        prev = s


def test_tm_score_tiny_chains():
    """Chains below the fragment-loop minimum must still score (a 3-residue
    identical pair used to return 0.0)."""
    rng = np.random.default_rng(3)
    ca = rng.normal(size=(3, 3)).astype(np.float64)
    assert sc.tm_score(ca, ca) > 0.9
    assert sc.tm_score(ca[:2], ca[:2]) == 1.0
    assert sc.tm_score(ca[:0], ca[:0]) == 0.0


def test_tm_score_two_points_not_always_perfect():
    """L=2 chains with different inter-point distances are NOT exactly
    superposable — the score must reflect the |d1-d2|/2 residual."""
    pred = np.array([[0.0, 0, 0], [100.0, 0, 0]])
    gt = np.array([[0.0, 0, 0], [1.0, 0, 0]])
    s = sc.tm_score(pred, gt)
    # residual 49.5 A per point, d0=0.5 -> score ~ 1e-4
    assert s < 0.01
    assert sc.tm_score(gt, gt) == 1.0


def test_protein_metrics_interior_gap_not_bonded():
    """A missing interior residue must not make its neighbors count as a
    CA-CA bond (the ~7.6 A gap pair used to inflate ca_ca_bond_dev), and
    secondary structure must keep chain positions (no compression)."""
    L = 9
    atom37 = np.zeros((L, 37, 3))
    mask = np.zeros((L, 37))
    for i in range(L):
        atom37[i, 1] = [i * sc.CA_CA_IDEAL, 0.0, 0.0]  # CA
        atom37[i, 0] = atom37[i, 1] + [-0.5, 1.0, 0.0]  # N
        atom37[i, 2] = atom37[i, 1] + [0.5, 1.0, 0.0]  # C
        atom37[i, 4] = atom37[i, 1] + [0.5, 2.0, 0.0]  # O
        mask[i, [0, 1, 2, 4]] = 1.0
    gapped_mask = mask.copy()
    gapped_mask[4] = 0.0  # residue 4 unobserved
    gapped_atoms = atom37.copy()
    gapped_atoms[4] = 0.0
    m = sc.protein_metrics(gapped_atoms, gapped_mask)
    assert m["ca_ca_bond_dev"] < 1e-6  # gap pair (3,5) not counted
    assert m["ca_ca_valid_percent"] == 1.0
    # explicit numbering gap with all residues observed: same exclusion
    ridx = np.array([0, 1, 2, 3, 4, 10, 11, 12, 13])
    atoms2 = atom37.copy()
    atoms2[5:, :, 0] += 50.0  # chain break: second segment far away
    m2 = sc.protein_metrics(atoms2, mask, residue_index=ridx)
    assert m2["ca_ca_bond_dev"] < 1e-6
