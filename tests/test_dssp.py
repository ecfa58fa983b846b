"""Validation of the Kabsch-Sander DSSP implementation against
ideal-geometry constructs (the ground truth the DSSP criterion defines):
an ideal alpha-helix must read H with i->i+4 H-bonds, an ISOLATED extended
chain must read coil (no H-bonds — the round-1 CA-distance heuristic wrongly
called this E), and an antiparallel two-strand sheet must read E."""
import numpy as np

from dynamicpdb_tpu.analysis import structure_checks as sc


def _nerf(a, b, c, bond, angle, dihedral):
    angle, dihedral = np.deg2rad(angle), np.deg2rad(dihedral)
    bc = c - b
    bc /= np.linalg.norm(bc)
    n = np.cross(b - a, bc)
    n /= np.linalg.norm(n)
    m = np.cross(n, bc)
    d = np.array([
        -bond * np.cos(angle),
        bond * np.cos(dihedral) * np.sin(angle),
        bond * np.sin(dihedral) * np.sin(angle),
    ])
    return c + d[0] * bc + d[1] * m + d[2] * n


def ideal_backbone(phi: float, psi: float, L: int) -> np.ndarray:
    """atom37 [L, 37, 3] backbone (N, CA, C, O) from ideal bond geometry
    and uniform (phi, psi), omega = 180."""
    N_CA, CA_C, C_N = 1.458, 1.525, 1.329
    aN_CA_C, aCA_C_N, aC_N_CA, aCA_C_O = 111.2, 116.2, 121.7, 120.8
    ang = np.deg2rad(aN_CA_C)
    N = [np.array([0.0, 0.0, 0.0])]
    CA = [np.array([N_CA, 0.0, 0.0])]
    C = [CA[0] + np.array(
        [CA_C * np.cos(np.pi - ang), CA_C * np.sin(np.pi - ang), 0.0]
    )]
    for _ in range(1, L):
        n_i = _nerf(N[-1], CA[-1], C[-1], C_N, aCA_C_N, psi)
        ca_i = _nerf(CA[-1], C[-1], n_i, N_CA, aC_N_CA, 180.0)
        c_i = _nerf(C[-1], n_i, ca_i, CA_C, aN_CA_C, phi)
        N.append(n_i)
        CA.append(ca_i)
        C.append(c_i)
    O = [_nerf(N[i], CA[i], C[i], 1.231, aCA_C_O, psi + 180.0)
         for i in range(L)]
    a37 = np.zeros((L, 37, 3), np.float32)
    a37[:, 0], a37[:, 1], a37[:, 2], a37[:, 4] = N, CA, C, O
    return a37


def test_ideal_alpha_helix_reads_H_with_i_to_i4_hbonds():
    helix = ideal_backbone(-57.0, -47.0, 20)
    E = sc._ks_hbond_energy(helix)
    donors, acceptors = np.where(E < -0.5)
    assert len(donors) > 10
    np.testing.assert_array_equal(np.unique(donors - acceptors), [4])
    ss = sc.assign_secondary_structure(helix)
    assert np.mean(ss[2:-2] == "H") == 1.0


def test_isolated_extended_chain_is_coil():
    ext = ideal_backbone(-139.0, 135.0, 20)
    E = sc._ks_hbond_energy(ext)
    assert not np.any(E < -0.5)  # no H-bond partners -> no structure
    ss = sc.assign_secondary_structure(ext)
    assert np.all(ss == "C")


def test_antiparallel_sheet_reads_E():
    L = 8
    s1 = ideal_backbone(-139.0, 135.0, L)
    s2 = s1.copy()
    s2[..., 2] = -s2[..., 2] + 5.5  # mirror across the sheet plane
    s2 = s2[::-1]  # reverse order -> antiparallel partner
    both = np.concatenate([s1, s2])
    ss = sc.assign_secondary_structure(both)
    # interior residues of both strands pair up
    assert np.mean(ss == "E") >= 0.4
    assert "".join(ss[1:5]) == "EEEE"


def test_fractions_sum_to_one():
    helix = ideal_backbone(-57.0, -47.0, 16)
    f = sc.secondary_structure_fractions(helix)
    assert abs(f["helix_percent"] + f["strand_percent"]
               + f["coil_percent"] - 1.0) < 1e-9
    assert f["helix_percent"] > 0.6


def test_missing_backbone_atoms_do_not_fabricate_hbonds():
    """Residues with absent N/C/O sit at the origin in atom37; unmasked they
    fabricate ~-28 kcal/mol H-bonds. With mask37 they must be inert."""
    from dynamicpdb_tpu.analysis.structure_checks import _ks_hbond_energy

    a37 = np.array(ideal_backbone(-57.0, -47.0, 18), copy=True)
    m37 = np.zeros((18, 37), np.float32)
    m37[:, [0, 1, 2, 4]] = 1.0
    a37[7, [0, 2, 4]] = 0.0  # zero N, C, O like a real sparse PDB entry
    m37[7, [0, 2, 4]] = 0.0
    E = _ks_hbond_energy(a37, m37)
    assert (E[7] == 0).all() and (E[:, 7] == 0).all()
    # donors needing residue 7's C=O for H placement are silenced too
    assert (E[8] == 0).all()
