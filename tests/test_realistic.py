"""Realistic-structure generator (data/realistic.py): geometry, sterics,
round-trips, and dynamics scale.

The generator is the stand-in for real dynamicPDB data (not downloadable
in this environment; no PDB/mmCIF exists in the image), so its realism
claims are pinned here: ideal covalent geometry (AF2 bond/angle violation
metrics exactly 0), Ramachandran-valid torsions that round-trip through
the featurizer, self-avoiding chains, clash-aware side chains, DSSP
agreement with the designed secondary structure, and MD-scale dynamics.
"""
import numpy as np
import pytest

from dynamicpdb_tpu.data import realistic as R

pytestmark = []


@pytest.fixture(scope="module")
def window():
    return R.make_realistic_window(n_res=40, frame_time=3, seed=0)


def test_nerf_dihedral_roundtrip():
    rng = np.random.default_rng(1)
    ss = R.sample_ss_plan(rng, 30)
    phi, psi, omega = R.sample_backbone_torsions(rng, ss)
    N, CA, C = R.build_backbone(phi, psi, omega)
    wrap = lambda x: (x + 180.0) % 360.0 - 180.0
    assert np.abs(wrap(R.dihedral(C[:-1], N[1:], CA[1:], C[1:]) - phi[1:])).max() < 1e-9
    assert np.abs(wrap(R.dihedral(N[:-1], CA[:-1], C[:-1], N[1:]) - psi[:-1])).max() < 1e-9
    assert np.abs(wrap(R.dihedral(CA[:-1], C[:-1], N[1:], CA[1:]) - omega[:-1])).max() < 1e-9


def test_ideal_bond_geometry():
    rng = np.random.default_rng(2)
    ss = R.sample_ss_plan(rng, 30)
    phi, psi, omega = R.build_self_avoiding_backbone(rng, ss)
    N, CA, C = R.build_backbone(phi, psi, omega)
    assert np.abs(np.linalg.norm(N - CA, axis=-1) - 1.458).max() < 1e-9
    assert np.abs(np.linalg.norm(CA - C, axis=-1) - 1.525).max() < 1e-9
    assert np.abs(np.linalg.norm(N[1:] - C[:-1], axis=-1) - 1.329).max() < 1e-9


def test_self_avoiding(window):
    for f in range(window["atom37"].shape[0]):
        ca = window["atom37"][f][:, 1]
        d = np.linalg.norm(ca[None] - ca[:, None], axis=-1)
        n = len(ca)
        adj = np.abs(np.arange(n)[None] - np.arange(n)[:, None]) <= 2
        assert np.where(adj, 99.0, d).min() > 3.8


def test_af2_violation_metrics(window):
    import jax.numpy as jnp

    from dynamicpdb_tpu.analysis import violations as viol

    for f in range(window["atom37"].shape[0]):
        vm = viol.compute_violation_metrics(
            jnp.asarray(window["atom37"][f]), jnp.asarray(window["atom37_mask"]),
            jnp.asarray(window["aatype"]), jnp.asarray(window["residue_index"]),
        )
        # covalent geometry is EXACTLY ideal by construction
        assert float(vm["violations_between_residue_bond"]) == 0.0
        assert float(vm["violations_extreme_ca_ca_distance"]) == 0.0
        # side chains are packed, not perfect: small residual clash only
        # (the old helix generator measured 0.91 here)
        assert float(vm["violations_between_residue_clash"]) < 0.25


def test_torsion_roundtrip_through_featurizer(window):
    import jax.numpy as jnp

    from dynamicpdb_tpu.ops import frames as frame_ops

    tor = frame_ops.atom37_to_torsion_angles(
        jnp.asarray(window["aatype"]), jnp.asarray(window["atom37"][0]),
        jnp.asarray(window["atom37_mask"]),
    )
    sc = np.asarray(tor["torsion_angles_sin_cos"])
    m = np.asarray(tor["torsion_angles_mask"])
    chi_rec = np.rad2deg(np.arctan2(sc[:, 3:, 0], sc[:, 3:, 1]))
    err = np.abs(((chi_rec - window["chi"]) + 180) % 360 - 180)
    # residual ~0.6 deg is AF2's own idealized-literature-geometry floor
    assert (err * window["chi_mask"] * m[:, 3:]).max() < 1.5


def test_dssp_agrees_with_designed_ss(window):
    from dynamicpdb_tpu.analysis.structure_checks import (
        assign_secondary_structure,
    )

    ss_pred = assign_secondary_structure(
        window["atom37"][0], window["atom37_mask"]
    )
    planned = np.array(list(window["ss"]))
    helix_planned = planned == "H"
    if helix_planned.sum() >= 6:
        # interior helix residues should be detected as H (ends fray)
        core = helix_planned & np.roll(helix_planned, 2) & np.roll(
            helix_planned, -2
        )
        agree = (ss_pred[core] == "H").mean()
        assert agree > 0.7, f"only {agree:.0%} of designed helix core read H"


def test_md_scale_dynamics(window):
    ca = window["atom37"][:, :, 1]
    step = np.sqrt(((ca[1:] - ca[:-1]) ** 2).sum(-1).mean(-1))
    assert (step > 0.05).all() and (step < 2.5).all(), step
    # velocities are the finite difference of the built trajectory
    np.testing.assert_allclose(
        window["vel"][1], (ca[1] - ca[0]) / 1.0, rtol=1e-5, atol=1e-5
    )


def test_featurizer_contract(window):
    import jax

    from dynamicpdb_tpu.data.featurize import featurize_window

    raw = {k: v for k, v in window.items()
           if k not in ("ss", "sequence", "chi", "chi_mask")}
    feats = featurize_window(
        jax.tree_util.tree_map(lambda x: np.asarray(x), raw)
    )
    assert feats["rigids_0"].shape == (3, 40, 7)
    assert np.isfinite(np.asarray(feats["torsion_angles_sin_cos"])).all()
