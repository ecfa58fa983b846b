"""Golden-parity tests: our jnp featurization geometry vs the reference
openfold (torch) outputs captured in tests/goldens/frames_golden.npz."""
import os

import numpy as np
import pytest

import jax.numpy as jnp

from dynamicpdb_tpu.ops import frames as F
from dynamicpdb_tpu.ops.rigid import Rigid

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "frames_golden.npz")


@pytest.fixture(scope="module")
def g():
    with np.load(GOLDEN) as z:
        return {k: z[k] for k in z.files}


@pytest.fixture(scope="module")
def ours(g):
    aatype = jnp.asarray(g["aatype"])
    atom37 = jnp.asarray(g["atom37"], jnp.float32)
    mask = jnp.asarray(g["atom37_mask"], jnp.float32)
    return {
        "frames": F.atom37_to_frames(aatype, atom37, mask),
        "torsions": F.atom37_to_torsion_angles(aatype, atom37, mask),
        "atom14": F.atom37_to_atom14(atom37, aatype, mask),
    }


def test_gt_frames_parity(g, ours):
    got = np.asarray(ours["frames"]["gt_frames"].to_tensor_4x4())
    np.testing.assert_allclose(got, g["rigidgroups_gt_frames"], atol=2e-4)


def test_gt_exists_parity(g, ours):
    np.testing.assert_allclose(
        np.asarray(ours["frames"]["gt_exists"]), g["rigidgroups_gt_exists"], atol=0
    )


def test_alt_frames_and_ambiguity_parity(g, ours):
    np.testing.assert_allclose(
        np.asarray(ours["frames"]["alt_gt_frames"].to_tensor_4x4()),
        g["rigidgroups_alt_gt_frames"],
        atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(ours["frames"]["is_ambiguous"]),
        g["rigidgroups_is_ambiguous"],
        atol=0,
    )


def test_backbone_rigid_matches_group0(g, ours):
    # only where the backbone frame exists: a residue with dropped backbone
    # atoms yields a zero rotation matrix, which has no quat representation
    # (the reference loses it identically at its to_tensor_7 boundary)
    exists = g["rigidgroups_gt_exists"][:, 0].astype(bool)
    bb = ours["frames"]["backbone_rigid"]
    got = np.asarray(bb.to_tensor_7())[exists]
    ref4x4 = g["rigidgroups_gt_frames"][:, 0][exists]
    np.testing.assert_allclose(got[..., 4:], ref4x4[..., :3, 3], atol=1e-4)
    ours_rot = np.asarray(Rigid.from_tensor_7(jnp.asarray(got)).rotmat())
    np.testing.assert_allclose(ours_rot, ref4x4[..., :3, :3], atol=2e-4)


def test_torsion_angles_parity(g, ours):
    # compare under the validity mask: masked angles come from degenerate
    # Gram-Schmidt frames and are precision-dependent garbage in both
    # implementations (the model multiplies them by the mask anyway,
    # ipa_pytorch_dynamic.py:841)
    t = ours["torsions"]
    m = g["torsion_angles_mask"][..., None]
    np.testing.assert_allclose(
        np.asarray(t["torsion_angles_sin_cos"]) * m,
        g["torsion_angles_sin_cos"] * m,
        atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(t["alt_torsion_angles_sin_cos"]) * m,
        g["alt_torsion_angles_sin_cos"] * m,
        atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(t["torsion_angles_mask"]), g["torsion_angles_mask"], atol=0
    )


def test_atom14_parity(g, ours):
    pos, exists = ours["atom14"]
    np.testing.assert_allclose(np.asarray(pos), g["atom14_gt_positions"], atol=1e-5)
    np.testing.assert_allclose(np.asarray(exists), g["atom14_gt_exists"], atol=0)


def test_torsion_angles_to_frames_parity(g):
    aatype = jnp.asarray(g["aatype"])
    bb = Rigid(jnp.asarray(g["taf_quat"], jnp.float32), jnp.asarray(g["taf_trans"], jnp.float32))
    angles = jnp.asarray(g["taf_angles"], jnp.float32)
    fr = F.torsion_angles_to_frames(bb, angles, aatype)
    np.testing.assert_allclose(
        np.asarray(fr.to_tensor_4x4()), g["taf_all_frames"], atol=2e-4
    )
    atom14 = F.frames_to_atom14_pos(fr, aatype)
    np.testing.assert_allclose(np.asarray(atom14), g["taf_atom14"], atol=5e-4)


def test_atom14_to_atom37_roundtrip(g):
    aatype = jnp.asarray(g["aatype"])
    atom37 = jnp.asarray(g["atom37"], jnp.float32)
    mask37 = jnp.asarray(g["atom37_mask"], jnp.float32)
    atom14, exists14 = F.atom37_to_atom14(atom37, aatype, mask37)
    back37, mask_back = F.atom14_to_atom37(atom14, aatype)
    # every standard atom present in atom14 must land back in place
    common = np.asarray(mask_back) * np.asarray(mask37)
    np.testing.assert_allclose(
        np.asarray(back37) * common[..., None],
        np.asarray(atom37) * common[..., None],
        atol=1e-5,
    )


def test_frames_vmap_over_time_axis(g):
    """Featurizer must vmap over the frame/time axis (the DFOLD window)."""
    import jax

    aatype = jnp.asarray(g["aatype"])
    atom37 = jnp.tile(jnp.asarray(g["atom37"], jnp.float32)[None], (3, 1, 1, 1))
    mask = jnp.tile(jnp.asarray(g["atom37_mask"], jnp.float32)[None], (3, 1, 1))
    out = jax.vmap(lambda a: F.atom37_to_frames(aatype, a, mask[0]))(atom37)
    assert out["gt_frames"].rots.shape == (3, 24, 8, 3, 3)


def test_compute_backbone_atom37(g):
    aatype = jnp.asarray(g["aatype"])
    bb = Rigid(jnp.asarray(g["taf_quat"], jnp.float32), jnp.asarray(g["taf_trans"], jnp.float32))
    angles = jnp.asarray(g["taf_angles"], jnp.float32)
    atom37, mask = F.compute_backbone_atom37(bb, aatype, angles)
    assert atom37.shape == (24, 37, 3)
    # backbone N/CA/C present for every standard residue (UNK has an all-zero
    # atom mask in the AF2 tables, so it drops out — same as the reference)
    standard = np.asarray(aatype) < 20
    assert bool(jnp.all(mask[standard, :3]))
