"""One-time generator for dynamicpdb_tpu/chem/tables.npz.

Extracts the *numeric* residue-chemistry tables (AlphaFold2 residue constants,
Apache-2.0, public scientific data: ideal rigid-group atom positions, rigid
group frames, chi-angle topology, atom14/atom37 index maps) from the copy
vendored by the reference repo, and re-derives the handful of tables that the
reference only builds inside featurization python loops
(openfold/data/data_transforms.py:755-1090, openfold/np/residue_constants.py).

Only numbers are extracted — no code. The output npz is committed so the
framework is standalone.

Run:  python tools/gen_chem_tables.py [path-to-residue_constants.py]
"""
import importlib.util
import sys

import numpy as np

RC_PATH = (
    sys.argv[1]
    if len(sys.argv) > 1
    else "/root/reference/openfold/np/residue_constants.py"
)

# make `openfold.resources` importable (stereo_chemical_props.txt used by
# make_atom14_dists_bounds)
sys.path.insert(0, "/root/reference")

spec = importlib.util.spec_from_file_location("af2_rc", RC_PATH)
rc = importlib.util.module_from_spec(spec)
spec.loader.exec_module(rc)

RESTYPES = rc.restypes  # 20 one-letter codes, AF2 order
ATOM_TYPES = rc.atom_types  # 37 atom names
ATOM_ORDER = rc.atom_order

out = {}

# --- directly available numeric tables -----------------------------------
out["restype_rigid_group_default_frame"] = np.asarray(
    rc.restype_rigid_group_default_frame, np.float32
)  # [21, 8, 4, 4]
out["restype_atom14_rigid_group_positions"] = np.asarray(
    rc.restype_atom14_rigid_group_positions, np.float32
)  # [21, 14, 3]
out["restype_atom14_to_rigid_group"] = np.asarray(
    rc.restype_atom14_to_rigid_group, np.int32
)
out["restype_atom14_mask"] = np.asarray(rc.restype_atom14_mask, np.float32)
out["restype_atom37_rigid_group_positions"] = np.asarray(
    rc.restype_atom37_rigid_group_positions, np.float32
)
out["restype_atom37_to_rigid_group"] = np.asarray(
    rc.restype_atom37_to_rigid_group, np.int32
)
out["restype_atom37_mask"] = np.asarray(rc.restype_atom37_mask, np.float32)
out["restype_atom37_to_atom14"] = np.asarray(rc.RESTYPE_ATOM37_TO_ATOM14, np.int32)
out["restype_atom14_ambiguous_atoms"] = np.asarray(
    rc.restype_atom14_ambiguous_atoms, np.float32
)
out["restype_atom14_ambiguous_swap_idx"] = np.asarray(
    rc.restype_atom14_ambiguous_atoms_swap_idx, np.int32
)

# --- chi-angle topology ---------------------------------------------------
chi_mask = np.asarray(list(rc.chi_angles_mask) + [[0.0] * 4], np.float32)  # [21, 4]
out["chi_angles_mask"] = chi_mask
chi_pi = np.asarray(list(rc.chi_pi_periodic), np.float32)  # [21, 4] (has UNK row)
if chi_pi.shape[0] == 20:
    chi_pi = np.concatenate([chi_pi, np.zeros((1, 4), np.float32)], 0)
out["chi_pi_periodic"] = chi_pi

# chi_atom_indices[restype, chi, 0..3] = atom37 index of the 4 dihedral atoms
chi_atom_idx = np.zeros((21, 4, 4), np.int32)
for i, r1 in enumerate(RESTYPES):
    res3 = rc.restype_1to3[r1]
    for ci, chain in enumerate(rc.chi_angles_atoms[res3]):
        chi_atom_idx[i, ci] = [ATOM_ORDER[a] for a in chain]
out["chi_atom_indices"] = chi_atom_idx

# --- rigid-group base atoms (atom37 indices of the 3 frame-defining atoms) ---
# group 0 = backbone (C, CA, N); group 3 = psi (CA, C, O);
# groups 4..7 = chi1..4 use atoms 1..3 of the chi dihedral definition.
base_idx = np.zeros((21, 8, 3), np.int32)
base_idx[:, 0] = [ATOM_ORDER["C"], ATOM_ORDER["CA"], ATOM_ORDER["N"]]
base_idx[:, 3] = [ATOM_ORDER["CA"], ATOM_ORDER["C"], ATOM_ORDER["O"]]
for i, r1 in enumerate(RESTYPES):
    res3 = rc.restype_1to3[r1]
    for ci in range(4):
        if chi_mask[i, ci]:
            names = rc.chi_angles_atoms[res3][ci]
            base_idx[i, ci + 4] = [ATOM_ORDER[a] for a in names[1:]]
out["rigidgroup_base_atom37_idx"] = base_idx

group_exists = np.zeros((21, 8), np.float32)
group_exists[:, 0] = 1
group_exists[:, 3] = 1
group_exists[:, 4:] = chi_mask
out["rigidgroup_exists"] = group_exists

# ambiguous rigid groups (180-deg symmetric terminal chis: D, E, F, Y ...)
ambig_group = np.zeros((21, 8), np.float32)
for res3 in rc.residue_atom_renaming_swaps:
    i = rc.restype_order[rc.restype_3to1[res3]]
    ci = int(chi_mask[i].sum()) - 1
    ambig_group[i, ci + 4] = 1.0
out["rigidgroup_is_ambiguous"] = ambig_group

# --- atom14 <-> atom37 ----------------------------------------------------
a14_to_a37 = np.zeros((21, 14), np.int32)
a14_mask = np.zeros((21, 14), np.float32)
for i, r1 in enumerate(RESTYPES):
    res3 = rc.restype_1to3[r1]
    names = rc.restype_name_to_atom14_names[res3]
    for j, name in enumerate(names):
        if name:
            a14_to_a37[i, j] = ATOM_ORDER[name]
            a14_mask[i, j] = 1.0
out["restype_atom14_to_atom37"] = a14_to_a37
assert np.allclose(a14_mask, out["restype_atom14_mask"])

# --- structural-violation constants (AF2 Suppl. 1.9.11 / openfold
# loss.py:714-1105): van-der-Waals radii per atom37 type, peptide-bond
# geometry stats, and the within-residue distance bounds at the standard
# (overlap 1.5, tolerance 12 sigma) configuration -------------------------
out["atom37_vdw_radius"] = np.asarray(
    [rc.van_der_waals_radius[name[0]] for name in ATOM_TYPES], np.float32
)
out["violation_scalars"] = np.asarray(
    [
        rc.between_res_bond_length_c_n[0],
        rc.between_res_bond_length_c_n[1],
        rc.between_res_bond_length_stddev_c_n[0],
        rc.between_res_bond_length_stddev_c_n[1],
        rc.between_res_cos_angles_ca_c_n[0],
        rc.between_res_cos_angles_ca_c_n[1],
        rc.between_res_cos_angles_c_n_ca[0],
        rc.between_res_cos_angles_c_n_ca[1],
        rc.ca_ca,
    ],
    np.float32,
)
bounds = rc.make_atom14_dists_bounds(
    overlap_tolerance=1.5, bond_length_tolerance_factor=12
)
out["atom14_dists_lower_bound"] = np.asarray(bounds["lower_bound"], np.float32)
out["atom14_dists_upper_bound"] = np.asarray(bounds["upper_bound"], np.float32)

np.savez_compressed("dynamicpdb_tpu/chem/tables.npz", **out)
print("wrote dynamicpdb_tpu/chem/tables.npz:")
for k, v in out.items():
    print(f"  {k}: {v.shape} {v.dtype}")
