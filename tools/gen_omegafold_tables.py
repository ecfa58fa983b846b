"""Generate dynamicpdb_tpu/chem/omegafold_tables.npz.

Provenance: the numeric residue-constant tables of the OmegaFold embedding
extractor (/root/reference/src/toolbox/OmegaFold/omegafold/utils/
protein_utils/residue_constants.py:493-575) — rigid-group default frames and
atom14 literature positions in OmegaFold's OWN torsion-group convention
(which differs from the AF2 convention used by ops/frames; see
docs/OMEGAFOLD_PORT.md step 6). These are physical constants (idealized
amino-acid geometry), not learned weights.

Run with the reference mounted:  python tools/gen_omegafold_tables.py
"""
import os
import sys
import types

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "dynamicpdb_tpu", "chem", "omegafold_tables.npz",
)

REF = "/root/reference/src/toolbox/OmegaFold"


def main():
    for name in ["Bio", "Bio.PDB", "Bio.Data", "Bio.Data.SCOPData"]:
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["Bio"].PDB = sys.modules["Bio.PDB"]
    sys.modules["Bio"].Data = sys.modules["Bio.Data"]
    sys.modules["Bio.Data"].SCOPData = sys.modules["Bio.Data.SCOPData"]
    sys.modules["Bio.Data.SCOPData"].protein_letters_3to1 = {}
    sys.path.insert(0, REF)

    import numpy as np
    from omegafold.utils.protein_utils import residue_constants as rc

    np.savez_compressed(
        OUT,
        restype_aa_default_frame=rc.restype_aa_default_frame.numpy(),
        restype_atom14_to_aa=rc.restype_atom14_to_aa.numpy(),
        restype_atom14_mask=rc.restype_atom14_mask.numpy(),
        restype_atom14_aa_positions=rc.restype_atom14_aa_positions.numpy(),
        restype2atom_mask=rc.restype2atom_mask.numpy(),
    )
    print("wrote", OUT)


if __name__ == "__main__":
    main()
