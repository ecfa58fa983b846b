"""Periodic-boundary-condition unwrapping for MD trajectories.

Equivalent of the reference's data_preprocess/post_process.py:51-76: MD
engines wrap coordinates into the periodic box, so a molecule drifting across
a face appears to teleport by one box length. Detection: a jump in the mean
displacement between consecutive frames larger than half the box along an
axis; correction: shift that frame and all later ones back by one box length.

The reference reads the box size from an OpenMM checkpoint
(post_process.py:10-49); OpenMM isn't a dependency here — pass box_size
directly (A) or use ``box_from_openmm_checkpoint`` when OpenMM is available.
"""
from __future__ import annotations

import numpy as np


def unwrap_trajectory(positions: np.ndarray, box_size) -> np.ndarray:
    """Remove box-crossing jumps.

    Args:
        positions: [F, A, 3] wrapped coordinates (Angstroms).
        box_size: scalar or [3] box edge lengths (Angstroms).
    Returns:
        [F, A, 3] unwrapped coordinates (frame 0 unchanged).
    """
    positions = np.asarray(positions, np.float64)
    box = np.broadcast_to(np.asarray(box_size, np.float64), (3,))
    out = positions.copy()
    shift = np.zeros(3)
    for f in range(1, len(positions)):
        delta = (positions[f] - positions[f - 1]).mean(axis=0)
        jump = np.where(np.abs(delta) > box / 2, -np.sign(delta) * box, 0.0)
        shift = shift + jump
        out[f] = positions[f] + shift
    return out


def unwrap_per_atom(positions: np.ndarray, box_size) -> np.ndarray:
    """Stricter per-atom unwrapping (each atom tracked independently) for
    systems where sub-chains cross faces at different times."""
    positions = np.asarray(positions, np.float64)
    box = np.broadcast_to(np.asarray(box_size, np.float64), (3,))
    deltas = np.diff(positions, axis=0)
    jumps = np.where(np.abs(deltas) > box / 2, -np.sign(deltas) * box, 0.0)
    shifts = np.concatenate(
        [np.zeros_like(positions[:1]), np.cumsum(jumps, axis=0)], axis=0
    )
    return positions + shifts


def box_from_state_xml(xml_path: str) -> np.ndarray:
    """Box edge lengths (A) from an OpenMM State XML file (written with
    ``simulation.saveState``). Binary OpenMM checkpoints need the original
    System object (what the reference does, post_process.py:10-49) — export
    a State XML instead, or pass box_size directly."""
    import re

    with open(xml_path) as f:
        text = f.read()
    # OpenMM's XmlSerializer writes the box as capital <A .../><B .../><C .../>
    # children of <PeriodicBoxVectors>; accept either case and any attribute
    # spacing
    vecs = re.findall(
        r'<[ABC]\s+x="([^"]+)"\s+y="([^"]+)"\s+z="([^"]+)"',
        text,
        flags=re.IGNORECASE,
    )
    if len(vecs) != 3:
        raise ValueError(f"no periodic box vectors found in {xml_path}")
    # diagonal components, nm -> Angstrom
    return np.array([float(vecs[i][i]) for i in range(3)]) * 10.0
