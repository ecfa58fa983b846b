"""Stub the reference's heavy/unavailable deps so the GENUINE reference
training code (train_DFOLD_dynamics.py) imports in this environment.

Only modules the reference imports at module scope but never calls during a
pure loss_fn/optimizer-step run are stubbed (viz/MD/relax toolchains). The
numerics under test — model, diffusers, openfold loss/rigid utils — are the
real reference code.

Usage: ``import tools.ref_stubs`` (idempotent) before importing anything
from /root/reference, then ``sys.path.insert(0, "/root/reference")``.
"""
import sys
import types


def _stub(name, **attrs):
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        sys.modules[name] = mod
    for k, v in attrs.items():
        setattr(mod, k, v)
    # register on the parent package so `from a.b import c` resolves
    if "." in name:
        parent, child = name.rsplit(".", 1)
        if parent in sys.modules:
            setattr(sys.modules[parent], child, mod)
    return mod


def install():
    for name in [
        "GPUtil", "wandb",
        "Bio", "Bio.PDB", "Bio.PDB.Chain", "Bio.SVDSuperimposer",
        "omegaconf",
        "mdtraj", "tmtools",
        "MDAnalysis", "MDAnalysis.analysis",
        "MDAnalysis.analysis.rms", "MDAnalysis.analysis.align",
        "MDAnalysis.analysis.rdf", "MDAnalysis.analysis.contacts",
        "pdbfixer",
        "openmm", "openmm.app", "openmm.unit",
        "simtk", "simtk.openmm", "simtk.openmm.app",
        "simtk.openmm.app.element", "simtk.unit",
        "hydra", "hydra.core", "hydra.core.hydra_config",
        "deepspeed",
    ]:
        _stub(name)

    _stub("tmtools", tm_align=None)
    _stub("Bio.PDB", PDBParser=object)
    _stub("Bio.PDB.Chain", Chain=object)
    _stub("Bio.SVDSuperimposer", SVDSuperimposer=object)
    _stub("omegaconf", OmegaConf=object, DictConfig=object)
    _stub("hydra", main=lambda **kw: (lambda f: f))
    _stub("hydra.core.hydra_config", HydraConfig=object)
    _stub("deepspeed",
          utils=types.SimpleNamespace(is_initialized=lambda: False))
    # openfold.np.relax.cleanup touches these names at import time
    _stub("simtk.unit", kelvin=1.0, picosecond=1.0, femtosecond=1.0,
          angstroms=1.0, kilocalories_per_mole=1.0)
    _stub("simtk.openmm.app", element=sys.modules["simtk.openmm.app.element"],
          PDBFile=object, Modeller=object, ForceField=object)
    _stub("openmm.unit", **vars(sys.modules["simtk.unit"]))

    # openfold.np.relax cannot import here (pdbfixer/openmm internals
    # missing) and is only used for AMBER relaxation during analysis —
    # never during a training step. Pre-seed sys.modules so the real
    # subpackage import is bypassed.
    for name in ["openfold.np.relax", "openfold.np.relax.amber_minimize",
                 "openfold.np.relax.relax", "openfold.np.relax.cleanup",
                 "openfold.np.relax.utils"]:
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    rel = sys.modules["openfold.np.relax"]
    for child in ["amber_minimize", "relax", "cleanup", "utils"]:
        setattr(rel, child, sys.modules[f"openfold.np.relax.{child}"])

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")


install()
