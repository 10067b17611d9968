"""Parity tests compare against the reference PyTorch implementation at
/root/reference, imported read-only as a numerical oracle (BioPython is
stubbed out — only tensor math is exercised). Skipped automatically when
the reference checkout is absent."""
import pathlib
import sys
import types

import pytest

REFERENCE = pathlib.Path("/root/reference")


def _install_bio_stub():
    if "Bio" in sys.modules:
        return
    bio = types.ModuleType("Bio")
    bio_pdb = types.ModuleType("Bio.PDB")
    for name in ("PDBParser", "MMCIFParser", "PDBIO", "Select"):
        setattr(bio_pdb, name, object)
    # Submodules referenced only in (string) type annotations.
    for sub in ("Model", "Structure", "Chain", "Residue", "Atom"):
        mod = types.ModuleType(f"Bio.PDB.{sub}")
        setattr(mod, sub, object)
        setattr(bio_pdb, sub, mod)
        sys.modules[f"Bio.PDB.{sub}"] = mod
    bio.PDB = bio_pdb
    sys.modules["Bio"] = bio
    sys.modules["Bio.PDB"] = bio_pdb
    # GPUtil (reference's device picker) — never exercised in parity tests.
    gputil = types.ModuleType("GPUtil")
    gputil.getAvailable = lambda *a, **k: []
    sys.modules.setdefault("GPUtil", gputil)
    # hydra (reference CLI glue) — only HydraConfig is touched at import.
    hydra = types.ModuleType("hydra")
    hydra_core = types.ModuleType("hydra.core")
    hydra_cfg = types.ModuleType("hydra.core.hydra_config")

    class _HydraConfig:  # pragma: no cover - import-time stub
        @staticmethod
        def get():
            raise RuntimeError("hydra not available in tests")

    hydra_cfg.HydraConfig = _HydraConfig
    hydra.core = hydra_core
    hydra_core.hydra_config = hydra_cfg
    sys.modules.setdefault("hydra", hydra)
    sys.modules.setdefault("hydra.core", hydra_core)
    sys.modules.setdefault("hydra.core.hydra_config", hydra_cfg)
    # pairwise2 (used by framedipt/protein/align.py).
    pairwise2 = types.ModuleType("Bio.pairwise2")
    bio.pairwise2 = pairwise2
    sys.modules["Bio.pairwise2"] = pairwise2


@pytest.fixture(scope="session")
def reference():
    """Namespace of reference torch modules, or skip."""
    if not REFERENCE.exists():
        pytest.skip("reference checkout not available")
    _install_bio_stub()
    if str(REFERENCE) not in sys.path:
        sys.path.insert(0, str(REFERENCE))
    import openfold.data.data_transforms as ref_transforms
    import openfold.utils.rigid_utils as ref_rigid
    from framedipt.protein import all_atom as ref_all_atom

    ns = types.SimpleNamespace(
        transforms=ref_transforms, rigid=ref_rigid, all_atom=ref_all_atom
    )
    return ns
