"""Chemical constant tables (AlphaFold2 conventions).

Loaded from the binary data artifact ``chemical_tables.npz`` /
``chemical_names.json`` extracted by scripts/extract_chemical_tables.py —
ideal residue geometry, atom37/atom14 orders, rigid-group frames. Same
content as the reference's framedipt/protein/residue_constants.py tables
(:974-980 etc.) but shipped as data, not a 1.1k-line literal module.
"""
from __future__ import annotations

import functools
import json
import pathlib

import numpy as np

_DIR = pathlib.Path(__file__).resolve().parent


@functools.lru_cache(maxsize=1)
def _arrays() -> dict[str, np.ndarray]:
    with np.load(_DIR / "chemical_tables.npz") as z:
        return {k: z[k] for k in z.files}


@functools.lru_cache(maxsize=1)
def _names() -> dict:
    return json.loads((_DIR / "chemical_names.json").read_text())


def __getattr__(name: str):
    arrays = _arrays()
    if name in arrays:
        return arrays[name]
    names = _names()
    if name in names:
        return names[name]
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


# Frequently used derived values, materialized eagerly for clarity.
restypes: list[str] = _names()["restypes"]  # 20 one-letter codes
restypes_with_x: list[str] = _names()["restypes_with_x"]
restype_order: dict[str, int] = {r: i for i, r in enumerate(restypes)}
restype_num: int = len(restypes)  # 20
unk_restype_index: int = _names()["unk_restype_index"]  # 20

atom_types: list[str] = _names()["atom_types"]  # 37 atom names
atom_order: dict[str, int] = {a: i for i, a in enumerate(atom_types)}
atom_type_num: int = len(atom_types)  # 37

restype_1to3: dict[str, str] = _names()["restype_1to3"]
restype_3to1: dict[str, str] = _names()["restype_3to1"]

# Backbone conventions.
BACKBONE_ATOMS = ("N", "CA", "C", "O")
BACKBONE_IDX = tuple(atom_order[a] for a in BACKBONE_ATOMS)
CA_IDX = atom_order["CA"]
ca_ca: float = _names()["ca_ca"]  # ideal CA-CA distance 3.80209737096

van_der_waals_radius: dict[str, float] = _names()["van_der_waals_radius"]


def sequence_to_aatype(seq: str) -> np.ndarray:
    """One-letter sequence -> aatype indices (unknown -> 20)."""
    return np.asarray(
        [restype_order.get(c, unk_restype_index) for c in seq], np.int32
    )


def aatype_to_sequence(aatype: np.ndarray) -> str:
    return "".join(
        restypes[i] if 0 <= i < restype_num else "X" for i in np.asarray(aatype)
    )
