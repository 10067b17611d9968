"""Atom predicates (role of framedipt/protein/filters.py:7-55)."""
from __future__ import annotations

from framedipt_tpu.data import constants as rc

BACKBONE_ATOM_NAMES = frozenset({"N", "CA", "C", "O"})


def is_backbone(atom_name: str) -> bool:
    return atom_name in BACKBONE_ATOM_NAMES


def is_ca(atom_name: str) -> bool:
    return atom_name == "CA"


def is_heavy(atom_name: str) -> bool:
    """All atom37 atoms are heavy (no hydrogens in the convention)."""
    return atom_name in rc.atom_order
