"""Test geometry helpers: NeRF backbone construction from internal
coordinates (ideal bond lengths/angles + phi/psi dihedrals)."""
from __future__ import annotations

import numpy as np

from framedipt_tpu.data import constants as rc

# Ideal backbone internal coordinates (Engh & Huber).
B_N_CA, B_CA_C, B_C_N, B_C_O = 1.458, 1.525, 1.329, 1.231
A_N_CA_C, A_CA_C_N, A_C_N_CA = 111.2, 116.2, 121.7
A_CA_C_O = 120.8


def _place(a, b, c, bond, angle_deg, dihedral_deg):
    """NeRF: place atom d given three predecessors and internal coords."""
    angle = np.radians(angle_deg)
    dihedral = np.radians(dihedral_deg)
    bc = c - b
    bc /= np.linalg.norm(bc)
    n = np.cross(b - a, bc)
    n /= np.linalg.norm(n)
    m = np.cross(n, bc)
    d2 = np.asarray(
        [
            -bond * np.cos(angle),
            bond * np.sin(angle) * np.cos(dihedral),
            bond * np.sin(angle) * np.sin(dihedral),
        ]
    )
    return c + d2[0] * bc + d2[1] * m + d2[2] * n


def nerf_backbone(
    n_res: int, phi: float = -57.0, psi: float = -47.0, omega: float = 180.0
) -> tuple[np.ndarray, np.ndarray]:
    """atom37 positions + mask for an ideal (phi, psi) backbone with O."""
    a = rc.atom_order
    atoms = []  # flat list of (N, CA, C) per residue
    atoms.append(np.asarray([0.0, 0.0, 0.0]))  # N0
    atoms.append(np.asarray([B_N_CA, 0.0, 0.0]))  # CA0
    ang = np.radians(180.0 - A_N_CA_C)
    atoms.append(
        atoms[1] + B_CA_C * np.asarray([np.cos(ang), np.sin(ang), 0.0])
    )  # C0 — wait sign: place roughly; dihedrals fix the rest
    for i in range(1, n_res):
        n_prev, ca_prev, c_prev = atoms[-3], atoms[-2], atoms[-1]
        n_new = _place(n_prev, ca_prev, c_prev, B_C_N, A_CA_C_N, psi)
        ca_new = _place(ca_prev, c_prev, n_new, B_N_CA, A_C_N_CA, omega)
        c_new = _place(c_prev, n_new, ca_new, B_CA_C, A_N_CA_C, phi)
        atoms.extend([n_new, ca_new, c_new])

    atom37 = np.zeros((n_res, 37, 3))
    mask = np.zeros((n_res, 37))
    for i in range(n_res):
        n_xyz, ca, c = atoms[3 * i], atoms[3 * i + 1], atoms[3 * i + 2]
        atom37[i, a["N"]], atom37[i, a["CA"]], atom37[i, a["C"]] = n_xyz, ca, c
        mask[i, [a["N"], a["CA"], a["C"]]] = 1.0
        # O: dihedral N-CA-C-O = psi + 180 (anti to the next N).
        atom37[i, a["O"]] = _place(n_xyz, ca, c, B_C_O, A_CA_C_O, psi + 180.0)
        mask[i, a["O"]] = 1.0
    return atom37, mask
