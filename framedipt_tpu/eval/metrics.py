"""Region-level evaluation metrics over Protein structures.

Role of evaluation/utils/metrics.py: backbone RMSD over diffusion regions at
model/chain/residue granularity computed as direct coordinate deltas (no
superposition — inpainting predictions share the fixed-region frame,
:25-184), full-atom RMSD (:185), phi/psi/omega dihedral extraction and
signed angle errors (:880-1208), and SASA/RSA via Shrake-Rupley (:419-718).
"""
from __future__ import annotations

import numpy as np

from framedipt_tpu.data import constants as rc
from framedipt_tpu.data.protein import Protein, int_to_chain_id

BACKBONE_ATOMS = ("N", "CA", "C", "O")
BACKBONE_IDX = tuple(rc.atom_order[a] for a in BACKBONE_ATOMS)
TCR_CHAINS = ("alpha", "beta")


# --------------------------------------------------------------------------
# Region extraction
# --------------------------------------------------------------------------


def _chain_residue_sel(prot: Protein, chain_letter: str) -> np.ndarray:
    """Boolean selector of residues in a chain, addressed by the letter the
    PDB writer assigned (sorted unique chain ints -> A, B, ...)."""
    sorted_ids = sorted(set(int(c) for c in prot.chain_index))
    letter_for = {cid: int_to_chain_id(i) for i, cid in enumerate(sorted_ids)}
    sel = np.asarray(
        [letter_for[int(c)] == chain_letter for c in prot.chain_index]
    )
    return sel


def get_region_backbone(
    prot: Protein, chain_letter: str, region: tuple[int, int]
) -> tuple[np.ndarray, np.ndarray]:
    """Backbone coords [L, 4, 3] + mask [L, 4] for residues
    region[0]..region[1] (inclusive, chain-local indices)."""
    sel = _chain_residue_sel(prot, chain_letter)
    idx = np.where(sel)[0]
    start, end = region
    idx = idx[start : end + 1]
    coords = prot.atom_positions[idx][:, BACKBONE_IDX, :]
    mask = prot.atom_mask[idx][:, BACKBONE_IDX]
    return coords, mask


# --------------------------------------------------------------------------
# RMSDs (direct deltas)
# --------------------------------------------------------------------------


def backbone_rmsd(
    prot_1: Protein,
    prot_2: Protein,
    chains: list[str],
    regions_1: list[tuple[int, int]],
    regions_2: list[tuple[int, int]],
) -> float:
    """Aggregate backbone RMSD over all diffusion regions."""
    deltas = []
    for ch, r1, r2 in zip(chains, regions_1, regions_2):
        c1, m1 = get_region_backbone(prot_1, ch, r1)
        c2, m2 = get_region_backbone(prot_2, ch, r2)
        m = (m1 * m2).astype(bool)
        deltas.append((c1 - c2)[m])
    d = np.concatenate(deltas, axis=0)
    return float(np.sqrt(np.sum(d**2) / len(d)))


def chain_backbone_rmsd(
    prot_1: Protein,
    prot_2: Protein,
    chains: list[str],
    regions_1: list[tuple[int, int]],
    regions_2: list[tuple[int, int]],
) -> dict[str, float]:
    out = {}
    for name, ch, r1, r2 in zip(TCR_CHAINS, chains, regions_1, regions_2):
        out[name] = backbone_rmsd(prot_1, prot_2, [ch], [r1], [r2])
    return out


def residue_backbone_rmsd(
    prot_1: Protein,
    prot_2: Protein,
    chains: list[str],
    regions_1: list[tuple[int, int]],
    regions_2: list[tuple[int, int]],
) -> dict[str, list[float]]:
    """Per-residue backbone RMSD within each region, keyed by chain role."""
    out = {}
    for name, ch, r1, r2 in zip(TCR_CHAINS, chains, regions_1, regions_2):
        c1, m1 = get_region_backbone(prot_1, ch, r1)
        c2, m2 = get_region_backbone(prot_2, ch, r2)
        m = m1 * m2
        per_res = np.sqrt(
            np.sum(((c1 - c2) ** 2).sum(-1) * m, axis=-1) / (m.sum(-1) + 1e-9)
        )
        out[name] = [float(x) for x in per_res]
    return out


def full_atom_rmsd(
    prot_1: Protein,
    prot_2: Protein,
    chains: list[str],
    regions_1: list[tuple[int, int]],
    regions_2: list[tuple[int, int]],
) -> float:
    """All-atom RMSD over the shared atom sets of the regions."""
    deltas = []
    for ch, r1, r2 in zip(chains, regions_1, regions_2):
        sel1 = np.where(_chain_residue_sel(prot_1, ch))[0][r1[0] : r1[1] + 1]
        sel2 = np.where(_chain_residue_sel(prot_2, ch))[0][r2[0] : r2[1] + 1]
        m = (prot_1.atom_mask[sel1] * prot_2.atom_mask[sel2]).astype(bool)
        deltas.append(
            (prot_1.atom_positions[sel1] - prot_2.atom_positions[sel2])[m]
        )
    d = np.concatenate(deltas, axis=0)
    return float(np.sqrt(np.sum(d**2) / len(d)))


# --------------------------------------------------------------------------
# Dihedrals
# --------------------------------------------------------------------------


def dihedral(p0, p1, p2, p3) -> np.ndarray:
    """Signed dihedral angle(s) in radians for points [..., 3]."""
    b0 = p0 - p1
    b1 = p2 - p1
    b2 = p3 - p2
    b1n = b1 / (np.linalg.norm(b1, axis=-1, keepdims=True) + 1e-9)
    v = b0 - np.sum(b0 * b1n, axis=-1, keepdims=True) * b1n
    w = b2 - np.sum(b2 * b1n, axis=-1, keepdims=True) * b1n
    x = np.sum(v * w, axis=-1)
    y = np.sum(np.cross(b1n, v) * w, axis=-1)
    return np.arctan2(y, x)


def backbone_dihedrals(
    prot: Protein, chain_letter: str, region: tuple[int, int] | None = None
) -> dict[str, np.ndarray]:
    """phi/psi/omega per residue of a chain (NaN where undefined)."""
    sel = np.where(_chain_residue_sel(prot, chain_letter))[0]
    pos = prot.atom_positions[sel]
    a = rc.atom_order
    n_xyz, ca, c = pos[:, a["N"]], pos[:, a["CA"]], pos[:, a["C"]]
    num = len(sel)
    phi = np.full(num, np.nan)
    psi = np.full(num, np.nan)
    omega = np.full(num, np.nan)
    if num > 1:
        phi[1:] = dihedral(c[:-1], n_xyz[1:], ca[1:], c[1:])
        psi[:-1] = dihedral(n_xyz[:-1], ca[:-1], c[:-1], n_xyz[1:])
        omega[1:] = dihedral(ca[:-1], c[:-1], n_xyz[1:], ca[1:])
    if region is not None:
        s, e = region
        phi, psi, omega = phi[s : e + 1], psi[s : e + 1], omega[s : e + 1]
    return {"phi": phi, "psi": psi, "omega": omega}


def angle_error(pred: np.ndarray, gt: np.ndarray, signed: bool = False) -> np.ndarray:
    """Periodic angle difference in radians, wrapped to (-pi, pi]."""
    diff = pred - gt
    wrapped = np.arctan2(np.sin(diff), np.cos(diff))
    return wrapped if signed else np.abs(wrapped)


# --------------------------------------------------------------------------
# SASA / RSA (Shrake-Rupley)
# --------------------------------------------------------------------------

# Theoretical max ASA per residue (Tien et al. 2013), A^2.
MAX_ASA = {
    "A": 129.0, "R": 274.0, "N": 195.0, "D": 193.0, "C": 167.0,
    "Q": 225.0, "E": 223.0, "G": 104.0, "H": 224.0, "I": 197.0,
    "L": 201.0, "K": 236.0, "M": 224.0, "F": 240.0, "P": 159.0,
    "S": 155.0, "T": 172.0, "W": 285.0, "Y": 263.0, "V": 174.0,
}
_PROBE_RADIUS = 1.4


def _sphere_points(n: int = 100) -> np.ndarray:
    """Fibonacci sphere point distribution."""
    i = np.arange(n) + 0.5
    phi = np.arccos(1 - 2 * i / n)
    theta = np.pi * (1 + 5**0.5) * i
    return np.stack(
        [np.cos(theta) * np.sin(phi), np.sin(theta) * np.sin(phi), np.cos(phi)],
        axis=-1,
    )


def shrake_rupley_sasa(
    prot: Protein, n_points: int = 100
) -> np.ndarray:
    """Per-residue solvent-accessible surface area (A^2)."""
    mask = prot.atom_mask.astype(bool)
    coords = prot.atom_positions[mask]
    elements = np.asarray(
        [rc.atom_types[j][0] for _ in range(prot.atom_mask.shape[0]) for j in range(37)]
    ).reshape(prot.atom_mask.shape)[mask]
    res_ids = np.repeat(np.arange(len(prot.aatype)), 37).reshape(
        prot.atom_mask.shape
    )[mask]
    radii = np.asarray(
        [rc.van_der_waals_radius.get(e, 1.7) for e in elements]
    ) + _PROBE_RADIUS

    sphere = _sphere_points(n_points)
    n_atoms = len(coords)
    areas = np.zeros(n_atoms)
    # Neighbor lists via a coarse cutoff.
    max_r = radii.max()
    for i in range(n_atoms):
        d = np.linalg.norm(coords - coords[i], axis=-1)
        neigh = np.where((d < radii[i] + max_r) & (d > 1e-9))[0]
        pts = coords[i] + sphere * radii[i]
        if len(neigh):
            dist2 = np.sum(
                (pts[:, None, :] - coords[neigh][None, :, :]) ** 2, axis=-1
            )
            buried = np.any(dist2 < (radii[neigh][None, :] ** 2), axis=-1)
        else:
            buried = np.zeros(len(pts), bool)
        accessible_frac = 1.0 - buried.mean()
        areas[i] = 4.0 * np.pi * radii[i] ** 2 * accessible_frac

    per_res = np.zeros(len(prot.aatype))
    np.add.at(per_res, res_ids, areas)
    return per_res


def relative_sasa(prot: Protein, sasa: np.ndarray | None = None) -> np.ndarray:
    """RSA = SASA / max-ASA(restype); NaN for unknown residues."""
    if sasa is None:
        sasa = shrake_rupley_sasa(prot)
    out = np.full(len(sasa), np.nan)
    for i, aa in enumerate(prot.aatype):
        one = rc.restypes[aa] if 0 <= aa < 20 else None
        if one and one in MAX_ASA:
            out[i] = sasa[i] / MAX_ASA[one]
    return out
