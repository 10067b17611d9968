"""Structural metrics: TM-score, aligned RMSD, CA geometry checks.

Role of framedipt/analysis/metrics.py. The reference shells out to tmtools
(TM-align bindings) and mdtraj; here TM-score and the Kabsch superposition
are implemented directly (numpy), and secondary structure / Rg live in
analysis/dssp.py.
"""
from __future__ import annotations

import numpy as np

from framedipt_tpu.data import constants as rc


# --------------------------------------------------------------------------
# Kabsch superposition
# --------------------------------------------------------------------------


def rigid_transform_3d(
    a: np.ndarray, b: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray, bool]:
    """Least-squares rigid transform mapping point set ``a`` onto ``b``
    ([N,3] each) with reflection correction. Returns (a_transformed, R, t,
    reflection_detected) — the contract of
    framedipt/data/transforms.py:77-128."""
    assert a.shape == b.shape
    centroid_a = a.mean(axis=0)
    centroid_b = b.mean(axis=0)
    am = a - centroid_a
    bm = b - centroid_b
    h = am.T @ bm
    u, _, vt = np.linalg.svd(h)
    r = vt.T @ u.T
    reflection = False
    if np.linalg.det(r) < 0:
        vt[2, :] *= -1
        r = vt.T @ u.T
        reflection = True
    t = centroid_b - r @ centroid_a
    return (r @ a.T).T + t, r, t, reflection


def calc_aligned_rmsd(pos_1: np.ndarray, pos_2: np.ndarray) -> float:
    """RMSD after optimal superposition (ref analysis/metrics.py:98-110)."""
    aligned = rigid_transform_3d(pos_1, pos_2)[0]
    return float(np.mean(np.linalg.norm(aligned - pos_2, axis=-1)))


def calc_rmsd(pos_1: np.ndarray, pos_2: np.ndarray) -> float:
    """Direct (unaligned) RMSD."""
    return float(np.sqrt(np.mean(np.sum((pos_1 - pos_2) ** 2, axis=-1))))


# --------------------------------------------------------------------------
# TM-score
# --------------------------------------------------------------------------


def _tm_d0(n: int) -> float:
    if n <= 21:
        return 0.5
    return 1.24 * (n - 15) ** (1.0 / 3.0) - 1.8


def _tm_from_distances(d2: np.ndarray, d0: float, norm_len: int) -> float:
    return float(np.sum(1.0 / (1.0 + d2 / d0**2)) / norm_len)


def calc_tm_score(
    pos_1: np.ndarray,
    pos_2: np.ndarray,
    seq_1: str | None = None,
    seq_2: str | None = None,
) -> tuple[float, float]:
    """TM-score between two CA traces of equal length (residue i aligned to
    residue i — the self-consistency / inpainting evaluation regime of
    analysis/metrics.py:48-66).

    Implements the Zhang-Skolnick iterative superposition search: seed
    fragments of multiple sizes, superpose, keep residues within a distance
    cutoff, re-superpose until the aligned set converges, score with
    d0(L). Returns (TM normalized by len1, by len2); lengths are equal here
    so the two values differ only by the d0 normalization convention.
    """
    del seq_1, seq_2  # correspondence is positional for equal-length pairs
    n = pos_1.shape[0]
    if n != pos_2.shape[0]:
        raise ValueError("calc_tm_score expects equal-length CA traces")
    if n < 3:
        return 0.0, 0.0
    d0 = max(_tm_d0(n), 0.5)

    best_tm = -1.0
    best_d2 = None
    frag_lens = sorted({n, max(4, n // 2), max(4, n // 4)}, reverse=True)
    for frag in frag_lens:
        starts = range(0, n - frag + 1, max(1, frag // 2))
        for s in starts:
            sel = np.zeros(n, bool)
            sel[s : s + frag] = True
            for _ in range(20):
                if sel.sum() < 3:
                    break
                aligned, r, t, _ = rigid_transform_3d(pos_1[sel], pos_2[sel])
                moved = (r @ pos_1.T).T + t
                d2 = np.sum((moved - pos_2) ** 2, axis=-1)
                tm = _tm_from_distances(d2, d0, n)
                if tm > best_tm:
                    best_tm = tm
                    best_d2 = d2
                new_sel = d2 < max(d0, 3.0) ** 2
                if new_sel.sum() < 3 or np.array_equal(new_sel, sel):
                    break
                sel = new_sel
    tm1 = _tm_from_distances(best_d2, max(_tm_d0(n), 0.5), n)
    return tm1, best_tm


# --------------------------------------------------------------------------
# CA geometry (ref analysis/metrics.py:185-218)
# --------------------------------------------------------------------------


def ca_ca_distance(ca_pos: np.ndarray, tol: float = 0.1) -> tuple[float, float]:
    dists = np.linalg.norm(ca_pos - np.roll(ca_pos, 1, axis=0), axis=-1)[1:]
    dev = float(np.mean(np.abs(dists - rc.ca_ca)))
    valid = float(np.mean(dists < (rc.ca_ca + tol)))
    return dev, valid


def ca_ca_clashes(ca_pos: np.ndarray, tol: float = 1.5) -> tuple[float, float]:
    d = np.linalg.norm(ca_pos[:, None] - ca_pos[None, :], axis=-1)
    iu = np.triu_indices(len(ca_pos), k=1)
    inter = d[iu]
    clashes = inter < tol
    return float(clashes.sum()), float(clashes.mean())


# --------------------------------------------------------------------------
# Aggregate (ref analysis/metrics.py:112-183)
# --------------------------------------------------------------------------


def protein_metrics(
    *,
    pdb_path,
    atom37_pos: np.ndarray,
    gt_atom37_pos: np.ndarray,
    gt_aatype: np.ndarray,
    diffuse_mask: np.ndarray,
) -> dict[str, float]:
    """Aggregate plausibility + accuracy metrics for one prediction."""
    from framedipt_tpu.analysis import dssp as dssp_lib
    from framedipt_tpu.analysis import violations as viol_lib

    atom37_mask = np.any(atom37_pos, axis=-1)
    bb_mask = np.any(atom37_mask, axis=-1)

    ss_metrics = dssp_lib.ss_metrics_from_atom37(
        atom37_pos[bb_mask.astype(bool)], atom37_mask[bb_mask.astype(bool)]
    )

    ca_pos = atom37_pos[..., rc.CA_IDX, :][bb_mask.astype(bool)]
    ca_dev, ca_valid = ca_ca_distance(ca_pos)
    num_clash, clash_pct = ca_ca_clashes(ca_pos)

    bb_diffuse_mask = (diffuse_mask * bb_mask).astype(bool)
    gt_ca = gt_atom37_pos[..., rc.CA_IDX, :][bb_diffuse_mask]
    pred_ca = atom37_pos[..., rc.CA_IDX, :][bb_diffuse_mask]
    _, tm = calc_tm_score(pred_ca, gt_ca)

    viol = viol_lib.violation_metrics(
        atom37_pos, atom37_mask.astype(np.float32), gt_aatype
    )

    out = {
        "ca_ca_bond_dev": ca_dev,
        "ca_ca_valid_percent": ca_valid,
        "ca_steric_clash_percent": clash_pct,
        "num_ca_steric_clashes": num_clash,
        "tm_score": tm,
        **ss_metrics,
        **viol,
    }
    del pdb_path  # SS computed from arrays directly (no mdtraj round-trip)
    return {k: float(np.mean(v)) for k, v in out.items()}
