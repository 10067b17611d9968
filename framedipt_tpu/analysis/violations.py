"""AF2-style structural violation metrics (numpy).

Role of the reference's amber_minimize.get_violation_metrics call
(framedipt/analysis/metrics.py:152): inter-residue C-N bond-length loss,
CA-C-N angle loss, and non-bonded clash loss, computed with the AlphaFold2
supplementary formulas (soft tolerance factor 12 for bonds/angles, 1.5 A
overlap tolerance for clashes; peptide-bond C-N and disulfide SG-SG pairs
exempted).
"""
from __future__ import annotations

import numpy as np

from framedipt_tpu.data import constants as rc
from framedipt_tpu.data.transforms import make_atom14_positions

_TOLERANCE_FACTOR = 12.0
_CLASH_OVERLAP_TOLERANCE = 1.5
_EPS = 1e-6


def violation_metrics(
    atom37_pos: np.ndarray, atom37_mask: np.ndarray, aatype: np.ndarray
) -> dict[str, float]:
    aatype = np.clip(np.asarray(aatype, np.int64), 0, 20)
    n = len(aatype)
    if n < 2:
        return {
            "bonds_c_n_loss_mean": 0.0,
            "angles_ca_c_n_loss_mean": 0.0,
            "clashes_mean_loss": 0.0,
        }
    a = rc.atom_order

    this_ca = atom37_pos[:-1, a["CA"]]
    this_c = atom37_pos[:-1, a["C"]]
    next_n = atom37_pos[1:, a["N"]]
    next_ca = atom37_pos[1:, a["CA"]]
    this_c_mask = atom37_mask[:-1, a["C"]]
    this_ca_mask = atom37_mask[:-1, a["CA"]]
    next_n_mask = atom37_mask[1:, a["N"]]
    next_ca_mask = atom37_mask[1:, a["CA"]]

    # ---- C-N bond length ----
    c_n = np.linalg.norm(this_c - next_n, axis=-1)
    next_is_pro = (
        aatype[1:] == rc.restype_order.get("P", 14)
    ).astype(np.float64)
    bond_len = np.asarray(rc.between_res_bond_length_c_n)
    bond_std = np.asarray(rc.between_res_bond_length_stddev_c_n)
    gt_len = (1.0 - next_is_pro) * bond_len[0] + next_is_pro * bond_len[1]
    gt_std = (1.0 - next_is_pro) * bond_std[0] + next_is_pro * bond_std[1]
    err = np.sqrt(_EPS + (c_n - gt_len) ** 2)
    loss = np.maximum(err - _TOLERANCE_FACTOR * gt_std, 0.0)
    mask = this_c_mask * next_n_mask
    bonds_c_n_loss = float(np.sum(mask * loss) / (np.sum(mask) + _EPS))

    # ---- CA-C-N angle ----
    def unit(v):
        return v / (np.linalg.norm(v, axis=-1, keepdims=True) + 1e-9)

    c_ca = unit(this_ca - this_c)
    c_nn = unit(next_n - this_c)
    cos_angle = np.sum(c_ca * c_nn, axis=-1)
    gt_cos = rc.between_res_cos_angles_ca_c_n[0]
    gt_cos_std = rc.between_res_cos_angles_ca_c_n[1]
    err = np.sqrt(_EPS + (cos_angle - gt_cos) ** 2)
    loss = np.maximum(err - _TOLERANCE_FACTOR * gt_cos_std, 0.0)
    mask = this_ca_mask * this_c_mask * next_n_mask
    angles_ca_c_n_loss = float(np.sum(mask * loss) / (np.sum(mask) + _EPS))
    del next_ca, next_ca_mask

    # ---- non-bonded clashes (atom14) ----
    a14 = make_atom14_positions(aatype, atom37_pos, atom37_mask)
    pos14 = a14["atom14_gt_positions"]  # [N, 14, 3]
    mask14 = a14["atom14_gt_exists"]  # [N, 14]

    radii = np.zeros((21, 14))
    for r_i, r1 in enumerate(rc.restypes):
        names = rc.restype_name_to_atom14_names[rc.restype_1to3[r1]]
        for j, name in enumerate(names):
            if name:
                radii[r_i, j] = rc.van_der_waals_radius[name[0]]
    atom_radius = radii[aatype] * mask14  # [N, 14]

    flat_pos = pos14.reshape(-1, 3)
    flat_mask = mask14.reshape(-1)
    flat_radius = atom_radius.reshape(-1)
    res_idx = np.repeat(np.arange(n), 14)
    atom_idx = np.tile(np.arange(14), n)

    d = np.linalg.norm(flat_pos[:, None] - flat_pos[None, :], axis=-1) + 1e-10
    pair_mask = flat_mask[:, None] * flat_mask[None, :]
    # Different residues only; count each pair once (i < j by residue).
    pair_mask = pair_mask * (res_idx[:, None] < res_idx[None, :])

    # Peptide-bond C(i)-N(i+1) exemption (atom14: C=2, N=0).
    neighbor = res_idx[:, None] + 1 == res_idx[None, :]
    c_n_bond = neighbor & (atom_idx[:, None] == 2) & (atom_idx[None, :] == 0)
    pair_mask = pair_mask * (1.0 - c_n_bond)

    # Disulfide SG-SG exemption.
    cys_idx = rc.restype_order.get("C", 4)
    sg_pos14 = rc.restype_name_to_atom14_names["CYS"].index("SG")
    is_sg = (np.repeat(aatype, 14) == cys_idx) & (atom_idx == sg_pos14)
    pair_mask = pair_mask * (1.0 - (is_sg[:, None] & is_sg[None, :]))

    allowed = flat_radius[:, None] + flat_radius[None, :]
    clash_loss = np.maximum(allowed - _CLASH_OVERLAP_TOLERANCE - d, 0.0)
    clashes_mean = float(
        np.sum(pair_mask * clash_loss) / (np.sum(pair_mask) + _EPS)
    )

    return {
        "bonds_c_n_loss_mean": bonds_c_n_loss,
        "angles_ca_c_n_loss_mean": angles_ca_c_n_loss,
        "clashes_mean_loss": clashes_mean,
    }
