"""External ground truth for the Shrake-Rupley SASA path (VERDICT r2 item 6).

Round 2 validated the vectorized Shrake-Rupley only against the builder's
own loop implementation; these tests anchor it against NON-SELF sources:

1. closed-form sphere/spherical-cap areas (exact math, no protein code);
2. the published Tien et al. 2013 max-ASA tables (PLoS ONE 8(11): e80635,
   Table 1) via ideal extended Gly-X-Gly tripeptides built from the
   AF2 rigid-group literature geometry;
3. the reference's own RSA normalization table (MAX_SASAs,
   /root/reference/framedipt/protein/residue_constants.py:682-703) — the
   empirical Tien column — which framedipt_tpu.eval.metrics.MAX_ASA must
   match exactly for eval parity (ref evaluation/utils/metrics.py:663-666).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from framedipt_tpu.data import constants as rc
from framedipt_tpu.data.protein import Protein
from framedipt_tpu.eval.metrics import (
    MAX_ASA,
    MAX_ASA_THEORETICAL,
    _PROBE_RADIUS,
    relative_sasa,
    shrake_rupley_sasa,
)
from framedipt_tpu.geometry import frames as frames_lib
from framedipt_tpu.geometry.rigid import Rigid

from tests.unit.geom_helpers import nerf_backbone


def _prot_from_atoms(coords_by_res: list[dict[str, np.ndarray]]) -> Protein:
    """Build a Protein from {atom37_name: xyz} dicts (one per residue)."""
    n = len(coords_by_res)
    pos = np.zeros((n, 37, 3))
    mask = np.zeros((n, 37))
    for i, atoms in enumerate(coords_by_res):
        for name, xyz in atoms.items():
            pos[i, rc.atom_order[name]] = xyz
            mask[i, rc.atom_order[name]] = 1.0
    return Protein(
        atom_positions=pos,
        atom_mask=mask,
        aatype=np.zeros(n, np.int64),  # ALA; irrelevant for absolute ASA
        residue_index=np.arange(1, n + 1),
        chain_index=np.zeros(n, np.int64),
        b_factors=np.zeros((n, 37)),
    )


def test_single_sphere_analytic():
    """One isolated carbon: SASA must equal 4*pi*(r_C + probe)^2 exactly
    (every test point is accessible — zero sampling error)."""
    prot = _prot_from_atoms([{"CA": np.zeros(3)}])
    r = rc.van_der_waals_radius["C"] + _PROBE_RADIUS
    expect = 4.0 * np.pi * r**2
    got = shrake_rupley_sasa(prot, n_points=100)
    np.testing.assert_allclose(got, [expect], rtol=1e-6)


@pytest.mark.parametrize("d", [1.0, 2.0, 3.0, 4.5, 5.5])
def test_two_sphere_analytic(d):
    """Two equal spheres at distance d: the buried region of each is a
    spherical cap of height h = R - d/2, area 2*pi*R*h (closed form).
    Sampling error with 2000 Fibonacci points is < 1%."""
    prot = _prot_from_atoms(
        [{"CA": np.zeros(3)}, {"CA": np.asarray([d, 0.0, 0.0])}]
    )
    r = rc.van_der_waals_radius["C"] + _PROBE_RADIUS
    full = 4.0 * np.pi * r**2
    if d >= 2 * r:
        expect = full  # no overlap
        rtol = 1e-6
    else:
        cap = 2.0 * np.pi * r * (r - d / 2.0)
        expect = full - cap
        rtol = 0.01
    got = shrake_rupley_sasa(prot, n_points=2000)
    np.testing.assert_allclose(got, [expect, expect], rtol=rtol)


def test_three_collinear_analytic():
    """Three collinear equal spheres, spacing d: the middle one loses two
    caps (no triple overlap at d=2.4 with R≈3.1 — caps on opposite poles),
    the outer ones lose one each."""
    d = 2.4
    prot = _prot_from_atoms(
        [{"CA": np.asarray([i * d, 0.0, 0.0])} for i in range(3)]
    )
    r = rc.van_der_waals_radius["C"] + _PROBE_RADIUS
    full = 4.0 * np.pi * r**2
    cap = 2.0 * np.pi * r * (r - d / 2.0)
    got = shrake_rupley_sasa(prot, n_points=2000)
    np.testing.assert_allclose(
        got, [full - cap, full - 2 * cap, full - cap], rtol=0.01
    )


def test_max_asa_matches_reference_table():
    """MAX_ASA must be the Tien et al. 2013 EMPIRICAL column — the exact
    table the reference normalizes RSA with (MAX_SASAs,
    framedipt/protein/residue_constants.py:682). Spot-check the published
    values rather than round-tripping our own constant."""
    published_empirical = {"A": 121.0, "G": 97.0, "W": 264.0, "R": 265.0,
                           "V": 165.0, "S": 143.0}
    for aa, val in published_empirical.items():
        assert MAX_ASA[aa] == val, (aa, MAX_ASA[aa], val)
    published_theoretical = {"A": 129.0, "G": 104.0, "W": 285.0}
    for aa, val in published_theoretical.items():
        assert MAX_ASA_THEORETICAL[aa] == val
    assert set(MAX_ASA) == set(MAX_ASA_THEORETICAL)
    assert len(MAX_ASA) == 20


def _gly_x_gly(one_letter: str) -> Protein:
    """Ideal extended Gly-X-Gly tripeptide: NeRF extended backbone
    (phi=-139, psi=135 antiparallel-beta), sidechain from the AF2
    literature rigid-group geometry with all chi = 180 deg (anti)."""
    aa_idx = rc.restype_order[one_letter]
    aatype = np.asarray(
        [rc.restype_order["G"], aa_idx, rc.restype_order["G"]], np.int64
    )
    atom37_bb, _ = nerf_backbone(3, phi=-139.0, psi=135.0)
    a = rc.atom_order
    n_xyz = atom37_bb[:, a["N"]]
    ca = atom37_bb[:, a["CA"]]
    c = atom37_bb[:, a["C"]]
    bb = Rigid.from_3_points(
        jnp.asarray(n_xyz), jnp.asarray(ca), jnp.asarray(c)
    )
    # psi for the O group; chi1-4 = 180 (sin 0, cos -1). Group order:
    # [pre-omega, phi, psi, chi1..chi4]; only psi/chi place atom14 atoms.
    torsions = np.zeros((3, 7, 2))
    torsions[:, :, 1] = -1.0  # cos = -1 -> angle 180 for every group
    group_m, group_t = frames_lib.torsion_angles_to_frames(
        bb, jnp.asarray(torsions), jnp.asarray(aatype)
    )
    atom14 = np.asarray(
        frames_lib.frames_to_atom14_pos(group_m, group_t, jnp.asarray(aatype))
    )
    a14_to_a37 = np.asarray(rc.restype_atom14_to_atom37)[aatype]
    a14_mask = np.asarray(rc.restype_atom14_mask)[aatype]
    pos = np.zeros((3, 37, 3))
    mask = np.zeros((3, 37))
    for i in range(3):
        for k in range(14):
            if a14_mask[i, k]:
                pos[i, a14_to_a37[i, k]] = atom14[i, k]
                mask[i, a14_to_a37[i, k]] = 1.0
    return Protein(
        atom_positions=pos,
        atom_mask=mask,
        aatype=aatype,
        residue_index=np.arange(1, 4),
        chain_index=np.zeros(3, np.int64),
        b_factors=np.zeros((3, 37)),
    )


@pytest.mark.parametrize("aa", ["A", "G", "L", "F", "W", "R", "S", "V"])
def test_gly_x_gly_vs_tien_2013(aa):
    """Central-residue ASA of an ideal extended Gly-X-Gly must approach the
    published Tien et al. 2013 theoretical max ASA (that table is DEFINED
    as the Gly-X-Gly extended-conformation ASA). Tolerance covers their
    conformer search vs our single anti-chi conformer, slightly different
    vdW sets, and missing hydrogens: [0.70, 1.15] x published."""
    prot = _gly_x_gly(aa)
    asa = shrake_rupley_sasa(prot, n_points=500)
    published = MAX_ASA_THEORETICAL[aa]
    assert 0.70 * published <= asa[1] <= 1.15 * published, (
        aa, float(asa[1]), published
    )


def test_gly_x_gly_rsa_normalization():
    """relative_sasa on the fully exposed tripeptide centre must be ~1
    under the empirical normalization (definitionally RSA<=~1.2 there;
    empirical maxima are observed in real structures so an ideal extended
    conformer can slightly exceed them). A factor-of-2 radius or
    normalization bug fails this immediately."""
    for aa in ["A", "W", "V"]:
        prot = _gly_x_gly(aa)
        rsa = relative_sasa(prot)
        assert 0.75 <= rsa[1] <= 1.30, (aa, float(rsa[1]))
    # Size ordering of absolute ASA: W > A central residues.
    asa_w = shrake_rupley_sasa(_gly_x_gly("W"), n_points=500)[1]
    asa_a = shrake_rupley_sasa(_gly_x_gly("A"), n_points=500)[1]
    assert asa_w > asa_a


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
