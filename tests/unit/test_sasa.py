"""Vectorized Shrake-Rupley correctness + speed sanity."""
import time

import numpy as np
import pytest

from framedipt_tpu.data import constants as rc
from framedipt_tpu.data.protein import Protein
from framedipt_tpu.eval import metrics as em
from tests.unit.geom_helpers import nerf_backbone


def _make_prot(n=30):
    atom37, mask = nerf_backbone(n)
    return Protein(
        atom_positions=atom37 * mask[..., None],
        atom_mask=mask,
        aatype=np.zeros(n, np.int64),
        residue_index=np.arange(1, n + 1),
        chain_index=np.zeros(n, np.int64),
        b_factors=np.zeros((n, 37)),
    )


def _loop_reference_sasa(prot, n_points=100):
    """Direct per-atom Shrake-Rupley (the round-1 implementation) as the
    correctness oracle for the vectorized version."""
    coords, radii, res_ids = em._atom_arrays(prot)
    coords = coords.astype(np.float32)
    radii = radii.astype(np.float32)
    sphere = em._sphere_points(n_points).astype(np.float32)
    areas = np.zeros(len(coords))
    for i in range(len(coords)):
        d = np.linalg.norm(coords - coords[i], axis=-1)
        neigh = np.where((d < radii[i] + radii.max()) & (d > 1e-9))[0]
        pts = coords[i] + sphere * radii[i]
        if len(neigh):
            dist2 = np.sum(
                (pts[:, None, :] - coords[neigh][None, :, :]) ** 2, axis=-1
            )
            buried = np.any(dist2 < (radii[neigh][None, :] ** 2), axis=-1)
        else:
            buried = np.zeros(len(pts), bool)
        areas[i] = 4.0 * np.pi * radii[i] ** 2 * (1.0 - buried.mean())
    per_res = np.zeros(len(prot.aatype))
    np.add.at(per_res, res_ids, areas)
    return per_res


def test_vectorized_sasa_matches_reference_loop():
    prot = _make_prot(30)
    got = em.shrake_rupley_sasa(prot)
    want = _loop_reference_sasa(prot)
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_isolated_atom_fully_exposed():
    """A single-atom 'protein' must report the full sphere area."""
    pos = np.zeros((1, 37, 3))
    mask = np.zeros((1, 37))
    mask[0, rc.atom_order["CA"]] = 1.0
    prot = Protein(
        atom_positions=pos,
        atom_mask=mask,
        aatype=np.zeros(1, np.int64),
        residue_index=np.array([1]),
        chain_index=np.zeros(1, np.int64),
        b_factors=np.zeros((1, 37)),
    )
    r = rc.van_der_waals_radius["C"] + 1.4
    got = em.shrake_rupley_sasa(prot)[0]
    assert got == pytest.approx(4.0 * np.pi * r**2, rel=1e-6)


def test_terminal_residues_more_exposed():
    prot = _make_prot(40)
    sasa = em.shrake_rupley_sasa(prot)
    assert sasa[0] > np.median(sasa[5:-5])
    assert sasa[-1] > np.median(sasa[5:-5])


def test_vectorized_sasa_speed():
    """Significantly faster than the per-atom loop (round-1 item: eval-level
    SASA was minutes-scale; the vectorized path is 4-13x per structure on
    realistic densities, and _cached_sasa cuts the 8 ASA/RSA registry
    metrics from 8 to 2 computations on top). Best-of-2 timings and a
    conservative 3x bound keep this stable under CI load."""
    prot = _make_prot(150)
    em.shrake_rupley_sasa(prot)  # warm allocators
    fast = min(
        _timed(lambda: em.shrake_rupley_sasa(prot)) for _ in range(2)
    )
    slow = min(_timed(lambda: _loop_reference_sasa(prot)) for _ in range(2))
    assert fast < slow / 3, f"vectorized {fast:.3f}s vs loop {slow:.3f}s"


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def test_sasa_memoized_per_protein():
    prot = _make_prot(40)
    a = em._cached_sasa(prot)
    b = em._cached_sasa(prot)
    assert a is b  # second call is a cache hit, not a recompute


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
