"""Analysis stack validation: DSSP on ideal geometry, TM-score limits,
violations on idealized backbones, SASA sanity, sample selection."""
import numpy as np
import pytest

import jax.numpy as jnp

from framedipt_tpu.analysis import dssp as dssp_lib
from framedipt_tpu.analysis import metrics as am
from framedipt_tpu.analysis import violations as viol
from framedipt_tpu.data import constants as rc
from framedipt_tpu.data.protein import Protein
from framedipt_tpu.eval import selection as sel
from framedipt_tpu.eval.metrics import relative_sasa, shrake_rupley_sasa
from framedipt_tpu.geometry import frames
from framedipt_tpu.geometry.rigid import Rigid


from tests.unit.geom_helpers import nerf_backbone


def ideal_helix_atom37(n=20):
    """Ideal alpha helix from textbook internal coordinates (phi=-57,
    psi=-47, NeRF construction)."""
    return nerf_backbone(n)


def idealized_backbone(n=24, seed=0):
    """Chemically ideal helical backbone + aatype (violations must be ~0)."""
    del seed
    atom37, mask = nerf_backbone(n)
    return atom37, mask, np.zeros(n, np.int64)


class TestDSSP:
    def test_ideal_helix_is_helix(self):
        atom37, mask = ideal_helix_atom37(24)
        ss = dssp_lib.assign_secondary_structure(atom37, mask)
        frac_h = np.mean(ss[4:-4] == "H")
        assert frac_h > 0.7, f"ideal helix only {frac_h:.0%} H: {''.join(ss)}"

    def test_extended_strand_not_helix(self):
        # Fully extended chain: no i,i+4 H-bonds.
        a = rc.atom_order
        n = 16
        atom37 = np.zeros((n, 37, 3))
        mask = np.zeros((n, 37))
        for i in range(n):
            atom37[i, a["N"]] = [3.5 * i - 1.2, 0.3, 0]
            atom37[i, a["CA"]] = [3.5 * i, 0, 0]
            atom37[i, a["C"]] = [3.5 * i + 1.3, 0.4, 0]
            atom37[i, a["O"]] = [3.5 * i + 1.6, 1.6, 0]
            mask[i, [a["N"], a["CA"], a["C"], a["O"]]] = 1
        ss = dssp_lib.assign_secondary_structure(atom37, mask)
        assert np.mean(ss == "H") < 0.1

    def test_rg_scales_with_size(self):
        atom37, mask = ideal_helix_atom37(10)
        atom37_l, mask_l = ideal_helix_atom37(40)
        assert dssp_lib.radius_of_gyration(
            atom37_l, mask_l
        ) > dssp_lib.radius_of_gyration(atom37, mask)


class TestTMScore:
    def test_identical_structures(self):
        rng = np.random.default_rng(0)
        ca = np.cumsum(rng.normal(size=(50, 3)) * 2, axis=0)
        _, tm = am.calc_tm_score(ca, ca.copy())
        assert tm > 0.999

    def test_rigid_transform_invariance(self):
        rng = np.random.default_rng(1)
        ca = np.cumsum(rng.normal(size=(60, 3)) * 2, axis=0)
        from scipy.spatial.transform import Rotation

        moved = ca @ Rotation.from_rotvec([0.4, -0.2, 0.9]).as_matrix().T + [5, -3, 8]
        _, tm = am.calc_tm_score(moved, ca)
        assert tm > 0.99

    def test_unrelated_structures_low(self):
        rng = np.random.default_rng(2)
        ca1 = np.cumsum(rng.normal(size=(60, 3)) * 2, axis=0)
        ca2 = np.cumsum(rng.normal(size=(60, 3)) * 2, axis=0)
        _, tm = am.calc_tm_score(ca1, ca2)
        assert tm < 0.5

    def test_aligned_rmsd_zero_for_identical(self):
        rng = np.random.default_rng(3)
        pos = rng.normal(size=(30, 3)) * 4
        assert am.calc_aligned_rmsd(pos, pos.copy()) < 1e-6


class TestViolations:
    def test_idealized_backbone_near_zero(self):
        atom37, mask37, aatype = idealized_backbone()
        m = viol.violation_metrics(atom37, mask37, aatype)
        assert m["clashes_mean_loss"] < 1e-6
        assert m["bonds_c_n_loss_mean"] < 1e-6
        assert m["angles_ca_c_n_loss_mean"] < 1e-6

    def test_clash_detected(self):
        atom37, mask37, aatype = idealized_backbone()
        squashed = atom37 * np.asarray([0.2, 0.2, 0.2])  # compress everything
        m = viol.violation_metrics(squashed, mask37, aatype)
        assert m["clashes_mean_loss"] > 0.1


class TestSASA:
    def test_surface_exceeds_buried(self):
        atom37, mask = ideal_helix_atom37(16)
        prot = Protein(
            atom_positions=atom37,
            aatype=np.full(16, rc.restype_order["A"]),
            atom_mask=mask,
            residue_index=np.arange(1, 17),
            chain_index=np.zeros(16, np.int64),
            b_factors=np.zeros((16, 37)),
        )
        sasa = shrake_rupley_sasa(prot, n_points=60)
        # Termini are more exposed than the helix middle.
        assert sasa[0] > sasa[8]
        rsa = relative_sasa(prot, sasa)
        assert np.nanmax(rsa) <= 2.0  # backbone-only can't exceed ~max-ASA


class TestSelection:
    def test_strategies(self):
        rng = np.random.default_rng(0)
        base = rng.normal(size=(1, 6, 4, 3))
        # 7 near-identical samples + 1 outlier.
        coords = np.repeat(base, 8, axis=0) + rng.normal(
            scale=0.05, size=(8, 6, 4, 3)
        )
        coords[-1] += 25.0
        out = sel.select_samples(coords)
        assert set(out) == set(sel.SAMPLE_SELECTION_STRATEGIES)
        # KDE mode and median-closest must avoid the outlier.
        assert out["mode"]["index"] != 7
        assert out["median_closest"]["index"] != 7
        # Virtual mean is dragged toward the outlier more than the median.
        mean_err = np.linalg.norm(out["mean"]["coords"] - base[0])
        med_err = np.linalg.norm(out["median"]["coords"] - base[0])
        assert med_err < mean_err


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
