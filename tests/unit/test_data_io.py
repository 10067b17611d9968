"""Data IO robustness: CIF tokenizer grammar, PDB writer edges, config
system, align module."""
import numpy as np
import pytest

from framedipt_tpu.data import constants as rc
from framedipt_tpu.data.align import align, get_shared_residues, needleman_wunsch
from framedipt_tpu.data.mmcif import parse_cif_categories
from framedipt_tpu.data.protein import (
    Protein,
    chain_id_to_int,
    from_pdb_string,
    int_to_chain_id,
    to_pdb,
)
from framedipt_tpu.tools.config import Config, load_config, merge_checkpoint_config


class TestCifTokenizer:
    def test_loop_parsing(self):
        text = """
data_test
loop_
_cat.a
_cat.b
1 x
2 'quoted value'
3 "double quoted"
"""
        cats = parse_cif_categories(text)
        assert cats["_cat"]["a"] == ["1", "2", "3"]
        assert cats["_cat"]["b"] == ["x", "quoted value", "double quoted"]

    def test_semicolon_block(self):
        text = "data_x\n_c.seq\n;MVLS\nPETG\n;\n_c.val 5\n"
        cats = parse_cif_categories(text)
        assert cats["_c"]["seq"] == ["MVLS\nPETG"]
        assert cats["_c"]["val"] == ["5"]

    def test_comments_ignored(self):
        cats = parse_cif_categories("_a.b 1 # trailing comment\n# full line\n_a.c 2\n")
        assert cats["_a"]["b"] == ["1"]
        assert cats["_a"]["c"] == ["2"]


class TestPdbIO:
    def _prot(self, n=5, chains=(0,)):
        rng = np.random.default_rng(0)
        chain_index = np.asarray(
            [chains[i % len(chains)] for i in range(n)]
        )
        chain_index.sort()
        pos = np.zeros((n, 37, 3))
        mask = np.zeros((n, 37))
        pos[:, :4] = rng.normal(size=(n, 4, 3)) * 5
        mask[:, :4] = 1
        return Protein(
            atom_positions=pos,
            aatype=rng.integers(0, 20, n),
            atom_mask=mask,
            residue_index=np.arange(1, n + 1),
            chain_index=chain_index,
            b_factors=np.zeros((n, 37)),
        )

    def test_multichain_roundtrip(self):
        prot = self._prot(8, chains=(0, 1))
        prot2 = from_pdb_string(to_pdb(prot))
        assert len(np.unique(prot2.chain_index)) == 2
        np.testing.assert_array_equal(prot2.aatype, prot.aatype)

    def test_negative_coordinates(self):
        prot = self._prot(3)
        prot.atom_positions -= 100.0
        prot2 = from_pdb_string(to_pdb(prot))
        sel = prot.atom_mask.astype(bool)
        np.testing.assert_allclose(
            prot2.atom_positions[sel], prot.atom_positions[sel], atol=1e-3
        )

    def test_chain_naming_roundtrip(self):
        for i in (0, 25, 27):
            assert chain_id_to_int(int_to_chain_id(i)) == i


class TestConfig:
    def test_defaults_match_reference_values(self):
        cfg = Config()
        assert cfg.diffuser.so3.num_sigma == 1000
        assert cfg.diffuser.r3.coordinate_scaling == 0.1
        assert cfg.model.ipa.no_v_points == 12
        assert cfg.experiment.rot_loss_t_threshold == 0.2
        assert cfg.inference.diffusion.noise_scale == 0.1

    def test_overrides(self):
        cfg = load_config(None, ["experiment.batch_size=7", "model.ipa.no_heads=2"])
        assert cfg.experiment.batch_size == 7
        assert cfg.model.ipa.no_heads == 2

    def test_unknown_key_raises(self):
        with pytest.raises(KeyError):
            load_config(None, ["experiment.bogus_key=1"])

    def test_checkpoint_precedence(self):
        cfg = Config()
        cfg.model.node_embed_size = 64
        merged = merge_checkpoint_config(
            cfg, {"model": {"node_embed_size": 128}, "diffuser": {}}
        )
        assert merged.model.node_embed_size == 128  # checkpoint wins


class TestAlign:
    def test_needleman_wunsch_identity(self):
        a1, a2 = needleman_wunsch("MVLSPAD", "MVLSPAD")
        assert a1 == a2 == "MVLSPAD"

    def test_gap_alignment(self):
        a1, a2 = needleman_wunsch("MVLSPAD", "MVLPAD")
        assert a1.replace("-", "") == "MVLSPAD"
        assert a2.replace("-", "") == "MVLPAD"
        assert len(a1) == len(a2) == 7

    def test_structural_align_recovers_transform(self):
        from scipy.spatial.transform import Rotation

        rng = np.random.default_rng(0)
        n = 20
        pos = np.zeros((n, 37, 3))
        mask = np.zeros((n, 37))
        pos[:, 1] = np.cumsum(rng.normal(size=(n, 3)) * 2, axis=0)
        mask[:, 1] = 1
        aatype = rng.integers(0, 20, n)
        base = dict(
            aatype=aatype,
            atom_mask=mask,
            residue_index=np.arange(1, n + 1),
            chain_index=np.zeros(n, np.int64),
            b_factors=np.zeros((n, 37)),
        )
        target = Protein(atom_positions=pos, **base)
        r = Rotation.from_rotvec([0.3, 0.5, -0.2]).as_matrix()
        moved = Protein(
            atom_positions=(pos @ r.T + [4.0, -2.0, 9.0]) * mask[..., None],
            **base,
        )
        aligned, rmsd = align(moved, target)
        assert rmsd < 1e-5
        np.testing.assert_allclose(
            aligned.atom_positions[:, 1], pos[:, 1], atol=1e-4
        )


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


def test_gzip_mmcif(tmp_path):
    import gzip
    import pathlib
    import shutil

    from framedipt_tpu.data.mmcif import parse_mmcif

    src = pathlib.Path(__file__).parent.parent / "data" / "cifs" / "7t2d-assembly1.cif"
    gz = tmp_path / "7t2d.cif.gz"
    with open(src, "rb") as f, gzip.open(gz, "wb") as g:
        shutil.copyfileobj(f, g)
    obj = parse_mmcif(gz)
    assert sorted(obj.chains) == ["A", "B", "C", "D", "E"]


def test_parse_pdb_atom14(tmp_path):
    """parse_pdb_atom14: dense 14-slot layout (role of the reference's
    parse_pdb_lines, framedipt/data/utils.py:210-240)."""
    import numpy as np
    from framedipt_tpu.analysis.utils import write_prot_to_pdb
    from framedipt_tpu.data.protein import parse_pdb_atom14
    from tests.unit.geom_helpers import nerf_backbone

    atom37, mask37 = nerf_backbone(12)
    write_prot_to_pdb(
        atom37 * mask37[..., None], tmp_path / "t",
        aatype=np.zeros(12, np.int64), b_factors=np.zeros((12, 37)),
        residue_index=np.arange(1, 13), chain_index=np.zeros(12, np.int64),
    )
    xyz, mask, idx, seq = parse_pdb_atom14((tmp_path / "t_1.pdb").read_text())
    assert xyz.shape == (12, 14, 3) and mask.shape == (12, 14)
    # ALA atom14 layout: N, CA, C, O for interior residues; the NeRF helix
    # fixture has no N on residue 0; CB (slot 4) absent in backbone-only.
    assert mask[1:, :4].all() and mask[0, 1:4].all()
    assert not mask[:, 4:].any()
    assert seq == "A" * 12
    assert list(idx) == list(range(1, 13))
    # Coordinates round-trip through the PDB 3-decimal format.
    np.testing.assert_allclose(xyz[:, 1], atom37[:, 1], atol=1e-3)
