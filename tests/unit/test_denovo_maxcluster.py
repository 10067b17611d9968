"""MaxCluster output parsing + the grouped/scatter plot additions.

Covers the reference's two-stage MaxCluster diversity flow
(evaluation/eval_denovo.py:259-354) and the plot layouts of
evaluation/utils/plot.py:87-340 (grouped alpha/beta box/swarm,
two_models_scatter_plot) + the length-colored composition scatter
(eval_denovo.py:653-716).
"""
from __future__ import annotations

import os
import pathlib
import stat

import numpy as np
import pandas as pd
import pytest

from framedipt_tpu.eval import denovo_eval
from framedipt_tpu.eval import metrics as eval_metrics
from framedipt_tpu.eval import plots

ALIGN_TEXT = """\
###################################
# MaxCluster list file
###################################
SIZE : 5
DESC : Pairwise maximum subset alignments
"""

CLUSTER_TEXT = """\
INFO  : Reading PDB list file 'all_samples.list'
INFO  : Successfully read 5 / 5 PDBs
INFO  : Clustering method: Single Linkage
INFO  : 2 Clusters @ Threshold  0.500 (0.5)
INFO  : Item     Cluster
INFO  :      1 :        1   s/sample_0/sample_0_1.pdb
INFO  :      2 :        1   s/sample_1/sample_1_1.pdb
INFO  :      3 :        2   s/sample_2/sample_2_1.pdb
INFO  :      4 :        1   s/sample_3/sample_3_1.pdb
INFO  :      5 :        2   s/sample_4/sample_4_1.pdb
INFO  : Cluster  Centroid  Size        Spread
INFO  :      1 :        1     3        0.213
INFO  :      2 :        3     2        0.101
"""


def test_parse_maxcluster_size():
    assert denovo_eval.parse_maxcluster_size(ALIGN_TEXT) == 5
    with pytest.raises(ValueError):
        denovo_eval.parse_maxcluster_size("no size line here")


def test_parse_maxcluster_clusters():
    parsed = denovo_eval.parse_maxcluster_clusters(CLUSTER_TEXT)
    assert parsed["num_clusters"] == 2
    assert parsed["assignments"]["s/sample_2/sample_2_1.pdb"] == 2
    assert len(parsed["assignments"]) == 5
    assert parsed["cluster_sizes"] == {1: 3, 2: 2}
    with pytest.raises(ValueError):
        denovo_eval.parse_maxcluster_clusters("INFO : nothing useful")


def test_maxcluster_diversity_mock_binary(tmp_path, monkeypatch):
    """End-to-end through the real adapter with a mock maxcluster on PATH."""
    bin_dir = tmp_path / "bin"
    bin_dir.mkdir()
    exe = bin_dir / "maxcluster"
    exe.write_text(
        "#!/usr/bin/env python3\n"
        "import sys\n"
        "a = sys.argv\n"
        "if '-l' in a:\n"
        f"    open(a[a.index('-Rl') + 1], 'w').write({ALIGN_TEXT!r})\n"
        "else:\n"
        "    open(a[a.index('-M') + 1])\n"
        f"    sys.stdout.write({CLUSTER_TEXT!r})\n"
    )
    exe.chmod(exe.stat().st_mode | stat.S_IXUSR)
    monkeypatch.setenv("PATH", f"{bin_dir}:{os.environ['PATH']}")

    paths = [pathlib.Path(f"s/sample_{i}/sample_{i}_1.pdb") for i in range(5)]
    out = denovo_eval.maxcluster_diversity(paths, tmp_path / "mc")
    assert out["num_clusters"] == 2
    assert out["size"] == 5
    assert out["diversity"] == pytest.approx(0.4)
    assert out["cluster_sizes"] == {1: 3, 2: 2}
    # align file is cached: a second run must not re-invoke stage 1.
    (bin_dir / "maxcluster").write_text(
        "#!/usr/bin/env python3\n"
        "import sys\n"
        "a = sys.argv\n"
        "assert '-l' not in a, 'align stage must be cached'\n"
        f"sys.stdout.write({CLUSTER_TEXT!r})\n"
    )
    out2 = denovo_eval.maxcluster_diversity(paths, tmp_path / "mc")
    assert out2["num_clusters"] == 2


def test_average_metrics_for_middle_residues():
    rng = np.random.default_rng(0)
    cols = {}
    for chain in ("alpha", "beta"):
        for idx in (1, 2, 3, 4, 5, 6, -4, -3, -2, -1):
            cols[f"bb_rmsd_{chain}_{idx}"] = rng.uniform(0, 3, size=6)
    df = pd.DataFrame(cols)
    groups = eval_metrics.average_metrics_for_middle_residues(df, "bb_rmsd")
    assert set(groups) == {"alpha", "beta"}
    for chain in ("alpha", "beta"):
        assert len(groups[chain]) == 9  # 4 left + middle + 4 right
        # middle bucket = mean over the 5/6 columns per row
        expect = df[[f"bb_rmsd_{chain}_5", f"bb_rmsd_{chain}_6"]].mean(axis=1)
        np.testing.assert_allclose(groups[chain][4], expect.to_numpy())
        np.testing.assert_allclose(
            groups[chain][0], df[f"bb_rmsd_{chain}_1"].to_numpy()
        )
        np.testing.assert_allclose(
            groups[chain][-1], df[f"bb_rmsd_{chain}_-1"].to_numpy()
        )


def test_grouped_alpha_beta_plot(tmp_path):
    rng = np.random.default_rng(1)
    a = [rng.uniform(0, 2, 8) for _ in range(9)]
    b = [rng.uniform(0, 2, 8) for _ in range(9)]
    out = plots.grouped_alpha_beta_plot(
        a, b, tmp_path, "Backbone RMSD per residue", plots.XTICKS
    )
    assert out is not None and out.exists()
    assert out.name == "backbone_rmsd_per_residue_median_boxplot.png"
    out_sw = plots.grouped_alpha_beta_plot(
        a, b, tmp_path, "Backbone RMSD per residue", plots.XTICKS,
        swarm=True, superpose_box=True,
    )
    assert out_sw is not None and out_sw.exists()
    assert out_sw.name.endswith("_median_swarmplot.png")
    with pytest.raises(ValueError):
        plots.grouped_alpha_beta_plot(a, b, tmp_path, "x", ["1", "2"])


def test_two_models_scatter_plot(tmp_path):
    rng = np.random.default_rng(2)
    n = 12
    df = pd.DataFrame(
        {
            "pdb_name": [f"p{i % 3}" for i in range(n)],
            "bb_rmsd": rng.uniform(0, 5, n),
            "bb_rmsd_alpha": rng.uniform(0, 5, n),
            "bb_rmsd_beta": rng.uniform(0, 5, n),
        }
    )
    # ESMFold rows in a DIFFERENT order than df's pdb groups: pairing must
    # join on pdb_name, not position (the reference pairs positionally and
    # mislabels points whenever the two CSVs differ in order/row count).
    df_esm = pd.DataFrame(
        {
            "pdb_name": ["p2", "p0", "p1"],
            "bb_rmsd_alpha": rng.uniform(0, 5, 3),
            "bb_rmsd_beta": rng.uniform(0, 5, 3),
        }
    )
    out = plots.two_models_scatter_plot(df, df_esm, tmp_path, choice="best")
    assert out is not None and out.exists()
    assert out.name == "bb_rmsd_framedipt_esmfold_scatter.png"
    out2 = plots.two_models_scatter_plot(df, df_esm, tmp_path, choice="median")
    assert out2 is not None and out2.exists()
    with pytest.raises(ValueError):
        plots.two_models_scatter_plot(df, df_esm, tmp_path, choice="worst")


def test_median_sample_rows_keeps_even_count_pdbs():
    """The reference's exact-median merge drops every pdb with an even
    sample count; closest-to-median keeps one row per pdb for any count."""
    df = pd.DataFrame(
        {
            "pdb_name": ["a"] * 4 + ["b"] * 3,
            "bb_rmsd": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0],
        }
    )
    sel = plots.median_sample_rows(df)
    assert sorted(sel["pdb_name"]) == ["a", "b"]
    # Odd-count pdb: exactly the reference's median row.
    assert sel.loc[sel["pdb_name"] == "b", "bb_rmsd"].item() == 6.0
    # Even-count pdb: one of the two middle samples (closest to 2.5).
    assert sel.loc[sel["pdb_name"] == "a", "bb_rmsd"].item() in (2.0, 3.0)


def test_length_colored_scatter(tmp_path):
    out = plots.length_colored_scatter(
        np.array([10.0, 20.0, 30.0]),
        np.array([40.0, 30.0, 20.0]),
        np.array([60, 100, 140]),
        "Sheet percentage",
        "Helix percentage",
        tmp_path / "helix_sheet.png",
    )
    assert out is not None and out.exists()


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
