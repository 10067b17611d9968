"""End-to-end inference on real mmCIF fixtures (1fyt/5ksa/7t2d assemblies),
asserting the reference's filesystem contract (SURVEY.md §4): per-structure
length dirs with ground-truth PDB + diffusion_info.csv, per-sample dirs
with sample_{i}_1.pdb. Runs with a tiny random-weight model and num_t=2."""
import pathlib

import numpy as np
import pandas as pd
import pytest

from framedipt_tpu.data.protein import from_pdb_string
from framedipt_tpu.experiments.inference import Inference
from framedipt_tpu.tools.config import Config, SO3Config

CIF_DIR = pathlib.Path(__file__).parent.parent / "data" / "cifs"


def tiny_inference_cfg(tmp_path) -> Config:
    cfg = Config()
    cfg.diffuser.so3 = SO3Config(num_omega=50, num_sigma=20, cache_dir=None)
    m = cfg.model
    m.node_embed_size = 32
    m.edge_embed_size = 16
    m.ipa.c_s = 32
    m.ipa.c_z = 16
    m.ipa.c_hidden = 16
    m.ipa.c_skip = 8
    m.ipa.no_heads = 2
    m.ipa.no_qk_points = 4
    m.ipa.no_v_points = 4
    m.ipa.num_blocks = 1
    m.ipa.seq_tfmr_num_layers = 1
    m.ipa.seq_tfmr_num_heads = 2
    cfg.inference.inpainting = True
    cfg.inference.inpainting_samples.tcr = False
    cfg.inference.inpainting_samples.samples = 1
    cfg.inference.diffusion.num_t = 2
    cfg.inference.weights_path = ""  # random init
    cfg.inference.output_dir = str(tmp_path / "out")
    cfg.inference.name = "itest"
    return cfg


@pytest.mark.slow
def test_conditional_inference_filesystem_contract(tmp_path):
    cfg = tiny_inference_cfg(tmp_path)
    # Keep one structure for speed; the other fixtures are covered by the
    # data-pipeline unit tests.
    cif_dir = tmp_path / "cifs"
    cif_dir.mkdir()
    (cif_dir / "1fyt-assembly1.cif").write_bytes(
        (CIF_DIR / "1fyt-assembly1.cif").read_bytes()
    )

    inference = Inference(cfg, cif_dir=cif_dir)
    inference.run_sampling()

    out = inference.output_dir
    length_dirs = list(out.glob("1fyt_length_*"))
    assert len(length_dirs) == 1, f"expected one length dir, got {length_dirs}"
    ldir = length_dirs[0]

    # Ground truth PDB with b-factor diffusion markers.
    gt = ldir / "1fyt_1.pdb"
    assert gt.exists()
    prot = from_pdb_string(gt.read_text())
    marked = prot.b_factors.max(axis=-1)
    assert set(np.unique(marked)) <= {0.0, 100.0}
    assert (marked == 100.0).sum() > 0

    # diffusion_info.csv contract.
    info = pd.read_csv(ldir / "diffusion_info.csv", sep="\t")
    assert list(info.columns) == ["pdb_name", "seq", "chain", "start", "end"]
    assert info.iloc[0]["pdb_name"] == "1fyt"

    # Sample outputs.
    sample_pdb = ldir / "sample_0" / "sample_0_1.pdb"
    assert sample_pdb.exists()
    sample_prot = from_pdb_string(sample_pdb.read_text())
    assert np.isfinite(sample_prot.atom_positions).all()
    assert (ldir / "sample_0" / "bb_traj_0_1.pdb").exists()
    assert (ldir / "sample_0" / "x0_traj_0_1.pdb").exists()

    # Fixed (non-diffused) residues keep their ground-truth CA coordinates.
    fixed_sel = marked == 0.0
    ca_gt = prot.atom_positions[fixed_sel, 1]
    ca_sample = sample_prot.atom_positions[fixed_sel, 1]
    np.testing.assert_allclose(ca_sample, ca_gt, atol=2e-2)


@pytest.mark.slow
def test_denovo_chain_end_to_end(tmp_path, monkeypatch):
    """De novo pipeline as ONE chain (ref experiments/inference.py:192,
    625-706 + evaluation/eval_denovo.py): unconditional sampling ->
    ProteinMPNN (mock repo, reference flag contract) -> ESMFold refold
    (monkeypatched to a synthetic backbone) -> sc_results.csv ->
    denovo_eval producing SS composition, diversity, and designability
    from those artifacts."""
    from framedipt_tpu.analysis.utils import write_prot_to_pdb
    from framedipt_tpu.eval import denovo_eval
    from framedipt_tpu.tools import external
    from tests.unit.geom_helpers import nerf_backbone

    n = 32
    cfg = tiny_inference_cfg(tmp_path)
    cfg.inference.inpainting = False
    s = cfg.inference.samples
    s.min_length = n
    s.max_length = n
    s.length_step = 1
    s.samples_per_length = 2
    s.seq_per_sample = 1

    # Mock ProteinMPNN repo: honors the adapter's CLI contract, emits one
    # n-residue sequence per target.
    repo = tmp_path / "mpnn"
    (repo / "helper_scripts").mkdir(parents=True)
    (repo / "helper_scripts" / "parse_multiple_chains.py").write_text(
        "import sys, pathlib\n"
        "args = dict(a.split('=', 1) for a in sys.argv[1:])\n"
        "pathlib.Path(args['--output_path']).write_text('{}')\n"
    )
    (repo / "protein_mpnn_run.py").write_text(
        "import sys, pathlib\n"
        "argv = sys.argv[1:]\n"
        "out = pathlib.Path(argv[argv.index('--out_folder') + 1])\n"
        "(out / 'seqs').mkdir(parents=True, exist_ok=True)\n"
        f"(out / 'seqs' / 'design.fa').write_text('>d\\n' + 'A' * {n} + '\\n')\n"
    )
    cfg.inference.pmpnn_dir = str(repo)

    # Mock ESMFold: deterministic synthetic n-residue backbone.
    atom37, mask37 = nerf_backbone(n)
    refold_path = write_prot_to_pdb(
        atom37 * mask37[..., None], tmp_path / "refold", no_indexing=False
    )
    refold_text = refold_path.read_text()
    monkeypatch.setattr(external, "esmfold_predict", lambda seq: refold_text)

    inference = Inference(cfg, cif_dir=tmp_path / "unused_cifs")
    inference.run_sampling()
    out = inference.output_dir

    samples = sorted(out.glob(f"length_{n}/sample_*/sample_*_1.pdb"))
    assert len(samples) == 2, samples
    sc_csvs = sorted(out.glob(f"length_{n}/sample_*/self_consistency/sc_results.csv"))
    assert len(sc_csvs) == 2, "self-consistency did not run for every sample"
    sc = pd.read_csv(sc_csvs[0])
    assert {"sequence", "rmsd", "tm_score"} <= set(sc.columns)
    assert np.isfinite(sc["tm_score"]).all()

    results = denovo_eval.run(out, diversity_backend="scipy")
    eval_dir = out / "evaluation"
    assert (eval_dir / "ss_composition.csv").exists()
    assert (eval_dir / "designability.csv").exists()
    assert results["num_samples"] == 2
    assert 0.0 < results["diversity"] <= 1.0
    assert 0.0 <= results["designable_fraction"] <= 1.0
    assert np.isfinite(results["best_sc_rmsd_mean"])


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])


def test_async_writer_surfaces_errors_and_preserves_order(tmp_path):
    """The background trajectory writer must (a) keep submission order with
    one worker and (b) re-raise the first write error at drain time."""
    inf = Inference.__new__(Inference)
    inf._write_pool = None
    inf._write_futures = []

    order = []
    inf._submit_write(order.append, 1)
    inf._submit_write(order.append, 2)
    inf._submit_write(order.append, 3)
    inf._drain_writes()
    assert order == [1, 2, 3]
    assert inf._write_futures == []

    def boom():
        raise OSError("disk full")

    inf._submit_write(boom)
    inf._submit_write(order.append, 4)
    with pytest.raises(OSError, match="disk full"):
        inf._drain_writes()
    # drain cleared the queue even on error
    assert inf._write_futures == []
    inf._write_pool.shutdown(wait=True)


def test_async_writer_bounds_pending_queue():
    """_submit_write must block once _MAX_PENDING_WRITES futures are
    pending (each pins a sample's trajectory arrays), instead of queueing
    without limit on a slow disk."""
    import threading
    import time

    inf = Inference.__new__(Inference)
    inf._write_pool = None
    inf._write_futures = []

    gate = threading.Event()
    done = []
    inf._submit_write(gate.wait)  # worker blocks here
    for i in range(inf._MAX_PENDING_WRITES - 1):
        inf._submit_write(done.append, i)
    assert len(inf._write_futures) == inf._MAX_PENDING_WRITES

    submitted = threading.Event()

    def oversubmit():
        inf._submit_write(done.append, "late")
        submitted.set()

    t = threading.Thread(target=oversubmit)
    t.start()
    # The submit must be blocked while the worker is gated.
    assert not submitted.wait(timeout=0.3)
    gate.set()
    assert submitted.wait(timeout=5.0)
    t.join(timeout=5.0)
    inf._drain_writes()
    assert done == list(range(inf._MAX_PENDING_WRITES - 1)) + ["late"]
    assert len(inf._write_futures) <= inf._MAX_PENDING_WRITES
    inf._write_pool.shutdown(wait=True)
