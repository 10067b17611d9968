"""External-tool adapter contract tests with MOCK executables.

The adapters (tools/external.py) integrate ProteinMPNN / foldseek /
MaxCluster / cg2all at arm's length, mirroring the reference's exact flags
(ref experiments/inference.py:558-623, evaluation/eval_denovo.py:259,543).
None of the tools exist in this environment, so each test installs a mock
binary/repo that ASSERTS the invocation contract and emits the outputs the
callers consume — pinning the flag set without the real dependency."""
import json
import os
import pathlib
import stat
import sys

import pytest

from framedipt_tpu.tools import external
from framedipt_tpu.tools.external import ToolUnavailable


def _write_exe(path: pathlib.Path, body: str) -> None:
    path.write_text("#!" + sys.executable + "\n" + body)
    path.chmod(path.stat().st_mode | stat.S_IEXEC)


def test_unavailable_tools_raise_cleanly(tmp_path):
    with pytest.raises(ToolUnavailable, match="not found on PATH"):
        external.run_foldseek_easy_search(
            tmp_path, tmp_path, tmp_path / "o.tsv", tmp_path
        )
    with pytest.raises(ToolUnavailable, match="repo path not configured"):
        external.run_protein_mpnn(tmp_path, tmp_path)
    with pytest.raises(ToolUnavailable, match="protein_mpnn_run"):
        external.run_protein_mpnn(tmp_path, tmp_path, mpnn_repo=tmp_path)


def test_protein_mpnn_invocation_contract(tmp_path):
    """Mock ProteinMPNN repo: the parse helper and run script record their
    argv; the adapter must pass the reference's flag set and return seqs/."""
    repo = tmp_path / "mpnn"
    (repo / "helper_scripts").mkdir(parents=True)
    parse = repo / "helper_scripts" / "parse_multiple_chains.py"
    parse.write_text(
        "import sys, json, pathlib\n"
        "args = dict(a.split('=', 1) for a in sys.argv[1:])\n"
        "out = pathlib.Path(args['--output_path'])\n"
        "out.write_text(json.dumps({'parsed': args['--input_path']}))\n"
    )
    run = repo / "protein_mpnn_run.py"
    run.write_text(
        "import sys, json, pathlib\n"
        "argv = sys.argv[1:]\n"
        "kv = {argv[i]: argv[i+1] for i in range(0, len(argv) - 1, 2)\n"
        "      if argv[i].startswith('--') and not argv[i+1].startswith('--')}\n"
        "out = pathlib.Path(kv['--out_folder'])\n"
        "(out / 'seqs').mkdir(parents=True, exist_ok=True)\n"
        "(out / 'argv.json').write_text(json.dumps(argv))\n"
        "(out / 'seqs' / 'sample_0.fa').write_text('>seq\\nACDEFG\\n')\n"
    )

    pdb_dir = tmp_path / "pdbs"
    pdb_dir.mkdir()
    out_dir = tmp_path / "out"
    seqs = external.run_protein_mpnn(
        pdb_dir, out_dir, mpnn_repo=repo, num_seq_per_target=8,
        sampling_temp=0.1, seed=38, ca_only=True, python=sys.executable,
    )
    assert seqs == out_dir / "seqs"
    assert (seqs / "sample_0.fa").exists()
    argv = json.loads((out_dir / "argv.json").read_text())
    # Reference flag set (ref experiments/inference.py:569-599).
    for flag, val in (
        ("--num_seq_per_target", "8"),
        ("--sampling_temp", "0.1"),
        ("--seed", "38"),
        ("--batch_size", "1"),
    ):
        assert val == argv[argv.index(flag) + 1], (flag, argv)
    assert "--ca_only" in argv
    assert json.loads((out_dir / "parsed_pdbs.jsonl").read_text())[
        "parsed"
    ] == str(pdb_dir)


def test_protein_mpnn_retries_then_succeeds(tmp_path):
    """The x5 retry loop (the reference's OOM resilience): a run script that
    fails twice then succeeds must not surface an error."""
    repo = tmp_path / "mpnn"
    (repo / "helper_scripts").mkdir(parents=True)
    (repo / "helper_scripts" / "parse_multiple_chains.py").write_text(
        "import sys, pathlib\n"
        "args = dict(a.split('=', 1) for a in sys.argv[1:])\n"
        "pathlib.Path(args['--output_path']).write_text('{}')\n"
    )
    counter = tmp_path / "attempts"
    (repo / "protein_mpnn_run.py").write_text(
        "import sys, pathlib\n"
        f"c = pathlib.Path({str(counter)!r})\n"
        "n = int(c.read_text()) + 1 if c.exists() else 1\n"
        "c.write_text(str(n))\n"
        "if n <= 2:\n"
        "    sys.exit(1)\n"
        "argv = sys.argv[1:]\n"
        "kv = {argv[i]: argv[i+1] for i in range(len(argv) - 1)}\n"
        "out = pathlib.Path(kv['--out_folder'])\n"
        "(out / 'seqs').mkdir(parents=True, exist_ok=True)\n"
    )
    seqs = external.run_protein_mpnn(
        tmp_path / "pdbs", tmp_path / "out", mpnn_repo=repo,
        python=sys.executable,
    )
    assert seqs.exists()
    assert counter.read_text() == "3"


def test_foldseek_and_maxcluster_contracts(tmp_path, monkeypatch):
    bin_dir = tmp_path / "bin"
    bin_dir.mkdir()
    _write_exe(
        bin_dir / "foldseek",
        "import sys\n"
        "assert sys.argv[1] == 'easy-search', sys.argv\n"
        "q, db, out, tmp = sys.argv[2:6]\n"
        "assert sys.argv[6] == '--format-output'\n"
        "assert sys.argv[7] == 'query,target,alntmscore'\n"
        "open(out, 'w').write('q\\tt\\t0.5\\n')\n",
    )
    _write_exe(
        bin_dir / "maxcluster",
        # Two-stage contract (ref eval_denovo.py:288-339): align writes the
        # -Rl score file; cluster reads it via -M and prints to stdout.
        "import sys\n"
        "a = sys.argv\n"
        "if '-l' in a:\n"
        "    assert '-in' in a and '-Rl' in a, a\n"
        "    open(a[a.index('-Rl') + 1], 'w').write('SIZE : 2\\n')\n"
        "else:\n"
        "    assert a[a.index('-C') + 1] == '1', a\n"
        "    assert a[a.index('-T') + 1] == '0.5', a\n"
        "    assert a[a.index('-Tm') + 1] == '0.5', a\n"
        "    open(a[a.index('-M') + 1])\n"
        "    print('INFO  : 2 Clusters @ Threshold  0.500 (0.5)')\n",
    )
    monkeypatch.setenv("PATH", f"{bin_dir}:{os.environ['PATH']}")

    out = external.run_foldseek_easy_search(
        tmp_path / "q", tmp_path / "db", tmp_path / "hits.tsv",
        tmp_path / "tmp",
    )
    assert out.read_text().startswith("q\t")

    listing = tmp_path / "pdbs.txt"
    listing.write_text("a.pdb\nb.pdb\n")
    align = external.run_maxcluster_align(listing, tmp_path / "align.txt")
    assert align.read_text().startswith("SIZE : 2")
    stdout = external.run_maxcluster_cluster(align, threshold=0.5)
    assert "2 Clusters" in stdout


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
