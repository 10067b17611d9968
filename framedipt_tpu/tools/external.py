"""Adapters for external tools, availability-gated.

Role of the reference's arm's-length integrations (SURVEY.md §2.9):
ProteinMPNN (subprocess, experiments/inference.py:558-623), ESMFold
(in-process via fair-esm or transformers, :98), foldseek
(evaluation/eval_denovo.py:543), MaxCluster (:259), cg2all (shell script).
Every adapter raises ToolUnavailable with a clear message when the binary /
weights are absent, so pipelines degrade gracefully in hermetic
environments.
"""
from __future__ import annotations

import pathlib
import shutil
import subprocess

from framedipt_tpu.tools.log import get_logger

logger = get_logger()


class ToolUnavailable(RuntimeError):
    pass


def _require_binary(name: str) -> str:
    path = shutil.which(name)
    if path is None:
        raise ToolUnavailable(
            f"external tool '{name}' not found on PATH; install it or skip "
            f"the step that needs it"
        )
    return path


# --------------------------------------------------------------------------
# ProteinMPNN (sequence design for de novo self-consistency)
# --------------------------------------------------------------------------


def run_protein_mpnn(
    pdb_dir: pathlib.Path,
    output_dir: pathlib.Path,
    mpnn_repo: pathlib.Path | str | None = None,
    num_seq_per_target: int = 8,
    sampling_temp: float = 0.1,
    seed: int = 38,
    # The reference invocation uses the vanilla (N/Ca/C/O) models — it
    # never passes --ca_only (experiments/inference.py:584-599).
    ca_only: bool = False,
    python: str = "python",
) -> pathlib.Path:
    """Invoke ProteinMPNN as a subprocess (reference flags:
    experiments/inference.py:569-599). Returns the directory of generated
    fasta files."""
    if mpnn_repo is None:
        raise ToolUnavailable(
            "ProteinMPNN repo path not configured (tools.external.run_protein_mpnn)"
        )
    mpnn_repo = pathlib.Path(mpnn_repo)
    parse_script = mpnn_repo / "helper_scripts" / "parse_multiple_chains.py"
    run_script = mpnn_repo / "protein_mpnn_run.py"
    if not run_script.exists():
        raise ToolUnavailable(f"protein_mpnn_run.py not found under {mpnn_repo}")

    output_dir.mkdir(parents=True, exist_ok=True)
    parsed_jsonl = output_dir / "parsed_pdbs.jsonl"
    subprocess.run(
        [python, str(parse_script), f"--input_path={pdb_dir}",
         f"--output_path={parsed_jsonl}"],
        check=True,
    )
    args = [
        python, str(run_script),
        "--out_folder", str(output_dir),
        "--jsonl_path", str(parsed_jsonl),
        "--num_seq_per_target", str(num_seq_per_target),
        "--sampling_temp", str(sampling_temp),
        "--seed", str(seed),
        "--batch_size", "1",
    ]
    if ca_only:
        args.append("--ca_only")
    # Retry loop mirrors the reference's OOM-resilient invocation (x5).
    for attempt in range(5):
        try:
            subprocess.run(args, check=True)
            break
        except subprocess.CalledProcessError:
            if attempt == 4:
                raise
            logger.warning(f"ProteinMPNN failed (attempt {attempt + 1}); retrying")
    return output_dir / "seqs"


# --------------------------------------------------------------------------
# ESMFold (structure prediction for self-consistency)
# --------------------------------------------------------------------------

_ESMFOLD = None


def esmfold_predict(sequence: str) -> str:
    """Fold a sequence, returning PDB text. Tries fair-esm then HF
    transformers; both need downloaded weights."""
    global _ESMFOLD
    if _ESMFOLD is None:
        try:
            import esm  # type: ignore

            model = esm.pretrained.esmfold_v1()
            model = model.eval()
            _ESMFOLD = ("fair-esm", model)
        except Exception:
            try:
                from transformers import AutoTokenizer, EsmForProteinFolding

                tok = AutoTokenizer.from_pretrained("facebook/esmfold_v1")
                model = EsmForProteinFolding.from_pretrained("facebook/esmfold_v1")
                _ESMFOLD = ("transformers", (tok, model))
            except Exception as e:  # pragma: no cover
                raise ToolUnavailable(
                    f"ESMFold unavailable (no fair-esm/transformers weights): {e}"
                ) from e
    kind, model = _ESMFOLD
    if kind == "fair-esm":
        with_no_grad = __import__("torch").no_grad
        with with_no_grad():
            return model.infer_pdb(sequence)
    tok, hf_model = model
    import torch

    inputs = tok([sequence], return_tensors="pt", add_special_tokens=False)
    with torch.no_grad():
        out = hf_model(**inputs)
    return hf_model.output_to_pdb(out)[0]


# --------------------------------------------------------------------------
# foldseek (novelty / pdbTM)
# --------------------------------------------------------------------------


def run_foldseek_easy_search(
    query_pdbs: pathlib.Path,
    target_db: pathlib.Path,
    output_tsv: pathlib.Path,
    tmp_dir: pathlib.Path,
) -> pathlib.Path:
    """foldseek easy-search for max-TM novelty (eval_denovo.py:543)."""
    binary = _require_binary("foldseek")
    subprocess.run(
        [
            binary, "easy-search", str(query_pdbs), str(target_db),
            str(output_tsv), str(tmp_dir),
            "--format-output", "query,target,alntmscore",
        ],
        check=True,
    )
    return output_tsv


# --------------------------------------------------------------------------
# MaxCluster (diversity clustering)
# --------------------------------------------------------------------------


def run_maxcluster_align(
    pdb_list_file: pathlib.Path, align_score_file: pathlib.Path
) -> pathlib.Path:
    """Stage 1 of the reference's MaxCluster diversity flow: all-vs-all
    alignment scores written to ``align_score_file``
    (ref evaluation/eval_denovo.py:288-304: ``maxcluster -l LIST -in
    -Rl OUT``)."""
    binary = _require_binary("maxcluster")
    subprocess.run(
        [binary, "-l", str(pdb_list_file), "-in",
         "-Rl", str(align_score_file)],
        check=True,
        capture_output=True,
        text=True,
    )
    return align_score_file


def run_maxcluster_cluster(
    align_score_file: pathlib.Path, threshold: float = 0.5
) -> str:
    """Stage 2: cluster from the recorded align scores; returns stdout
    (ref evaluation/eval_denovo.py:319-339: ``maxcluster -C 1 -M ALIGN
    -T th -Tm th``)."""
    binary = _require_binary("maxcluster")
    out = subprocess.run(
        [binary, "-C", "1", "-M", str(align_score_file),
         "-T", str(threshold), "-Tm", str(threshold)],
        check=True,
        capture_output=True,
        text=True,
    )
    return out.stdout


# --------------------------------------------------------------------------
# cg2all (backbone -> full atom)
# --------------------------------------------------------------------------


def run_cg2all(input_pdb: pathlib.Path, output_pdb: pathlib.Path) -> pathlib.Path:
    binary = shutil.which("convert_cg2all")
    if binary is None:
        raise ToolUnavailable("cg2all (convert_cg2all) not found on PATH")
    subprocess.run(
        [binary, "-p", str(input_pdb), "-o", str(output_pdb), "--cg", "ca"],
        check=True,
    )
    return output_pdb
