"""De novo design evaluation CLI.

Role of evaluation/eval_denovo.py: designability (self-consistency scRMSD /
scTM read from per-sample ``sc_results.csv``, best/median aggregation
:38-97), diversity (pairwise-TM hierarchical clustering, the scipy path of
:480-541, or the reference's two-stage MaxCluster subprocess flow with
stdout parsing into cluster counts/sizes/assignments, :259-479), novelty
(max TM vs a reference DB via foldseek when installed :543), and
helix/strand composition of the generated set (:653) with the composition
plot.

Usage:
    python -m framedipt_tpu.eval.denovo_eval --prediction_dir=...
"""
from __future__ import annotations

import argparse
import pathlib
import re

import numpy as np
import pandas as pd

from framedipt_tpu.analysis import dssp as dssp_lib
from framedipt_tpu.eval import plots
from framedipt_tpu.analysis import metrics as analysis_metrics
from framedipt_tpu.data import constants as rc
from framedipt_tpu.data.protein import from_pdb_string
from framedipt_tpu.tools.external import (
    ToolUnavailable,
    run_foldseek_easy_search,
    run_maxcluster_align,
    run_maxcluster_cluster,
)
from framedipt_tpu.tools.log import get_logger

logger = get_logger()


def collect_samples(prediction_dir: pathlib.Path) -> list[pathlib.Path]:
    return sorted(prediction_dir.glob("**/sample_*/sample_*_1.pdb"))


def designability(prediction_dir: pathlib.Path) -> pd.DataFrame:
    """Aggregate self-consistency results written by the sc pipeline:
    one sc_results.csv per sample dir with columns incl. rmsd/tm_score."""
    rows = []
    for sc_csv in sorted(prediction_dir.glob("**/self_consistency/sc_results.csv")):
        df = pd.read_csv(sc_csv)
        rows.append(
            {
                "sample_dir": str(sc_csv.parent.parent),
                "best_sc_rmsd": float(df["rmsd"].min()),
                "median_sc_rmsd": float(df["rmsd"].median()),
                "best_sc_tm": float(df["tm_score"].max()),
                "median_sc_tm": float(df["tm_score"].median()),
                "designable": bool(df["rmsd"].min() < 2.0),
            }
        )
    return pd.DataFrame(rows)


def pairwise_tm_matrix(sample_paths: list[pathlib.Path]) -> np.ndarray:
    """Symmetric pairwise TM matrix over CA traces (equal lengths only are
    compared; unequal pairs get TM=0)."""
    cas = []
    for p in sample_paths:
        prot = from_pdb_string(p.read_text())
        cas.append(prot.atom_positions[:, rc.CA_IDX])
    n = len(cas)
    tm = np.eye(n)
    for i in range(n):
        for j in range(i + 1, n):
            if len(cas[i]) == len(cas[j]):
                _, t = analysis_metrics.calc_tm_score(cas[i], cas[j])
            else:
                t = 0.0
            tm[i, j] = tm[j, i] = t
    return tm


def diversity_clusters(
    sample_paths: list[pathlib.Path], tm_threshold: float = 0.5
) -> dict[str, float]:
    """Cluster samples by TM > threshold (single-linkage over 1-TM, the
    scipy path of eval_denovo.py:480-541); diversity = clusters/samples."""
    from scipy.cluster.hierarchy import fcluster, linkage
    from scipy.spatial.distance import squareform

    if len(sample_paths) < 2:
        return {"num_clusters": len(sample_paths), "diversity": 1.0}
    tm = pairwise_tm_matrix(sample_paths)
    dist = 1.0 - tm
    np.fill_diagonal(dist, 0.0)
    z = linkage(squareform(dist, checks=False), method="single")
    labels = fcluster(z, t=1.0 - tm_threshold, criterion="distance")
    num = int(labels.max())
    return {"num_clusters": num, "diversity": num / len(sample_paths)}


_SIZE_RE = re.compile(r"^SIZE : (\d+)")
_CLUSTERS_RE = re.compile(r"^.* (\d+) Clusters @ Threshold")
_ASSIGN_RE = re.compile(r"^INFO\s*:\s*(\d+)\s*:\s*(\d+)\s+(\S+)\s*$")
_CSIZE_RE = re.compile(r"^INFO\s*:\s*(\d+)\s*:\s*(\d+)\s+(\d+)\s")


def parse_maxcluster_size(align_text: str) -> int:
    """``SIZE : N`` from the -Rl align-score file
    (ref evaluation/eval_denovo.py:306-316)."""
    for line in align_text.splitlines():
        m = _SIZE_RE.match(line)
        if m:
            return int(m.group(1))
    raise ValueError("no 'SIZE : N' line in MaxCluster align output")


def parse_maxcluster_clusters(cluster_text: str) -> dict:
    """Parse ``maxcluster -C 1`` output: total cluster count
    (ref :341-352 parses only this), plus the per-item assignment table
    (``INFO : <item> : <cluster>  <path>``) and the per-cluster size table
    (``INFO : <cluster> : <centroid> <size> ...``) that the reference
    leaves unconsumed."""
    num_clusters = None
    assignments: dict[str, int] = {}
    sizes: dict[int, int] = {}
    in_sizes = False
    for line in cluster_text.splitlines():
        m = _CLUSTERS_RE.match(line)
        if m and num_clusters is None:
            num_clusters = int(m.group(1))
            continue
        if "Centroid" in line and "Size" in line:
            in_sizes = True
            continue
        if in_sizes:
            m = _CSIZE_RE.match(line)
            if m:
                sizes[int(m.group(1))] = int(m.group(3))
                continue
        m = _ASSIGN_RE.match(line)
        if m:
            assignments[m.group(3)] = int(m.group(2))
    if num_clusters is None:
        raise ValueError("no 'N Clusters @ Threshold' line in MaxCluster output")
    return {
        "num_clusters": num_clusters,
        "assignments": assignments,
        "cluster_sizes": sizes,
    }


def maxcluster_diversity(
    sample_paths: list[pathlib.Path],
    outdir: pathlib.Path,
    tm_threshold: float = 0.5,
) -> dict:
    """The reference's MaxCluster diversity flow (eval_denovo.py:259-354):
    write the PDB list, run the align stage (cached by file existence, as
    the reference does), run the clustering stage, parse. Returns
    num_clusters / diversity / assignments / cluster_sizes."""
    outdir.mkdir(parents=True, exist_ok=True)
    list_file = outdir / "maxcluster_pdb_list.txt"
    list_file.write_text("".join(f"{p}\n" for p in sample_paths))
    align_file = outdir / "maxcluster_align_scores.txt"
    if not align_file.exists():
        run_maxcluster_align(list_file, align_file)
    size = parse_maxcluster_size(align_file.read_text())
    stdout = run_maxcluster_cluster(align_file, threshold=tm_threshold)
    (outdir / "maxcluster_clusters.txt").write_text(stdout)
    parsed = parse_maxcluster_clusters(stdout)
    parsed["diversity"] = parsed["num_clusters"] / size
    parsed["size"] = size
    return parsed


def novelty(
    sample_dir: pathlib.Path, foldseek_db: pathlib.Path | None, tmp: pathlib.Path
) -> pd.DataFrame | None:
    if foldseek_db is None:
        return None
    try:
        out = run_foldseek_easy_search(
            sample_dir, foldseek_db, tmp / "novelty.tsv", tmp / "fs_tmp"
        )
    except ToolUnavailable as e:
        logger.warning(str(e))
        return None
    df = pd.read_csv(out, sep="\t", names=["query", "target", "alntmscore"])
    return df.groupby("query")["alntmscore"].max().rename("pdbTM").reset_index()


def ss_composition(sample_paths: list[pathlib.Path]) -> pd.DataFrame:
    rows = []
    for p in sample_paths:
        prot = from_pdb_string(p.read_text())
        m = dssp_lib.ss_metrics_from_atom37(prot.atom_positions, prot.atom_mask)
        rows.append({"path": str(p), "length": len(prot.aatype), **m})
    return pd.DataFrame(rows)


def run(
    prediction_dir: pathlib.Path,
    output_dir: pathlib.Path | None = None,
    foldseek_db: pathlib.Path | None = None,
    diversity_backend: str = "auto",
) -> dict:
    """``diversity_backend``: "maxcluster" (the reference's subprocess
    flow), "scipy" (in-tree hierarchical clustering, the reference's
    use_hierarchy=True path), or "auto" (maxcluster when the binary is on
    PATH, else scipy)."""
    prediction_dir = pathlib.Path(prediction_dir)
    output_dir = pathlib.Path(output_dir or prediction_dir / "evaluation")
    output_dir.mkdir(parents=True, exist_ok=True)

    samples = collect_samples(prediction_dir)
    logger.info(f"found {len(samples)} samples")
    results: dict = {"num_samples": len(samples)}

    comp = ss_composition(samples)
    comp.to_csv(output_dir / "ss_composition.csv", index=False)
    results["helix_percent_mean"] = float(comp["helix_percent"].mean())
    results["strand_percent_mean"] = float(comp["strand_percent"].mean())
    if len(comp):
        plots.length_colored_scatter(
            comp["strand_percent"].to_numpy() * 100.0,
            comp["helix_percent"].to_numpy() * 100.0,
            comp["length"].to_numpy(),
            "Sheet percentage",
            "Helix percentage",
            output_dir / "helix_sheet.png",
        )

    div: dict = {}
    if diversity_backend in ("auto", "maxcluster") and len(samples) >= 2:
        try:
            mc = maxcluster_diversity(samples, output_dir / "maxcluster")
            div = {
                "num_clusters": mc["num_clusters"],
                "diversity": mc["diversity"],
            }
            pd.DataFrame(
                [
                    {"path": p, "cluster": c}
                    for p, c in mc["assignments"].items()
                ]
            ).to_csv(output_dir / "cluster_assignments.csv", index=False)
        except Exception as e:  # noqa: BLE001
            if diversity_backend == "maxcluster":
                raise
            logger.info(f"maxcluster unavailable ({e}); scipy diversity")
    if not div:
        div = diversity_clusters(samples)
    results.update(div)

    desig = designability(prediction_dir)
    if len(desig):
        desig.to_csv(output_dir / "designability.csv", index=False)
        results["designable_fraction"] = float(desig["designable"].mean())
        results["best_sc_rmsd_mean"] = float(desig["best_sc_rmsd"].mean())

    nov = novelty(prediction_dir, foldseek_db, output_dir)
    if nov is not None:
        nov.to_csv(output_dir / "novelty.csv", index=False)
        results["pdbTM_mean"] = float(nov["pdbTM"].mean())

    pd.DataFrame([results]).to_csv(output_dir / "denovo_summary.csv", index=False)
    logger.info(f"de novo eval: {results}")
    return results


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--prediction_dir", required=True)
    ap.add_argument("--output_dir", default=None)
    ap.add_argument("--foldseek_db", default=None)
    ap.add_argument(
        "--diversity", default="auto", choices=["auto", "maxcluster", "scipy"]
    )
    args = ap.parse_args()
    run(
        pathlib.Path(args.prediction_dir),
        pathlib.Path(args.output_dir) if args.output_dir else None,
        pathlib.Path(args.foldseek_db) if args.foldseek_db else None,
        diversity_backend=args.diversity,
    )


if __name__ == "__main__":
    main()
