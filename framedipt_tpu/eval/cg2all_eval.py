"""cg2all full-atom evaluation CLI.

Role of evaluation/eval_cg2all.py (:16-60): convert backbone-only samples to
full-atom structures with cg2all (adapter-gated) and compute full-atom RMSD
against the ground truth over the diffusion regions.

Usage:
    python -m framedipt_tpu.eval.cg2all_eval --prediction_dir=... [--skip_convert]
"""
from __future__ import annotations

import argparse
import pathlib

import pandas as pd

from framedipt_tpu.data.protein import from_pdb_string
from framedipt_tpu.eval import metrics as eval_metrics
from framedipt_tpu.eval.tcr_eval import (
    base_metric_columns as tcr_base_columns,
    sample_index,
    traverse_prediction_dir,
)
from framedipt_tpu.tools.external import ToolUnavailable, run_cg2all
from framedipt_tpu.tools.log import get_logger

logger = get_logger()


def run(
    prediction_dir: pathlib.Path,
    output_dir: pathlib.Path | None = None,
    skip_convert: bool = False,
) -> pd.DataFrame:
    prediction_dir = pathlib.Path(prediction_dir)
    output_dir = pathlib.Path(output_dir or prediction_dir / "evaluation")
    output_dir.mkdir(parents=True, exist_ok=True)
    rows = []
    for length_dir, gt_path, info, sample_paths in traverse_prediction_dir(
        prediction_dir
    ):
        gt = from_pdb_string(gt_path.read_text())
        for sample_path in sample_paths:
            i = sample_index(sample_path)
            if sample_path.stem.endswith("_all_atom"):
                # Traversal already picked an existing reconstruction.
                fa_path = sample_path
            else:
                # Reference naming contract: cg2all writes
                # sample_{i}_1_all_atom.pdb next to the backbone pdb
                # (eval_cg2all.py:80, directory_parser.py:29) so later
                # eval passes pick up the full-atom model automatically.
                fa_path = sample_path.with_name(
                    sample_path.stem + "_all_atom.pdb"
                )
            if not fa_path.exists():
                if skip_convert:
                    continue
                try:
                    run_cg2all(sample_path, fa_path)
                except ToolUnavailable as e:
                    logger.warning(f"cg2all unavailable: {e}")
                    return pd.DataFrame(rows)
            pred = from_pdb_string(fa_path.read_text())
            chains, regions = info["chains"], info["regions"]
            # Reference row schema (eval_cg2all.py:62-105): base columns +
            # bb_rmsd + full_atom_rmsd per sample.
            row = dict(tcr_base_columns(info))
            row.update(
                {
                    "sample_idx": i,
                    "bb_rmsd": eval_metrics.backbone_rmsd(
                        pred, gt, chains, regions, regions
                    ),
                    "full_atom_rmsd": eval_metrics.full_atom_rmsd(
                        pred, gt, chains, regions, regions
                    ),
                }
            )
            rows.append(row)
    df = pd.DataFrame(rows)
    if len(df):
        df.to_csv(output_dir / "cg2all_eval.csv", index=False)
        logger.info(
            f"cg2all eval: {len(df)} samples, "
            f"mean full-atom RMSD {df['full_atom_rmsd'].mean():.3f} A"
        )
    return df


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--prediction_dir", required=True)
    ap.add_argument("--output_dir", default=None)
    ap.add_argument(
        "--skip_convert", action="store_true",
        help="only evaluate already-converted "
        "sample_{i}_1_all_atom.pdb files (never invoke cg2all)",
    )
    args = ap.parse_args()
    run(
        pathlib.Path(args.prediction_dir),
        pathlib.Path(args.output_dir) if args.output_dir else None,
        skip_convert=args.skip_convert,
    )


if __name__ == "__main__":
    main()
