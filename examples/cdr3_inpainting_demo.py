"""End-to-end TCR CDR3 inpainting demo (script form of the reference's
notebooks/tcr_cdr3_inpainting.ipynb): parse a TCR structure, locate the
CDR3 loops, sample inpainted conformations, write PDBs, and evaluate
backbone RMSD to the ground truth.

Run from the repo root (uses the bundled 1fyt fixture; pass --weights for
real inpainting.pth results, otherwise the model is random-init and the
output is geometry-plausible noise):

    python examples/cdr3_inpainting_demo.py [--weights=weights/inpainting.pth]
"""
from __future__ import annotations

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from framedipt_tpu.experiments.inference import Inference
from framedipt_tpu.eval import tcr_eval
from framedipt_tpu.tools.config import Config


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", default="")
    ap.add_argument("--out", default="./demo_outputs")
    ap.add_argument("--num_t", type=int, default=100)
    ap.add_argument("--samples", type=int, default=5)
    args = ap.parse_args()

    repo = pathlib.Path(__file__).resolve().parent.parent
    cif_dir = repo / "tests" / "data" / "cifs"

    cfg = Config()
    cfg.inference.inpainting = True
    cfg.inference.inpainting_samples.tcr = True
    cfg.inference.inpainting_samples.samples = args.samples
    cfg.inference.inpainting_samples.cdr_loops = ["beta_3"]
    cfg.inference.diffusion.num_t = args.num_t
    cfg.inference.weights_path = args.weights
    cfg.inference.output_dir = args.out
    cfg.inference.name = "cdr3_demo"
    cfg.data.csv_path = str(repo / "database" / "TCR_pMHC_II.csv")

    inference = Inference(cfg, cif_dir=cif_dir)
    inference.run_sampling()

    df = tcr_eval.run(inference.output_dir)
    if len(df):
        print(df[["pdb_name", "sample", "backbone_rmsd"]].to_string(index=False))


if __name__ == "__main__":
    main()
