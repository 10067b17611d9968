"""Re-number PDB residues contiguously per chain.

Role of evaluation/residue_reindex.py: external predictors keep author
numbering; framework outputs use contiguous 1-based numbering per chain.
This CLI rewrites a PDB so residue indices run 1..L per chain, enabling
region-aligned comparisons.

Usage:
    python -m framedipt_tpu.eval.residue_reindex --input=a.pdb --output=b.pdb
"""
from __future__ import annotations

import argparse
import pathlib

import numpy as np

from framedipt_tpu.data.protein import from_pdb_string, to_pdb


def reindex(pdb_text: str) -> str:
    prot = from_pdb_string(pdb_text)
    new_idx = np.zeros_like(prot.residue_index)
    for cid in np.unique(prot.chain_index):
        sel = prot.chain_index == cid
        new_idx[sel] = np.arange(1, sel.sum() + 1)
    prot.residue_index = new_idx
    return to_pdb(prot)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    args = ap.parse_args()
    text = pathlib.Path(args.input).read_text()
    pathlib.Path(args.output).write_text(reindex(text))


if __name__ == "__main__":
    main()
