"""Offline dataset preprocessing CLI.

Role of framedipt/data/process_pdb_dataset.py: walk a directory of mmCIF
files, parse each, apply quality filters (length, chain count, resolution,
secondary-structure composition, radius-of-gyration quantile — the
reference's mdtraj/DSSP computations :332-398 replaced by the in-tree
analysis/dssp module), write one pickle of raw features per structure into
hashed subdirectories, and emit ``metadata.csv``. Serial and
multiprocessing drivers (:567-630, :633-665, mp.Pool :732).

Usage:
    python -m framedipt_tpu.data.pipeline --cif_dir=... --output_dir=... \
        [--num_workers=8] [--max_len=512] [--min_len=60]
"""
from __future__ import annotations

import argparse
import dataclasses
import multiprocessing as mp
import pathlib
import pickle
import time

import numpy as np
import pandas as pd

from framedipt_tpu.analysis import dssp as dssp_lib
from framedipt_tpu.data import features as feature_lib
from framedipt_tpu.data.mmcif import parse_mmcif
from framedipt_tpu.tools import errors
from framedipt_tpu.tools.config import FilteringConfig
from framedipt_tpu.tools.log import get_logger

logger = get_logger()


@dataclasses.dataclass
class ProcessOptions:
    output_dir: pathlib.Path
    filtering: FilteringConfig
    max_resolution: float | None = 5.0
    first_assembly: bool = True
    # Inference-metadata extensions (ref process_pdb_dataset.process_mmcif
    # as called from experiments/sampler.py:184-226): select specific
    # author chains, per-chain length bounds, chain-count cap, reject the
    # invalid 0.0 resolution, and skip the SS/Rg training-only filters.
    chains: list[str] | None = None
    chain_min_len: int | None = None
    chain_max_len: int | None = None
    max_num_chains: int | None = None
    check_valid_resolution: bool = False
    ss_filters: bool = True


def process_mmcif(path: pathlib.Path, opts: ProcessOptions) -> dict | None:
    """Parse + filter one structure; write its pickle; return metadata row.

    Raises DataError subclasses for filter rejections (callers skip)."""
    pdb_name = path.stem[:4] if opts.first_assembly else path.stem
    mmcif_obj = parse_mmcif(path, file_id=pdb_name)

    res = mmcif_obj.header.resolution
    if opts.max_resolution is not None and res is not None and res > opts.max_resolution:
        raise errors.ResolutionError(f"{pdb_name}: resolution {res}")
    if opts.check_valid_resolution and (res is None or res == 0.0):
        # Reference rejects the sentinel 0.0 "invalid" resolution
        # (process_pdb_dataset.py:458-460; parse failures report None here).
        raise errors.ResolutionError(f"{pdb_name}: invalid resolution {res}")

    if opts.chains is not None:
        missing = [c for c in opts.chains if c not in mmcif_obj.chains]
        if missing:
            raise errors.ChainError(f"{pdb_name}: missing chains {missing}")
    if opts.max_num_chains is not None and len(mmcif_obj.chains) > opts.max_num_chains:
        raise errors.ChainError(
            f"{pdb_name}: {len(mmcif_obj.chains)} chains > {opts.max_num_chains}"
        )
    if opts.chain_min_len is not None or opts.chain_max_len is not None:
        # Reference semantics: modeled chain length = span between first and
        # last non-UNK residue (process_pdb_dataset.get_modeled_chain_len).
        for cid in opts.chains or sorted(mmcif_obj.chains):
            aatype = mmcif_obj.chains[cid].aatype
            known = np.where(aatype != 20)[0]
            if known.size == 0:
                raise errors.LengthError(f"{pdb_name}/{cid}: no modeled residues")
            modeled = int(known.max() - known.min() + 1)
            if opts.chain_max_len is not None and modeled > opts.chain_max_len:
                raise errors.LengthError(
                    f"{pdb_name}/{cid}: chain length {modeled} > {opts.chain_max_len}"
                )
            if opts.chain_min_len is not None and modeled < opts.chain_min_len:
                raise errors.LengthError(
                    f"{pdb_name}/{cid}: chain length {modeled} < {opts.chain_min_len}"
                )

    raw = feature_lib.structure_to_features(mmcif_obj, chain_ids=opts.chains)
    n_res = len(raw["aatype"])
    filt = opts.filtering
    if n_res > filt.max_len:
        raise errors.LengthError(f"{pdb_name}: length {n_res} > {filt.max_len}")
    if n_res < filt.min_len:
        raise errors.LengthError(f"{pdb_name}: length {n_res} < {filt.min_len}")

    num_chains = len(np.unique(raw["chain_index"]))
    oligomeric = mmcif_obj.header.oligomeric_details or ""
    if filt.allowed_oligomer and oligomeric not in filt.allowed_oligomer:
        raise errors.ChainError(f"{pdb_name}: oligomer '{oligomeric}' not allowed")

    # Secondary structure + radius of gyration (in-tree DSSP).
    bb = raw["bb_mask"].astype(bool)
    ss = dssp_lib.assign_secondary_structure(
        raw["atom_positions"][bb], raw["atom_mask"][bb]
    )
    helix_percent = float(np.mean(ss == "H"))
    strand_percent = float(np.mean(ss == "E"))
    coil_percent = float(np.mean(ss == "C"))
    if opts.ss_filters:
        if helix_percent > filt.max_helix_percent:
            raise errors.SecondaryStructureError(
                f"{pdb_name}: helix {helix_percent:.2f}"
            )
        if coil_percent > filt.max_loop_percent:
            raise errors.SecondaryStructureError(
                f"{pdb_name}: coil {coil_percent:.2f}"
            )
        if strand_percent < filt.min_beta_percent:
            raise errors.SecondaryStructureError(
                f"{pdb_name}: beta {strand_percent:.2f}"
            )
    rog = dssp_lib.radius_of_gyration(raw["atom_positions"][bb], raw["atom_mask"][bb])

    # Write pickle into a 2-char hashed subdir (reference layout).
    subdir = opts.output_dir / pdb_name[1:3]
    subdir.mkdir(parents=True, exist_ok=True)
    pkl_path = subdir / f"{pdb_name}.pkl"
    with open(pkl_path, "wb") as f:
        pickle.dump(raw, f)

    modeled_len = int(
        sum(hi - lo + 1 for lo, hi in zip(raw["min_modeled_idxs"], raw["max_modeled_idxs"]))
    )
    return {
        "pdb_name": pdb_name,
        "processed_path": str(pkl_path),
        "raw_path": str(path),
        "resolution": res if res is not None else 0.0,
        "num_chains": num_chains,
        "seq_len": n_res,
        "modeled_seq_len": modeled_len,
        "helix_percent": helix_percent,
        "strand_percent": strand_percent,
        "coil_percent": coil_percent,
        "radius_gyration": rog,
        "oligomeric_details": oligomeric,
    }


def _process_one(args) -> dict | None:
    path, opts = args
    t0 = time.time()
    try:
        row = process_mmcif(path, opts)
        logger.info(f"processed {path.name} in {time.time()-t0:.2f}s")
        return row
    except errors.DataError as e:
        logger.info(f"skipped {path.name}: {e}")
        return None
    except Exception as e:  # noqa: BLE001 - preprocessing must not die
        logger.warning(f"failed {path.name}: {type(e).__name__}: {e}")
        return None


def process_serially(paths, opts: ProcessOptions) -> list[dict]:
    rows = [_process_one((p, opts)) for p in paths]
    return [r for r in rows if r is not None]


def process_parallel(paths, opts: ProcessOptions, num_workers: int) -> list[dict]:
    with mp.get_context("fork").Pool(num_workers) as pool:
        rows = pool.map(_process_one, [(p, opts) for p in paths])
    return [r for r in rows if r is not None]


def apply_rog_quantile(rows: list[dict], quantile: float) -> list[dict]:
    """Drop outliers above the Rg quantile vs length (reference rog filter)."""
    if not rows or quantile >= 1.0:
        return rows
    rogs = np.asarray([r["radius_gyration"] for r in rows])
    cutoff = np.quantile(rogs, quantile)
    return [r for r in rows if r["radius_gyration"] <= cutoff]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cif_dir", required=True)
    ap.add_argument("--output_dir", required=True)
    ap.add_argument("--num_workers", type=int, default=1)
    ap.add_argument("--max_len", type=int, default=512)
    ap.add_argument("--min_len", type=int, default=60)
    ap.add_argument("--max_resolution", type=float, default=5.0)
    ap.add_argument("--rog_quantile", type=float, default=0.96)
    args = ap.parse_args()

    cif_dir = pathlib.Path(args.cif_dir)
    paths = sorted(list(cif_dir.glob("*.cif")) + list(cif_dir.glob("*.cif.gz")))
    logger.info(f"found {len(paths)} mmCIF files in {cif_dir}")
    opts = ProcessOptions(
        output_dir=pathlib.Path(args.output_dir),
        filtering=FilteringConfig(
            max_len=args.max_len, min_len=args.min_len, rog_quantile=args.rog_quantile
        ),
        max_resolution=args.max_resolution,
    )
    opts.output_dir.mkdir(parents=True, exist_ok=True)
    if args.num_workers > 1:
        rows = process_parallel(paths, opts, args.num_workers)
    else:
        rows = process_serially(paths, opts)
    rows = apply_rog_quantile(rows, args.rog_quantile)
    meta = pd.DataFrame(rows)
    meta_path = opts.output_dir / "metadata.csv"
    meta.to_csv(meta_path, index=False)
    logger.info(f"wrote {len(meta)} rows to {meta_path}")


if __name__ == "__main__":
    main()
