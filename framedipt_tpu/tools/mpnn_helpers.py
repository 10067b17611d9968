"""Generators for the MPNN restraint jsonl dicts (helper_scripts parity).

The reference stages restraints in two hops: parse_multiple_chains.py
writes a parsed-chains jsonl, then each helper_scripts/*.py reads it and
emits one restraint dict. Here the generators read the PDBs directly
(chain letters and lengths are all they need) and emit the SAME
name-keyed jsonl formats, which ``tools/mpnn_design.py`` — and the
reference runner — consume unchanged.

Covered generators (reference file -> subcommand):

- make_fixed_positions_dict.py -> ``fixed-positions`` (incl.
  --specify_non_fixed inversion)
- make_tied_positions_dict.py  -> ``tied-positions`` (explicit lists and
  --homooligomer 1)
- make_pos_neg_tied_positions_dict.py -> ``tied-positions`` with
  --pos_neg_chain_list/--pos_neg_chain_betas (weighted [[pos],[beta]]
  groups for positive/negative design)
- make_bias_AA.py -> ``bias-aa``
- make_bias_per_res_dict.py -> ``bias-per-res`` (the reference script
  hard-codes its chains/positions as an editable example; this is the
  parameterized form: --chain/--positions/--AA_list/--bias)
- assign_fixed_chains.py -> ``assign-chains``
- parse_multiple_chains.py -> ``parse-chains`` (PDBs -> the parsed
  jsonl dataset consumed by mpnn_design --jsonl_path; numbering gaps
  become '-' residues with NaN coords, as upstream)
- other_tools/make_omit_AA.py -> ``omit-aa`` (the reference script
  hard-codes its position groups as an editable example; this is the
  parameterized form: --chain/--position_list/--AA_list groups)
- other_tools/make_pssm_dict.py -> ``pssm`` (same .pssm text parse —
  skip 2 header lines, drop each line's first 4 chars, split floats —
  input-alphabet -> MPNN-alphabet permutation, bias =
  softmax(log_odds - X_mask*1e8, T))

List-argument grammar matches the reference: space-separated within a
chain, comma-separated between chains ("1 2 4, 3 5").
"""
from __future__ import annotations

import argparse
import json
import pathlib

import numpy as np

from framedipt_tpu.data.protein import from_pdb_string, int_to_chain_id

# Keep in sync with model/mpnn.py MPNN_ALPHABET (imported lazily there to
# keep this module jax-free for fast CLI startup).
ALPHABET = "ACDEFGHIKLMNPQRSTVWYX"


def chain_lengths_from_pdb(pdb_path: str | pathlib.Path) -> dict[str, int]:
    """PDB -> {chain letter: residue count}, letters in file order."""
    prot = from_pdb_string(pathlib.Path(pdb_path).read_text())
    out: dict[str, int] = {}
    for cid in sorted(np.unique(prot.chain_index)):
        out[int_to_chain_id(int(cid))] = int((prot.chain_index == cid).sum())
    return out


# Backbone atom37 indices (N, CA, C, O) and aatype -> letter, resolved
# lazily to keep module import light.
def parse_pdb_entry(
    pdb_path: str | pathlib.Path, ca_only: bool = False
) -> dict:
    """PDB -> one parse_multiple_chains.py jsonl entry
    (parse_multiple_chains.py:113-146): ``seq_chain_{L}`` strings,
    ``coords_chain_{L}`` dicts of per-atom [L,3] lists (NaN where the
    atom is missing), ``name``/``num_of_chains``/``seq``. Numbering gaps
    become '-' residues with NaN coords, as upstream."""
    from framedipt_tpu.data import constants as rc

    atom_names = ("CA",) if ca_only else ("N", "CA", "C", "O")
    atom_idx = [rc.atom_order[a] for a in atom_names]
    prot = from_pdb_string(pathlib.Path(pdb_path).read_text())
    entry: dict = {}
    concat_seq = ""
    n_chains = 0
    for cid in sorted(np.unique(prot.chain_index)):
        ltr = int_to_chain_id(int(cid))
        sel = np.where(prot.chain_index == cid)[0]
        res_num = prot.residue_index[sel]
        length = int(res_num[-1] - res_num[0] + 1)
        xyz = np.full((length, len(atom_idx), 3), np.nan)
        seq_chars = ["-"] * length
        for row, num, aa in zip(sel, res_num, prot.aatype[sel]):
            j = int(num - res_num[0])
            seq_chars[j] = (
                rc.restypes[aa] if aa < len(rc.restypes) else "X"
            )
            have = prot.atom_mask[row, atom_idx] > 0.5
            coords = prot.atom_positions[row, atom_idx].copy()
            coords[~have] = np.nan
            xyz[j] = coords
        seq = "".join(seq_chars)
        entry[f"seq_chain_{ltr}"] = seq
        entry[f"coords_chain_{ltr}"] = {
            f"{a}_chain_{ltr}": xyz[:, k, :].tolist()
            for k, a in enumerate(atom_names)
        }
        concat_seq += seq
        n_chains += 1
    entry["name"] = pathlib.Path(pdb_path).stem
    entry["num_of_chains"] = n_chains
    entry["seq"] = concat_seq
    return entry


def _pdbs(pdb_dir: str, pdb_path: str) -> list[pathlib.Path]:
    if bool(pdb_dir) == bool(pdb_path):
        raise SystemExit("give exactly one of --pdb_dir / --pdb_path")
    if pdb_path:
        return [pathlib.Path(pdb_path)]
    paths = sorted(pathlib.Path(pdb_dir).glob("*.pdb"))
    if not paths:
        raise SystemExit(f"no .pdb files under {pdb_dir}")
    return paths


def _split_positions(position_list: str) -> list[list[int]]:
    return [
        [int(p) for p in one.split()] for one in position_list.split(",")
    ]


def make_fixed_positions(
    chains: dict[str, int], chain_list: list[str],
    positions: list[list[int]], specify_non_fixed: bool = False,
) -> dict[str, list[int]]:
    """make_fixed_positions_dict.py:17-41 for one structure: listed
    chains get their positions fixed (others []); with specify_non_fixed
    the listed positions are the DESIGNED ones and everything else —
    including every position of unlisted chains — is fixed."""
    out: dict[str, list[int]] = {}
    if not specify_non_fixed:
        for ltr, pos in zip(chain_list, positions):
            out[ltr] = pos
        for ltr in chains:
            out.setdefault(ltr, [])
    else:
        for ltr, ln in chains.items():
            everything = list(range(1, ln + 1))
            if ltr in chain_list:
                designed = set(positions[chain_list.index(ltr)])
                out[ltr] = sorted(set(everything) - designed)
            else:
                out[ltr] = everything
    return out


def make_tied_positions(
    chains: dict[str, int],
    chain_list: list[str] | None = None,
    positions: list[list[int]] | None = None,
    homooligomer: bool = False,
    betas: dict[str, float] | None = None,
) -> list[dict]:
    """make_tied_positions_dict.py:16-43 / make_pos_neg_…:16-54 for one
    structure. Explicit mode ties positions[j][i] across chain_list;
    homooligomer mode ties residue i across ALL chains (first chain's
    length). ``betas`` switches to the weighted [[pos],[beta]] form
    (pos/neg design); chains missing from it get weight 1.0."""
    groups: list[dict] = []
    if homooligomer:
        letters = sorted(chains)
        length = chains[letters[0]]
        if any(chains[ltr] != length for ltr in letters):
            # upstream silently emits out-of-range ties here; fail loud
            raise SystemExit(
                f"homooligomer ties need equal-length chains, got {chains}"
            )
        for i in range(1, length + 1):
            if betas is None:
                groups.append({ltr: [i] for ltr in letters})
            else:
                groups.append({
                    ltr: [[i], [float(betas.get(ltr, 1.0))]]
                    for ltr in letters
                })
    else:
        assert chain_list is not None and positions is not None
        for i in range(len(positions[0])):
            if betas is None:
                groups.append({
                    ltr: [positions[j][i]]
                    for j, ltr in enumerate(chain_list)
                })
            else:
                groups.append({
                    ltr: [[positions[j][i]], [float(betas.get(ltr, 1.0))]]
                    for j, ltr in enumerate(chain_list)
                })
    return groups


def make_bias_per_res(
    chains: dict[str, int], chain: str, positions: list[int],
    aa_list: list[str], bias: float,
) -> dict[str, list]:
    """Parameterized make_bias_per_res_dict.py: bias ``aa_list`` by
    ``bias`` at the given 1-based positions of ``chain``; every chain
    gets a full zero array (the consumer indexes all chains)."""
    out = {}
    for ltr, ln in chains.items():
        arr = np.zeros((ln, len(ALPHABET)))
        if ltr == chain:
            for pos in positions:
                for aa in aa_list:
                    arr[pos - 1, ALPHABET.index(aa)] = bias
        out[ltr] = arr.tolist()
    return out


def make_omit_aa(
    chains: dict[str, int], chain: str,
    position_groups: list[list[int]], aa_groups: list[str],
) -> dict[str, list]:
    """Parameterized make_omit_AA.py: per-position forbidden-letter
    groups [[positions], "LETTERS"] on ``chain``; every other chain gets
    [] (the consumer, omit_aa_mask_from_dict, reads the same format the
    reference example emits — make_omit_AA.py:17-29)."""
    if len(position_groups) != len(aa_groups):
        raise SystemExit("--position_list groups != --AA_list groups")
    if chain not in chains:
        raise SystemExit(f"chain {chain!r} not in structure ({chains})")
    ln = chains[chain]
    for positions in position_groups:
        bad = [p for p in positions if not 1 <= p <= ln]
        if bad:
            raise SystemExit(
                f"omit-aa positions {bad} out of range for chain "
                f"{chain!r} (length {ln})"
            )
    out: dict[str, list] = {ltr: [] for ltr in chains}
    out[chain] = [
        [positions, aas]
        for positions, aas in zip(position_groups, aa_groups)
    ]
    return out


# make_pssm_dict.py's alphabets: .pssm columns arrive in the standard
# substitution-matrix residue order and are permuted into the MPNN
# 21-letter alphabet (X column left empty).
PSSM_INPUT_ALPHABET = "ARNDCQEGHILKMFPSTWYV"


def parse_pssm_file(path: str | pathlib.Path) -> np.ndarray:
    """make_pssm_dict.py:14-25's .pssm text parse: skip 2 header lines,
    drop each remaining line's first 4 characters, split the rest into
    floats -> [L, >=40] (cols 0:20 log-odds, 20:40 probabilities, both
    in PSSM_INPUT_ALPHABET order)."""
    lines = pathlib.Path(path).read_text().splitlines()[2:]
    rows = []
    for line in lines:
        if not line.strip():
            continue
        vals = [float(tok) for tok in line[4:].split()]
        if len(vals) < 40:
            raise SystemExit(
                f"{path}: pssm row has {len(vals)} columns, need >=40"
            )
        rows.append(vals[:40])
    if not rows:
        raise SystemExit(f"{path}: no pssm rows after the 2 header lines")
    return np.asarray(rows, np.float64)


def make_pssm_entry(
    pssm_rows: np.ndarray, length: int,
    coef: float = 1.0, temperature: float = 1.0,
) -> dict[str, list]:
    """One chain's pssm dict (make_pssm_dict.py:28-57): permute the 20
    input columns into the 21-letter MPNN alphabet, bias =
    softmax(log_odds - X_mask*1e8, T) so X gets ~0 probability, coef =
    ones * coef."""
    if len(pssm_rows) != length:
        raise SystemExit(
            f"pssm has {len(pssm_rows)} rows but chain has "
            f"{length} residues"
        )
    perm = np.zeros((20, len(ALPHABET)))
    for i, letter in enumerate(PSSM_INPUT_ALPHABET):
        perm[i, ALPHABET.index(letter)] = 1.0
    log_odds = pssm_rows[:, :20] @ perm
    x_mask = np.concatenate([np.zeros(20), np.ones(1)])
    z = (log_odds - x_mask[None, :] * 1e8) / temperature
    z -= z.max(axis=-1, keepdims=True)
    e = np.exp(z)
    bias = e / e.sum(axis=-1, keepdims=True)
    return {
        "pssm_coef": (np.ones(length) * coef).tolist(),
        "pssm_bias": bias.tolist(),
        "pssm_log_odds": log_odds.tolist(),
    }


def _write(path: str, obj: dict) -> None:
    pathlib.Path(path).write_text(json.dumps(obj) + "\n")
    print(path)


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(
        description="Generate MPNN restraint jsonl dicts from PDBs "
                    "(helper_scripts equivalents)"
    )
    p.add_argument("--pdb_dir", type=str, default="")
    p.add_argument("--pdb_path", type=str, default="")
    p.add_argument("--output_path", type=str, required=True)
    sub = p.add_subparsers(dest="cmd", required=True)

    fp = sub.add_parser("fixed-positions",
                        help="make_fixed_positions_dict equivalent")
    fp.add_argument("--chain_list", type=str, required=True,
                    help="space-separated chains, e.g. 'A B'")
    fp.add_argument("--position_list", type=str, required=True,
                    help="per-chain 1-based positions, e.g. '1 2 5, 3 4'")
    fp.add_argument("--specify_non_fixed", action="store_true")

    tp = sub.add_parser("tied-positions",
                        help="make_[pos_neg_]tied_positions_dict equivalent")
    tp.add_argument("--chain_list", type=str, default="")
    tp.add_argument("--position_list", type=str, default="")
    tp.add_argument("--homooligomer", type=int, default=0)
    tp.add_argument("--pos_neg_chain_list", type=str, default="",
                    help="chains for weighted ties, e.g. 'A B'")
    tp.add_argument("--pos_neg_chain_betas", type=str, default="",
                    help="weights per chain, e.g. '1.0 -0.5'")

    ba = sub.add_parser("bias-aa", help="make_bias_AA equivalent")
    ba.add_argument("--AA_list", type=str, required=True)
    ba.add_argument("--bias_list", type=str, required=True)

    br = sub.add_parser("bias-per-res",
                        help="make_bias_per_res_dict (parameterized)")
    br.add_argument("--chain", type=str, required=True)
    br.add_argument("--positions", type=str, required=True,
                    help="space-separated 1-based positions")
    br.add_argument("--AA_list", type=str, required=True)
    br.add_argument("--bias", type=float, required=True)

    ac = sub.add_parser("assign-chains",
                        help="assign_fixed_chains equivalent")
    ac.add_argument("--chain_list", type=str, required=True,
                    help="chains to design; the rest are fixed")

    oa = sub.add_parser("omit-aa",
                        help="make_omit_AA (parameterized): per-position "
                             "forbidden letters on one chain")
    oa.add_argument("--chain", type=str, required=True)
    oa.add_argument("--position_list", type=str, required=True,
                    help="1-based position groups, e.g. '1 2 3, 40 41'")
    oa.add_argument("--AA_list", type=str, required=True,
                    help="forbidden letters per group, e.g. 'GPL WC'")

    ps = sub.add_parser("pssm",
                        help="make_pssm_dict equivalent: .pssm file -> "
                             "--pssm_jsonl input")
    ps.add_argument("--pssm_path", type=str, required=True)
    ps.add_argument("--chains", type=str, default="",
                    help="chains the pssm applies to (default: all)")
    ps.add_argument("--coef", type=float, default=1.0,
                    help="pssm_coef value (attention weight 0..1)")
    ps.add_argument("--temperature", type=float, default=1.0,
                    help="softmax temperature for pssm_bias")

    pc = sub.add_parser("parse-chains",
                        help="parse_multiple_chains equivalent: PDBs -> "
                             "parsed jsonl dataset (--jsonl_path input "
                             "for mpnn_design)")
    pc.add_argument("--ca_only", action="store_true")

    args = p.parse_args(argv)

    if args.cmd == "parse-chains":  # one entry per line, not name-keyed
        lines = [
            json.dumps(parse_pdb_entry(pdb, ca_only=args.ca_only))
            for pdb in _pdbs(args.pdb_dir, args.pdb_path)
        ]
        pathlib.Path(args.output_path).write_text("\n".join(lines) + "\n")
        print(args.output_path)
        return

    if args.cmd == "bias-aa":  # structure-independent
        aas = args.AA_list.split()
        biases = [float(b) for b in args.bias_list.split()]
        if len(aas) != len(biases):
            raise SystemExit("--AA_list and --bias_list lengths differ")
        _write(args.output_path, dict(zip(aas, biases)))
        return

    my_dict: dict = {}
    for pdb in _pdbs(args.pdb_dir, args.pdb_path):
        chains = chain_lengths_from_pdb(pdb)
        name = pdb.stem
        if args.cmd == "fixed-positions":
            my_dict[name] = make_fixed_positions(
                chains, args.chain_list.split(),
                _split_positions(args.position_list),
                specify_non_fixed=args.specify_non_fixed,
            )
        elif args.cmd == "tied-positions":
            betas = None
            if args.pos_neg_chain_list:
                betas = dict(zip(
                    args.pos_neg_chain_list.split(),
                    [float(b) for b in args.pos_neg_chain_betas.split()],
                ))
            my_dict[name] = make_tied_positions(
                chains,
                chain_list=(args.chain_list.split() or None),
                positions=(
                    _split_positions(args.position_list)
                    if args.position_list else None
                ),
                homooligomer=bool(args.homooligomer),
                betas=betas,
            )
        elif args.cmd == "bias-per-res":
            my_dict[name] = make_bias_per_res(
                chains, args.chain, [int(x) for x in args.positions.split()],
                args.AA_list.split(), args.bias,
            )
        elif args.cmd == "omit-aa":
            my_dict[name] = make_omit_aa(
                chains, args.chain,
                _split_positions(args.position_list),
                args.AA_list.split(),
            )
        elif args.cmd == "pssm":
            rows = parse_pssm_file(args.pssm_path)
            apply_to = args.chains.split() or list(chains)
            my_dict[name] = {
                ltr: make_pssm_entry(
                    rows, chains[ltr],
                    coef=args.coef, temperature=args.temperature,
                )
                for ltr in apply_to
            }
        elif args.cmd == "assign-chains":
            designed = args.chain_list.split()
            fixed = [ltr for ltr in chains if ltr not in designed]
            my_dict[name] = (designed, fixed)
    _write(args.output_path, my_dict)


if __name__ == "__main__":
    main()
