"""Pure-Python mmCIF parser (no BioPython).

Fills the role of the reference's BioPython-backed mmCIF stack
(framedipt/data/mmcif_parsing.py:173-420 + data/parsers.py:16): tokenizes
the CIF grammar (loops, quoted strings, semicolon text fields), extracts
header metadata (resolution, method, release date, oligomeric state) and
first-model protein chains as atom37 feature arrays keyed by author chain id.
"""
from __future__ import annotations

import dataclasses
import gzip
import pathlib
from typing import Iterator

import numpy as np

from framedipt_tpu.data import constants as rc
from framedipt_tpu.tools.errors import MmcifParsingError

# Common non-standard residue mapping (selenomethionine, frequent PTMs and
# crystallization artifacts; extended per mmCIF via _chem_comp parents —
# the role of BioPython's SCOPData/PDBData tables in the reference's parser,
# framedipt/data/parsers.py + mmcif_parsing.py:173-420).
_MODIFIED_RESIDUES = {
    "MSE": "MET",  # selenomethionine
    "SEC": "CYS",  # selenocysteine
    "PYL": "LYS",  # pyrrolysine
    "SEP": "SER",  # phosphoserine
    "TPO": "THR",  # phosphothreonine
    "PTR": "TYR",  # phosphotyrosine
    "CSO": "CYS",  # s-hydroxycysteine
    "CSD": "CYS",  # s-cysteinesulfinic acid
    "CSX": "CYS",  # s-oxy cysteine
    "CME": "CYS",  # s,s-(2-hydroxyethyl)thiocysteine
    "OCS": "CYS",  # cysteine sulfonic acid
    "SMC": "CYS",  # s-methylcysteine
    "KCX": "LYS",  # lysine nz-carboxylic acid
    "MLY": "LYS",  # n-dimethyl-lysine
    "M3L": "LYS",  # n-trimethyl-lysine
    "ALY": "LYS",  # n(6)-acetyllysine
    "LLP": "LYS",  # lysine-pyridoxal-5'-phosphate
    "HYP": "PRO",  # 4-hydroxyproline
    "PCA": "GLU",  # pyroglutamic acid
    "CGU": "GLU",  # gamma-carboxy-glutamic acid
    "FME": "MET",  # n-formylmethionine
    "MHO": "MET",  # s-oxymethionine
    "HIC": "HIS",  # 4-methyl-histidine
    "NEP": "HIS",  # n1-phosphonohistidine
    "MLZ": "LYS",  # n-methyl-lysine
    "AIB": "ALA",  # alpha-aminoisobutyric acid
    "DAL": "ALA",  # d-alanine (keep backbone)
    "SAR": "GLY",  # sarcosine
}


def _chem_comp_parents(cats) -> dict[str, str]:
    """Per-file modified-residue map from _chem_comp.mon_nstd_parent_comp_id
    (general: covers any annotated nonstandard residue, not just the static
    table)."""
    cc = cats.get("_chem_comp", {})
    ids = cc.get("id", [])
    parents = cc.get("mon_nstd_parent_comp_id", [])
    out = {}
    for comp, parent in zip(ids, parents):
        parent = parent.strip().upper()
        if parent in ("?", ".", "") or "," in parent:
            continue
        if comp not in rc.restype_3to1 and parent in rc.restype_3to1:
            out[comp] = parent
    return out


# --------------------------------------------------------------------------
# Tokenizer
# --------------------------------------------------------------------------


def _tokenize(text: str) -> Iterator[str]:
    """Yield CIF tokens: bare values, quoted strings, ;-delimited blocks,
    and structural keywords (loop_, data_*, tags)."""
    lines = text.splitlines()
    i = 0
    n = len(lines)
    while i < n:
        line = lines[i]
        if line.startswith(";"):
            # Multiline text field.
            block = [line[1:]]
            i += 1
            while i < n and not lines[i].startswith(";"):
                block.append(lines[i])
                i += 1
            i += 1  # consume closing ';'
            yield "\n".join(block)
            continue
        pos = 0
        ln = len(line)
        while pos < ln:
            c = line[pos]
            if c in " \t":
                pos += 1
                continue
            if c == "#":
                break
            if c in "'\"":
                # Quoted value: ends at quote followed by whitespace/EOL.
                end = pos + 1
                while end < ln:
                    if line[end] == c and (end + 1 == ln or line[end + 1] in " \t"):
                        break
                    end += 1
                yield line[pos + 1 : end]
                pos = end + 1
            else:
                end = pos
                while end < ln and line[end] not in " \t":
                    end += 1
                yield line[pos:end]
                pos = end
        i += 1


def parse_cif_categories_py(text: str) -> dict[str, dict[str, list[str]]]:
    """CIF text -> {category: {item: [values...]}} (loops and single rows).

    Pure-Python oracle; :func:`parse_cif_categories` routes to the native
    C++ tokenizer (framedipt_tpu/native/cif_tokenizer.cpp, ~15x faster)
    when the extension builds, and to this implementation otherwise."""
    cats: dict[str, dict[str, list[str]]] = {}
    tokens = _tokenize(text)
    tok = next(tokens, None)
    while tok is not None:
        low = tok.lower()
        if low.startswith("data_") or low.startswith("global_"):
            tok = next(tokens, None)
            continue
        if low == "loop_":
            tags: list[str] = []
            tok = next(tokens, None)
            while tok is not None and tok.startswith("_"):
                tags.append(tok)
                tok = next(tokens, None)
            values: list[str] = []
            while tok is not None and not (
                tok.lower() in ("loop_", "stop_")
                or tok.startswith("_")
                or tok.lower().startswith("data_")
            ):
                values.append(tok)
                tok = next(tokens, None)
            if tags:
                ncol = len(tags)
                nrow = len(values) // ncol
                for ci, tag in enumerate(tags):
                    cat, _, item = tag.partition(".")
                    cats.setdefault(cat, {}).setdefault(item, []).extend(
                        values[ci::ncol][:nrow] if nrow else []
                    )
            continue
        if tok.startswith("_"):
            tag = tok
            val = next(tokens, None)
            if val is None:
                break
            cat, _, item = tag.partition(".")
            cats.setdefault(cat, {}).setdefault(item, []).append(val)
            tok = next(tokens, None)
            continue
        tok = next(tokens, None)
    return cats


_cif_native = None
_cif_native_checked = False


def parse_cif_categories(text: str) -> dict[str, dict[str, list[str]]]:
    """CIF text -> {category: {item: [values...]}}.

    Routes to the native C++ tokenizer when available (built on demand,
    dict-identical output asserted by tests/unit/test_native_cif.py)."""
    global _cif_native, _cif_native_checked
    if not _cif_native_checked:
        from framedipt_tpu.native import load_cif_native

        _cif_native = load_cif_native()
        _cif_native_checked = True
    if _cif_native is not None:
        return _cif_native.parse_categories(text)
    return parse_cif_categories_py(text)


# --------------------------------------------------------------------------
# Structured view
# --------------------------------------------------------------------------


@dataclasses.dataclass
class MmcifHeader:
    resolution: float | None
    method: str | None
    release_date: str | None
    oligomeric_count: int | None
    oligomeric_details: str | None


@dataclasses.dataclass
class MmcifChain:
    chain_id: str  # author chain id
    aatype: np.ndarray  # [N]
    atom_positions: np.ndarray  # [N, 37, 3]
    atom_mask: np.ndarray  # [N, 37]
    residue_index: np.ndarray  # [N] author numbering
    b_factors: np.ndarray  # [N, 37]
    insertion_codes: list[str]

    @property
    def sequence(self) -> str:
        return rc.aatype_to_sequence(self.aatype)


@dataclasses.dataclass
class MmcifObject:
    file_id: str
    header: MmcifHeader
    chains: dict[str, MmcifChain]


def _get_first(cats, cat, item) -> str | None:
    vals = cats.get(cat, {}).get(item)
    if not vals:
        return None
    v = vals[0]
    return None if v in ("?", ".") else v


def _parse_header(cats) -> MmcifHeader:
    resolution = None
    for cat, item in (
        ("_refine", "ls_d_res_high"),
        ("_em_3d_reconstruction", "resolution"),
        ("_reflns", "d_resolution_high"),
    ):
        v = _get_first(cats, cat, item)
        if v is not None:
            try:
                resolution = float(v)
                break
            except ValueError:
                continue
    method = _get_first(cats, "_exptl", "method")
    dates = cats.get("_pdbx_audit_revision_history", {}).get("revision_date", [])
    dates = [d for d in dates if d not in ("?", ".")]
    release_date = min(dates) if dates else None
    oc = _get_first(cats, "_pdbx_struct_assembly", "oligomeric_count")
    od = _get_first(cats, "_pdbx_struct_assembly", "oligomeric_details")
    return MmcifHeader(
        resolution=resolution,
        method=method,
        release_date=release_date,
        oligomeric_count=int(oc) if oc and oc.isdigit() else None,
        oligomeric_details=od,
    )


def parse_mmcif(
    path: str | pathlib.Path, file_id: str | None = None
) -> MmcifObject:
    """Parse an mmCIF file into per-chain atom37 arrays (first model only,
    altloc '.'/'A' preferred, protein residues only)."""
    path = pathlib.Path(path)
    opener = gzip.open if path.suffix == ".gz" else open
    with opener(path, "rt") as f:
        text = f.read()
    cats = parse_cif_categories(text)
    atom_site = cats.get("_atom_site")
    if not atom_site or "Cartn_x" not in atom_site:
        raise MmcifParsingError(f"no _atom_site records in {path}")
    mod_residues = {**_MODIFIED_RESIDUES, **_chem_comp_parents(cats)}

    def col(name, default=None):
        vals = atom_site.get(name)
        if vals is None:
            if default is None:
                raise MmcifParsingError(f"missing _atom_site.{name} in {path}")
            return [default] * len(atom_site["Cartn_x"])
        return vals

    group = col("group_PDB", "ATOM")
    atom_id = col("label_atom_id")
    alt_id = col("label_alt_id", ".")
    comp_id = col("label_comp_id")
    auth_asym = col("auth_asym_id", None) if "auth_asym_id" in atom_site else col("label_asym_id")
    auth_seq = col("auth_seq_id", None) if "auth_seq_id" in atom_site else col("label_seq_id")
    icode = col("pdbx_PDB_ins_code", "?")
    xs, ys, zs = col("Cartn_x"), col("Cartn_y"), col("Cartn_z")
    bs = col("B_iso_or_equiv", "0")
    model_num = col("pdbx_PDB_model_num", "1")

    first_model = model_num[0]
    chains: dict[str, dict] = {}
    for i in range(len(atom_id)):
        if model_num[i] != first_model:
            continue
        if alt_id[i] not in (".", "A"):
            continue
        resname = comp_id[i]
        resname = mod_residues.get(resname, resname)
        if resname not in rc.restype_3to1:
            if group[i] == "ATOM" and resname != "UNK":
                resname = "UNK"
            elif resname != "UNK":
                continue
        name = atom_id[i]
        if name == "SE":  # selenium of MSE maps onto SD of MET
            name = "SD"
        if name not in rc.atom_order:
            continue
        cid = auth_asym[i]
        ch = chains.setdefault(cid, {})
        res_key = (auth_seq[i], icode[i])
        entry = ch.get(res_key)
        if entry is None:
            entry = {
                "resname": resname,
                "pos": np.zeros((37, 3)),
                "mask": np.zeros((37,)),
                "b": np.zeros((37,)),
            }
            ch[res_key] = entry
        ai = rc.atom_order[name]
        entry["pos"][ai] = [float(xs[i]), float(ys[i]), float(zs[i])]
        entry["mask"][ai] = 1.0
        try:
            entry["b"][ai] = float(bs[i])
        except ValueError:
            pass

    parsed_chains: dict[str, MmcifChain] = {}
    for cid, residues in chains.items():
        aatype, positions, masks, res_idx, bfs, icodes = [], [], [], [], [], []
        for (seq_id, ins), entry in residues.items():
            one = rc.restype_3to1.get(entry["resname"], "X")
            aatype.append(rc.restype_order.get(one, rc.unk_restype_index))
            positions.append(entry["pos"])
            masks.append(entry["mask"])
            try:
                res_idx.append(int(seq_id))
            except (TypeError, ValueError):
                res_idx.append(len(res_idx) + 1)
            bfs.append(entry["b"])
            icodes.append("" if ins in ("?", ".") else ins)
        if not aatype:
            continue
        parsed_chains[cid] = MmcifChain(
            chain_id=cid,
            aatype=np.asarray(aatype, np.int64),
            atom_positions=np.asarray(positions, np.float64),
            atom_mask=np.asarray(masks, np.float64),
            residue_index=np.asarray(res_idx, np.int64),
            b_factors=np.asarray(bfs, np.float64),
            insertion_codes=icodes,
        )

    if not parsed_chains:
        raise MmcifParsingError(f"no protein chains parsed from {path}")
    return MmcifObject(
        file_id=file_id or path.stem,
        header=_parse_header(cats),
        chains=parsed_chains,
    )
