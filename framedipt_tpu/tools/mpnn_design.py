"""In-process sequence design with the TPU-native ProteinMPNN.

Replaces the reference's two-subprocess hop (parse_multiple_chains.py +
protein_mpnn_run.py, invoked from experiments/inference.py:558-623) with
one in-process call: parse PDBs -> featurize -> batched jit'd sampling ->
reference-format fasta files under ``output_dir/seqs``.

TPU-native improvement over the reference runner: all
``num_seq_per_target`` sequences sample as ONE batch (each row with its
own decoding order), and scoring of all samples is one batched
teacher-forced pass — protein_mpnn_run.py:210-340 loops them one by one.

Output contract (protein_mpnn_run.py:349-368): per input PDB a
``seqs/{name}.fa`` whose first record is the native sequence
(score/global_score on the native) followed by one record per sample
(``>T=..., sample=n, score=..., global_score=..., seq_recovery=...``);
multi-chain sequences join with '/'.

Also implements the runner's side modes: ``score_backbones``
(--score_only), ``probs_backbones`` (--conditional_probs_only
[+--conditional_probs_only_backbone] / --unconditional_probs_only),
--save_score / --save_probs sidecars, and a ``main()`` CLI mirroring
protein_mpnn_run.py:383-423 for the flags the pipeline uses.
"""
from __future__ import annotations

import functools
import pathlib

import jax
import jax.numpy as jnp
import numpy as np

from framedipt_tpu.data import constants as rc
from framedipt_tpu.data.protein import from_pdb_string, int_to_chain_id
from framedipt_tpu.model import mpnn
from framedipt_tpu.tools import mpnn_restraints as restraints
from framedipt_tpu.tools.external import ToolUnavailable
from framedipt_tpu.tools.log import get_logger

logger = get_logger()

_BACKBONE37 = [rc.atom_order[a] for a in ("N", "CA", "C", "O")]


def load_mpnn_params(
    weights_path: str | pathlib.Path,
) -> tuple[dict, mpnn.MPNNConfig]:
    """Load reference ``.pt`` (via torch) or converted ``.npz`` weights.
    k_neighbors comes from the checkpoint's num_edges when present
    (protein_mpnn_run.py:166-167)."""
    path = pathlib.Path(weights_path)
    if not path.exists():
        raise ToolUnavailable(
            f"ProteinMPNN weights not found at {path}; run "
            "scripts/fetch_weights.py or set inference.mpnn_weights_path"
        )
    if path.suffix == ".npz":
        data = np.load(path, allow_pickle=False)
        k = int(data["num_edges"]) if "num_edges" in data else 48
        sd = {n: data[n] for n in data.files if n != "num_edges"}
    else:
        try:
            import torch
        except ImportError as exc:  # pragma: no cover
            raise ToolUnavailable(
                f"torch needed to read {path}; convert to .npz first"
            ) from exc
        ckpt = torch.load(path, map_location="cpu", weights_only=True)
        k = int(ckpt.get("num_edges", 48))
        sd = ckpt["model_state_dict"]
    # CA-only checkpoints are identified by their edge-embedding input
    # width (9*16+7+16 = 167 vs the vanilla 25*16+16 = 416). hidden_dim and
    # the layer counts are read from the weights too, so checkpoints from
    # the training CLI with non-default dims load correctly (the published
    # v_48_* set is 128/3/3, but nothing guarantees that for local .npz).
    edge_w = np.asarray(sd["features.edge_embedding.weight"])
    ca_only = edge_w.shape[1] != 416
    hidden = int(edge_w.shape[0])
    n_enc = len({k.split(".")[1] for k in sd if k.startswith("encoder_layers.")})
    n_dec = len({k.split(".")[1] for k in sd if k.startswith("decoder_layers.")})
    params = jax.tree.map(jnp.asarray, mpnn.convert_mpnn_state_dict(sd))
    return params, mpnn.MPNNConfig(
        hidden_dim=hidden,
        num_encoder_layers=n_enc or 3,
        num_decoder_layers=n_dec or 3,
        k_neighbors=k,
        ca_only=ca_only,
    )


def _chains_from_pdb(pdb_path: pathlib.Path) -> list[tuple[str, np.ndarray]]:
    """PDB -> [(seq, coords[L,4,3])] per chain; residues missing any
    backbone atom get NaN coords (masked by featurize_chains)."""
    prot = from_pdb_string(pdb_path.read_text())
    chains = []
    for cid in sorted(np.unique(prot.chain_index)):
        sel = prot.chain_index == cid
        aatype = prot.aatype[sel]
        seq = "".join(
            rc.restypes[a] if a < len(rc.restypes) else "X" for a in aatype
        )
        xyz = prot.atom_positions[sel][:, _BACKBONE37, :].astype(np.float64)
        have = prot.atom_mask[sel][:, _BACKBONE37] > 0.5
        xyz[~have] = np.nan
        chains.append((seq, xyz))
    return chains


def _ca_only_chains(
    chains: list[tuple[str, np.ndarray]],
) -> list[tuple[str, np.ndarray]]:
    """Slice full-backbone [L,4,3] chains down to the CA column [L,1,3]
    for CA-only checkpoints (mpnn_encode reads column 0 as CA, matching
    the reference's ca_only featurize X[B,L,1,3], utils :183-186) —
    and so that the validity mask depends on CA presence only."""
    return [
        (seq, xyz if xyz.shape[1] == 1 else xyz[:, 1:2, :])
        for seq, xyz in chains
    ]


def chains_from_parsed_entry(
    entry: dict,
) -> tuple[str, list[tuple[str, np.ndarray]]]:
    """One parse_multiple_chains.py jsonl entry -> (name, chains).

    Entry format (parse_multiple_chains.py:113-146): ``seq_chain_{L}``
    strings + ``coords_chain_{L}`` dicts of per-atom [L,3] lists
    (N/CA/C/O, or CA only under --ca_only); '-' gap characters map to X
    with the coords' NaNs masking the residue."""
    letters = sorted(
        k.removeprefix("seq_chain_") for k in entry
        if k.startswith("seq_chain_")
    )
    if not letters:
        raise ToolUnavailable(
            f"parsed entry {entry.get('name', '?')!r}: no seq_chain_ keys"
        )
    chains = []
    for ltr in letters:
        seq = entry[f"seq_chain_{ltr}"].replace("-", "X")
        cd = entry[f"coords_chain_{ltr}"]
        if f"N_chain_{ltr}" in cd:
            xyz = np.stack(
                [np.asarray(cd[f"{a}_chain_{ltr}"], np.float64)
                 for a in ("N", "CA", "C", "O")],
                axis=1,
            )
        else:  # CA-only parse
            xyz = np.asarray(cd[f"CA_chain_{ltr}"], np.float64)[:, None, :]
        if len(seq) != len(xyz):
            raise ToolUnavailable(
                f"parsed entry {entry.get('name', '?')!r} chain {ltr}: "
                f"seq len {len(seq)} != coords {len(xyz)}"
            )
        chains.append((seq, xyz))
    return str(entry.get("name", "entry")), chains


def iter_cases(
    pdb_dir: pathlib.Path | str | None = None,
    jsonl_path: pathlib.Path | str | None = None,
) -> list[tuple[str, list[tuple[str, np.ndarray]]]]:
    """The runner's two input modes as one iterator: a folder of PDBs
    (parsed in-process) or a parse_multiple_chains.py jsonl dataset
    (protein_mpnn_run.py:147-158 StructureDataset)."""
    if (pdb_dir is None) == (jsonl_path is None):
        raise ToolUnavailable("give exactly one of pdb_dir / jsonl_path")
    if jsonl_path is not None:
        path = pathlib.Path(jsonl_path)
        if not path.exists():
            raise ToolUnavailable(f"no parsed jsonl at {path}")
        import json as _json

        cases = [
            chains_from_parsed_entry(_json.loads(line))
            for line in path.read_text().splitlines() if line.strip()
        ]
        if not cases:
            raise ToolUnavailable(f"{path}: empty parsed jsonl")
        return cases
    pdb_dir = pathlib.Path(pdb_dir)
    pdbs = sorted(pdb_dir.glob("*.pdb"))
    if not pdbs:
        raise ToolUnavailable(f"no .pdb files under {pdb_dir}")
    return [(p.stem, _chains_from_pdb(p)) for p in pdbs]


def aa_omit_vector(omit_aas: str) -> np.ndarray:
    """``--omit_AAs`` string -> one-hot omit vector over the 21-letter
    alphabet (protein_mpnn_run.py:30-34)."""
    vec = np.zeros((len(mpnn.MPNN_ALPHABET),), np.float32)
    for a in omit_aas:
        vec[mpnn.MPNN_ALPHABET.index(a)] = 1.0
    return vec


def aa_bias_vector(bias: dict[str, float] | None) -> np.ndarray:
    """``--bias_AA_jsonl`` dict {letter: logit-bias} -> dense vector
    (protein_mpnn_run.py:70-76)."""
    vec = np.zeros((len(mpnn.MPNN_ALPHABET),), np.float32)
    for a, v in (bias or {}).items():
        vec[mpnn.MPNN_ALPHABET.index(a)] = float(v)
    return vec


def homomer_tied_positions(
    chain_lengths: list[int],
) -> tuple[tuple[int, ...], ...]:
    """Tie residue i across every chain (the homo-oligomer pattern of
    helper_scripts/make_tied_positions_dict.py, homooligomeric_state=1),
    in the concatenated featurize_chains coordinate frame."""
    offsets = np.concatenate([[0], np.cumsum(chain_lengths)[:-1]])
    n = min(chain_lengths)
    return tuple(
        tuple(int(off + i) for off in offsets) for i in range(n)
    )


@functools.partial(
    jax.jit, static_argnames=("cfg", "num_seqs", "temperature", "tied_pos")
)
def _design_batch(
    params, key, feats, cfg, num_seqs, temperature,
    omit_aas=None, bias_aas=None, tied_pos=None, chain_m_pos=None,
    omit_aa_mask=None, bias_by_res=None, tied_beta=None,
    pssm_coef=None, pssm_bias=None, pssm_multi=0.0,
    pssm_log_odds_mask=None,
):
    """Sample num_seqs sequences as one batch and score them with the
    teacher-forced pass at each sample's own decoding order.
    ``chain_m_pos`` [1,L] fixes sub-chain positions (reference
    chain_M_pos from fixed_positions_jsonl; scores/recovery mask with
    chain_M*chain_M_pos as in protein_mpnn_run.py:266-283). The other
    optional [1,L,...] restraint tensors are the tied_featurize outputs
    built by tools/mpnn_restraints.py and broadcast over the sample
    batch; ``tied_beta`` is per-position [L] (tied_sample weights)."""
    rep = lambda a: jnp.repeat(a, num_seqs, axis=0)  # noqa: E731
    x, s = rep(feats["X"]), rep(feats["S"])
    mask, chain_m = rep(feats["mask"]), rep(feats["chain_M"])
    res_idx = rep(feats["residue_idx"])
    enc = rep(feats["chain_encoding_all"])
    cmp_ = (
        rep(chain_m_pos) if chain_m_pos is not None
        else jnp.ones_like(chain_m)
    )
    opt = lambda a: None if a is None else rep(a)  # noqa: E731
    restraints = dict(
        omit_aa_mask=opt(omit_aa_mask),
        bias_by_res=opt(bias_by_res),
        pssm_coef=opt(pssm_coef),
        pssm_bias=opt(pssm_bias),
        pssm_multi=pssm_multi,
        pssm_log_odds_mask=opt(pssm_log_odds_mask),
    )
    k_randn, k_sample, k_score = jax.random.split(key, 3)
    randn = jax.random.normal(k_randn, s.shape)
    if tied_pos:
        out = mpnn.mpnn_tied_sample(
            params, k_sample, x, randn, s, chain_m, enc, res_idx, mask, cfg,
            tied_pos, temperature=temperature, omit_aas=omit_aas,
            bias_aas=bias_aas, chain_m_pos=cmp_, tied_beta=tied_beta,
            **restraints,
        )
    else:
        out = mpnn.mpnn_sample(
            params, k_sample, x, randn, s, chain_m, enc, res_idx, mask, cfg,
            temperature=temperature, omit_aas=omit_aas, bias_aas=bias_aas,
            chain_m_pos=cmp_, **restraints,
        )
    lp = mpnn.mpnn_log_probs(
        params, x, out["S"], mask, chain_m, res_idx, enc, cfg,
        decoding_order=out["decoding_order"],
    )
    mask_for_loss = mask * chain_m * cmp_
    scores = mpnn.mpnn_scores(out["S"], lp, mask_for_loss)
    global_scores = mpnn.mpnn_scores(out["S"], lp, mask)
    recovery = jnp.sum(
        (out["S"] == s).astype(jnp.float32) * mask_for_loss, axis=-1
    ) / jnp.sum(mask_for_loss, axis=-1)
    # Native-sequence score (reference scores the native with a fresh
    # random order, run.py:275-281; we reuse the first sample's order —
    # same distribution, one fewer compile).
    lp_native = mpnn.mpnn_log_probs(
        params, x[:1], s[:1], mask[:1], chain_m[:1], res_idx[:1], enc[:1],
        cfg, decoding_order=out["decoding_order"][:1],
    )
    native_score = mpnn.mpnn_scores(s[:1], lp_native, mask_for_loss[:1])
    native_global = mpnn.mpnn_scores(s[:1], lp_native, mask[:1])
    return {
        "S": out["S"], "score": scores, "global_score": global_scores,
        "recovery": recovery, "native_score": native_score,
        "native_global_score": native_global,
        "probs": out["probs"], "log_probs": lp,
        "mask_for_loss": mask_for_loss,
    }


def _seq_str(s_row: np.ndarray, chain_lengths: list[int]) -> str:
    parts, off = [], 0
    for ln in chain_lengths:
        parts.append(
            "".join(mpnn.MPNN_ALPHABET[i] for i in s_row[off : off + ln])
        )
        off += ln
    return "/".join(parts)


def score_backbones(
    pdb_dir: pathlib.Path | str | None,
    output_dir: pathlib.Path | str,
    num_scores: int = 8,
    seed: int = 38,
    params: dict | None = None,
    cfg: mpnn.MPNNConfig | None = None,
    weights_path: str | pathlib.Path | None = None,
    jsonl_path: pathlib.Path | str | None = None,
) -> pathlib.Path:
    """The runner's --score_only mode (protein_mpnn_run.py:222-252): score
    each PDB's native backbone-sequence pair under num_scores random
    decoding orders, writing ``score_only/{name}.npz`` with ``score`` and
    ``global_score`` arrays. All orders run as ONE batched pass."""
    if params is None:
        params, cfg = load_mpnn_params(weights_path or "weights/mpnn/v_48_020.pt")
    assert cfg is not None
    out = pathlib.Path(output_dir) / "score_only"
    out.mkdir(parents=True, exist_ok=True)
    key = jax.random.PRNGKey(seed)
    for i, (case_name, chains) in enumerate(iter_cases(pdb_dir, jsonl_path)):
        if cfg.ca_only:
            chains = _ca_only_chains(chains)
        feats = mpnn.featurize_chains(chains)
        rep = lambda a: jnp.repeat(jnp.asarray(a), num_scores, axis=0)  # noqa: E731
        x, s = rep(feats["X"]), rep(feats["S"])
        mask, chain_m = rep(feats["mask"]), rep(feats["chain_M"])
        res_idx, enc = rep(feats["residue_idx"]), rep(feats["chain_encoding_all"])
        randn = jax.random.normal(jax.random.fold_in(key, i), s.shape)
        lp = mpnn.mpnn_log_probs(
            params, x, s, mask, chain_m, res_idx, enc, cfg, randn=randn
        )
        score = np.asarray(mpnn.mpnn_scores(s, lp, mask * chain_m))
        global_score = np.asarray(mpnn.mpnn_scores(s, lp, mask))
        np.savez(
            out / f"{case_name}.npz", score=score, global_score=global_score
        )
        logger.info(
            f"scored {case_name}: mean {score.mean():.4f} "
            f"global {global_score.mean():.4f} (n={num_scores})"
        )
    return out


def design_sequences(
    pdb_dir: pathlib.Path | str | None,
    output_dir: pathlib.Path | str,
    num_seq_per_target: int = 8,
    sampling_temp: float | str | list[float] = 0.1,
    seed: int = 38,
    params: dict | None = None,
    cfg: mpnn.MPNNConfig | None = None,
    weights_path: str | pathlib.Path | None = None,
    omit_aas: str = "X",
    bias_aa: dict[str, float] | None = None,
    save_score: bool = False,
    save_probs: bool = False,
    tie_chains: bool = False,
    design_chains: list[str] | None = None,
    chain_id_dict: dict | None = None,
    fixed_positions: dict[str, list[int]] | None = None,
    omit_aa_dict: dict | None = None,
    bias_by_res_dict: dict | None = None,
    tied_positions: list | dict | None = None,
    pssm_dict: dict | None = None,
    pssm_multi: float = 0.0,
    pssm_threshold: float = 0.0,
    pssm_log_odds_flag: bool = False,
    pssm_bias_flag: bool = False,
    backbone_noise: float = 0.0,
    jsonl_path: pathlib.Path | str | None = None,
    batch_size: int | None = None,
    max_length: int | None = None,
    model_name: str = "v_48_020",
) -> pathlib.Path:
    """Design sequences for every ``*.pdb`` under pdb_dir (reference
    default invocation: num_seq_per_target from config, temp 0.1, seed 38
    — experiments/inference.py:584-599). Returns the ``seqs`` directory.

    ``save_score`` / ``save_probs`` mirror the runner's flags
    (protein_mpnn_run.py:369-374): per-PDB ``scores/{name}.npz``
    (score/global_score over all samples) and ``probs/{name}.npz``
    (per-step sampling probs, teacher-forced log_probs, S, mask,
    chain_order). ``tie_chains`` designs homo-oligomers: residue i is
    tied across every chain (tied_sample + the homomer pattern of
    helper_scripts/make_tied_positions_dict.py). ``design_chains``
    restricts design to the named chains, the rest stay fixed at their
    native sequence (the global --pdb_path_chains form of the
    designed/fixed split); ``chain_id_dict`` is the per-PDB form — the
    --chain_id_jsonl contract ``{name: [designed_chains, fixed_chains]}``
    written by helper_scripts/assign_fixed_chains.py. It takes precedence
    over ``design_chains``, and a name absent from the dict is a loud
    error (the reference KeyErrors there too, protein_mpnn_utils.py:199).
    ``fixed_positions`` maps chain letter -> 1-based residue positions to
    keep native within a designed chain (the --fixed_positions_jsonl
    contract, helper_scripts/make_fixed_positions_dict.py).

    The remaining runner restraints take the reference jsonl dict shapes
    (see tools/mpnn_restraints.py; {pdb_name: inner} and bare forms both
    accepted): ``omit_aa_dict`` (--omit_AA_jsonl), ``bias_by_res_dict``
    (--bias_by_res_jsonl), ``tied_positions`` (--tied_positions_jsonl,
    arbitrary groups + optional per-member betas — mutually exclusive
    with ``tie_chains``), ``pssm_dict`` + the four pssm knobs
    (--pssm_jsonl / _multi / _threshold / _log_odds_flag / _bias_flag,
    protein_mpnn_run.py:220,291), and ``backbone_noise`` (the runner's
    --backbone_noise augment_eps, gaussian on input coords).

    ``sampling_temp`` accepts the runner's multi-temperature string
    ("0.2 0.25 0.5"): each temperature generates num_seq_per_target
    sequences, sample numbering restarting per temperature and the
    score/probs sidecars concatenating across temperatures
    (protein_mpnn_run.py:54,287-367). ``batch_size`` chunks each
    temperature's samples reference-style (NUM_BATCHES =
    num_seq_per_target // batch_size, run.py:52 — the floor division
    drops a remainder, kept for parity but logged); the default (None)
    samples all of them as ONE batched call, which is the TPU-right
    shape. ``max_length`` skips structures longer than it (the runner's
    StructureDataset filter, run.py:116)."""
    if params is None:
        params, cfg = load_mpnn_params(weights_path or "weights/mpnn/v_48_020.pt")
    assert cfg is not None
    if isinstance(sampling_temp, str):
        temps = [float(t) for t in sampling_temp.split()]
    elif isinstance(sampling_temp, (list, tuple)):
        temps = [float(t) for t in sampling_temp]
    else:
        temps = [float(sampling_temp)]
    if batch_size is None:
        batch_sizes = [num_seq_per_target]
    else:
        n_batches = num_seq_per_target // batch_size
        if n_batches == 0:
            raise ToolUnavailable(
                f"batch_size {batch_size} > num_seq_per_target "
                f"{num_seq_per_target}: zero batches"
            )
        if n_batches * batch_size != num_seq_per_target:
            logger.warning(
                f"num_seq_per_target {num_seq_per_target} is not a "
                f"multiple of batch_size {batch_size}: generating "
                f"{n_batches * batch_size} per temperature (the "
                f"reference's floor division, protein_mpnn_run.py:52)"
            )
        batch_sizes = [batch_size] * n_batches
    seqs_dir = pathlib.Path(output_dir) / "seqs"
    seqs_dir.mkdir(parents=True, exist_ok=True)
    key = jax.random.PRNGKey(seed)
    omit_vec = jnp.asarray(aa_omit_vector(omit_aas))
    bias_vec = jnp.asarray(aa_bias_vector(bias_aa))
    for i, (name, chains) in enumerate(iter_cases(pdb_dir, jsonl_path)):
        if cfg.ca_only:
            chains = _ca_only_chains(chains)
        if max_length is not None:
            total = sum(len(seq) for seq, _ in chains)
            if total > max_length:
                logger.info(
                    f"skipping {name}: length {total} > max_length "
                    f"{max_length} (StructureDataset filter)"
                )
                continue
        letters_all = [int_to_chain_id(j) for j in range(len(chains))]
        case_design = design_chains
        if chain_id_dict is not None:
            inner = chain_id_dict.get(name)
            if inner is None:
                raise ToolUnavailable(
                    f"{name} missing from chain_id_dict (the reference's "
                    "tied_featurize KeyErrors on a missing name too, "
                    "protein_mpnn_utils.py:199)"
                )
            case_design = [str(c) for c in inner[0]]
        designed_flags = (
            [ltr in case_design for ltr in letters_all]
            if case_design is not None else [True] * len(chains)
        )
        if case_design is not None and not any(designed_flags):
            raise ToolUnavailable(
                f"{name}: none of designed chains {case_design} "
                f"present (chains: {letters_all})"
            )
        feats = mpnn.featurize_chains(chains, designed=designed_flags)
        lens = [len(seq) for seq, _ in chains]
        res = restraints  # module alias
        cmp_arr = None
        if fixed_positions:
            cmp_arr = jnp.asarray(res.chain_m_pos_from_dict(
                res.resolve_name(fixed_positions, name), letters_all, lens
            ))
        omit_mask_arr = bias_res_arr = tied_beta_arr = None
        if omit_aa_dict:
            omit_mask_arr = jnp.asarray(res.omit_aa_mask_from_dict(
                res.resolve_name(omit_aa_dict, name), letters_all, lens
            ))
        if bias_by_res_dict:
            bias_res_arr = jnp.asarray(res.bias_by_res_from_dict(
                res.resolve_name(bias_by_res_dict, name), letters_all, lens
            ))
        if tie_chains and tied_positions:
            raise ToolUnavailable(
                "tie_chains and tied_positions are mutually exclusive"
            )
        tied_pos = homomer_tied_positions(lens) if tie_chains else None
        if tied_positions:
            tied_pos, tied_beta_np = res.tied_positions_from_list(
                res.resolve_name(tied_positions, name), letters_all, lens
            )
            tied_beta_arr = jnp.asarray(tied_beta_np)
        pssm_kwargs: dict = {}
        if pssm_dict and (pssm_bias_flag or pssm_log_odds_flag):
            coef, pbias, lo_mask = res.pssm_tensors_from_dict(
                res.resolve_name(pssm_dict, name), letters_all, lens,
                threshold=pssm_threshold,
            )
            if pssm_bias_flag:
                pssm_kwargs["pssm_coef"] = jnp.asarray(coef)
                pssm_kwargs["pssm_bias"] = jnp.asarray(pbias)
                pssm_kwargs["pssm_multi"] = float(pssm_multi)
            if pssm_log_odds_flag:
                pssm_kwargs["pssm_log_odds_mask"] = jnp.asarray(lo_mask)
        f = {k: jnp.asarray(v) for k, v in feats.items()}
        if backbone_noise > 0.0:  # the runner's augment_eps on coords
            f["X"] = f["X"] + backbone_noise * jax.random.normal(
                jax.random.fold_in(jax.random.fold_in(key, i), 7),
                f["X"].shape,
            ) * f["mask"][..., None, None]
        letters = letters_all
        des = [ltr for ltr, d in zip(letters, designed_flags) if d]
        fixed = [ltr for ltr, d in zip(letters, designed_flags) if not d]
        key_case = jax.random.fold_in(key, i)
        lines: list[str] = []
        acc: dict[str, list[np.ndarray]] = {
            k: [] for k in ("score", "global_score", "probs",
                            "log_probs", "S", "mask_for_loss")
        }
        n_written = 0
        for ti, temp in enumerate(temps):
            for j, bs in enumerate(batch_sizes):
                # first (temp, batch) reuses the pre-multi-temp key so
                # single-temp single-batch outputs are unchanged
                k_batch = (
                    key_case if ti == 0 and j == 0
                    else jax.random.fold_in(key_case, 7919 * ti + j)
                )
                out = _design_batch(
                    params, k_batch, f, cfg, bs, float(temp),
                    omit_aas=omit_vec, bias_aas=bias_vec,
                    tied_pos=tied_pos, chain_m_pos=cmp_arr,
                    omit_aa_mask=omit_mask_arr, bias_by_res=bias_res_arr,
                    tied_beta=tied_beta_arr, **pssm_kwargs,
                )
                out = {k2: np.asarray(v) for k2, v in out.items()}
                if not lines:  # native header once, first batch's score
                    lines = [
                        ">{}, score={:.4f}, global_score={:.4f}, "
                        "fixed_chains={}, designed_chains={}, {}={}, "
                        "seed={}".format(
                            name, float(out["native_score"][0]),
                            float(out["native_global_score"][0]), fixed,
                            des,
                            "CA_model_name" if cfg.ca_only
                            else "model_name",
                            model_name, seed,
                        ),
                        _seq_str(feats["S"][0], lens),
                    ]
                for b in range(bs):
                    lines.append(
                        ">T={}, sample={}, score={:.4f}, "
                        "global_score={:.4f}, seq_recovery={:.4f}".format(
                            temp, j * bs + b + 1, float(out["score"][b]),
                            float(out["global_score"][b]),
                            float(out["recovery"][b]),
                        )
                    )
                    lines.append(_seq_str(out["S"][b], lens))
                    n_written += 1
                for k2 in acc:
                    acc[k2].append(out[k2])
        (seqs_dir / f"{name}.fa").write_text("\n".join(lines) + "\n")
        cat = {k2: np.concatenate(v, axis=0) for k2, v in acc.items()}
        if save_score:
            sc_dir = pathlib.Path(output_dir) / "scores"
            sc_dir.mkdir(parents=True, exist_ok=True)
            np.savez(
                sc_dir / f"{name}.npz",
                score=cat["score"].astype(np.float32),
                global_score=cat["global_score"].astype(np.float32),
            )
        if save_probs:
            pr_dir = pathlib.Path(output_dir) / "probs"
            pr_dir.mkdir(parents=True, exist_ok=True)
            np.savez(
                pr_dir / f"{name}.npz",
                probs=cat["probs"].astype(np.float32),
                log_probs=cat["log_probs"].astype(np.float32),
                S=cat["S"].astype(np.int64),
                mask=cat["mask_for_loss"].astype(np.float32),
                chain_order=np.array(letters),
            )
        logger.info(
            f"designed {n_written} sequences for {name} "
            f"(L={sum(lens)}, chains={letters})"
        )
    return seqs_dir


def probs_backbones(
    pdb_dir: pathlib.Path | str | None,
    output_dir: pathlib.Path | str,
    conditional: bool = False,
    backbone_only: bool = False,
    num_repeats: int = 1,
    seed: int = 38,
    params: dict | None = None,
    cfg: mpnn.MPNNConfig | None = None,
    weights_path: str | pathlib.Path | None = None,
    jsonl_path: pathlib.Path | str | None = None,
) -> pathlib.Path:
    """The runner's --unconditional_probs_only / --conditional_probs_only
    modes (protein_mpnn_run.py:241-263): per PDB an npz with ``log_p``
    ([R,L,21] — conditional repeats differ by decoding-order randn;
    unconditional is deterministic so R=1), ``S``, ``mask`` and
    ``design_mask``. ``backbone_only`` maps to
    --conditional_probs_only_backbone."""
    if params is None:
        params, cfg = load_mpnn_params(weights_path or "weights/mpnn/v_48_020.pt")
    assert cfg is not None
    sub = "conditional_probs_only" if conditional else "unconditional_probs_only"
    out_dir = pathlib.Path(output_dir) / sub
    out_dir.mkdir(parents=True, exist_ok=True)
    key = jax.random.PRNGKey(seed)
    for i, (case_name, chains) in enumerate(iter_cases(pdb_dir, jsonl_path)):
        if cfg.ca_only:
            chains = _ca_only_chains(chains)
        feats = mpnn.featurize_chains(chains)
        f = {k: jnp.asarray(v) for k, v in feats.items()}
        design_mask = np.asarray(feats["chain_M"] * feats["mask"])[0]
        if conditional:
            reps = []
            for r in range(num_repeats):
                randn = jax.random.normal(
                    jax.random.fold_in(jax.random.fold_in(key, i), r),
                    f["S"].shape,
                )
                reps.append(mpnn.mpnn_conditional_log_probs(
                    params, f["X"], f["S"], f["mask"], f["chain_M"],
                    f["residue_idx"], f["chain_encoding_all"], cfg,
                    randn=randn, backbone_only=backbone_only,
                ))
            log_p = np.concatenate([np.asarray(x) for x in reps], axis=0)
        else:
            log_p = np.asarray(mpnn.mpnn_unconditional_log_probs(
                params, f["X"], f["mask"], f["residue_idx"],
                f["chain_encoding_all"], cfg,
            ))
        np.savez(
            out_dir / f"{case_name}.npz",
            log_p=log_p.astype(np.float32),
            S=np.asarray(feats["S"][0]).astype(np.int64),
            mask=np.asarray(feats["mask"][0]).astype(np.float32),
            design_mask=design_mask.astype(np.float32),
        )
        logger.info(f"{sub}: wrote {case_name}.npz log_p{log_p.shape}")
    return out_dir


def main(argv: list[str] | None = None) -> None:
    """CLI mirroring the reference runner's surface
    (protein_mpnn_run.py:383-423) for the flags the inference pipeline and
    eval protocols actually use; design (default) or --score_only."""
    import argparse
    import json

    p = argparse.ArgumentParser(
        description="TPU-native ProteinMPNN sequence design"
    )
    p.add_argument("--pdb_dir", type=str, default="",
                   help="Folder of .pdb backbones to design")
    p.add_argument("--pdb_path", type=str, default="",
                   help="Single PDB to design (alternative to --pdb_dir)")
    p.add_argument("--jsonl_path", type=str, default="",
                   help="parse_multiple_chains.py-format parsed dataset "
                        "(the runner's StructureDataset input mode; see "
                        "tools/mpnn_helpers.py parse-chains)")
    p.add_argument("--out_folder", type=str, required=True,
                   help="Output folder (seqs/ or score_only/ created inside)")
    p.add_argument("--weights_path", type=str,
                   default="weights/mpnn/v_48_020.pt",
                   help=".pt or converted .npz MPNN checkpoint")
    p.add_argument("--path_to_model_weights", type=str, default="",
                   help="Folder holding {model_name}.pt/.npz checkpoints "
                        "(the runner's flag; overrides --weights_path)")
    p.add_argument("--model_name", type=str, default="",
                   help="Checkpoint name inside --path_to_model_weights, "
                        "e.g. v_48_020, v_48_002; also stamped into the "
                        "fasta header")
    p.add_argument("--ca_only", action="store_true",
                   help="Require a CA-only checkpoint (the runner routes "
                        "to ca_model_weights/; here the checkpoint config "
                        "decides and this flag asserts it)")
    p.add_argument("--pdb_path_chains", type=str, default="",
                   help="With --pdb_path: space-separated chains to "
                        "design (alias of --design_chains, the runner's "
                        "flag)")
    p.add_argument("--num_seq_per_target", type=int, default=8)
    p.add_argument("--sampling_temp", type=str, default="0.1",
                   help="One or more temperatures, e.g. '0.2 0.25 0.5' — "
                        "num_seq_per_target sequences per temperature")
    p.add_argument("--batch_size", type=int, default=0,
                   help="Samples per sampling call; 0 (default) batches "
                        "all num_seq_per_target in ONE call (TPU-optimal)")
    p.add_argument("--max_length", type=int, default=200000,
                   help="Skip structures longer than this")
    p.add_argument("--seed", type=int, default=38,
                   help="0 picks a random seed (reference behavior)")
    p.add_argument("--score_only", action="store_true",
                   help="Score native backbone-sequence pairs instead of "
                        "designing (writes score_only/{name}.npz)")
    p.add_argument("--conditional_probs_only", action="store_true",
                   help="Write log p(s_i | s_rest, backbone) npz instead of "
                        "designing (conditional_probs_only/{name}.npz)")
    p.add_argument("--conditional_probs_only_backbone", action="store_true",
                   help="With --conditional_probs_only: "
                        "log p(s_i | backbone-order-first) instead")
    p.add_argument("--unconditional_probs_only", action="store_true",
                   help="Write one-pass log p(s_i | backbone) npz "
                        "(unconditional_probs_only/{name}.npz)")
    p.add_argument("--save_score", action="store_true",
                   help="Also write scores/{name}.npz in design mode")
    p.add_argument("--save_probs", action="store_true",
                   help="Also write probs/{name}.npz in design mode")
    p.add_argument("--omit_AAs", type=str, default="X",
                   help="Letters never sampled, e.g. 'XC'")
    p.add_argument("--bias_AA_jsonl", type=str, default="",
                   help="JSON file {letter: logit bias}, e.g. '{\"A\": -1.1}'")
    p.add_argument("--tie_chains", action="store_true",
                   help="Homo-oligomer design: tie residue i across all "
                        "chains (tied_sample)")
    p.add_argument("--design_chains", type=str, default="",
                   help="Comma-separated chain letters to design; others "
                        "stay fixed (the global designed/fixed split), "
                        "e.g. 'A,C'")
    p.add_argument("--chain_id_jsonl", type=str, default="",
                   help="Per-PDB designed/fixed split: {name: "
                        "[[designed], [fixed]]} as written by "
                        "assign_fixed_chains.py; overrides "
                        "--design_chains")
    p.add_argument("--fixed_positions_jsonl", type=str, default="",
                   help="JSON file {chain: [1-based positions]} kept "
                        "native within designed chains, e.g. "
                        "'{\"A\": [1, 2, 10]}'")
    p.add_argument("--omit_AA_jsonl", type=str, default="",
                   help="Per-position forbidden letters: {chain: "
                        "[[[positions], \"LETTERS\"], ...]}")
    p.add_argument("--bias_by_res_jsonl", type=str, default="",
                   help="Per-position per-letter logit bias: "
                        "{chain: [[21 floats] x chain_len]}")
    p.add_argument("--tied_positions_jsonl", type=str, default="",
                   help="Arbitrary tie groups: [{chain: [pos]} | "
                        "{chain: [[pos],[beta]]}, ...] "
                        "(mutually exclusive with --tie_chains)")
    p.add_argument("--pssm_jsonl", type=str, default="",
                   help="PSSM restraints {chain: {pssm_coef, pssm_bias, "
                        "pssm_log_odds}}")
    p.add_argument("--pssm_multi", type=float, default=0.0,
                   help="[0,1]: 0 ignore pssm, 1 ignore MPNN predictions")
    p.add_argument("--pssm_threshold", type=float, default=0.0,
                   help="log-odds cutoff for the per-position AA mask")
    p.add_argument("--pssm_log_odds_flag", type=int, default=0)
    p.add_argument("--pssm_bias_flag", type=int, default=0)
    p.add_argument("--backbone_noise", type=float, default=0.0,
                   help="Gaussian std added to backbone coords "
                        "(the runner's augment_eps)")
    args = p.parse_args(argv)

    if sum(map(bool, (args.pdb_dir, args.pdb_path, args.jsonl_path))) != 1:
        p.error("give exactly one of --pdb_dir / --pdb_path / --jsonl_path")
    if args.pdb_path_chains and not args.pdb_path:
        p.error("--pdb_path_chains needs --pdb_path")
    jsonl_path = pathlib.Path(args.jsonl_path) if args.jsonl_path else None
    pdb_dir = None
    if args.pdb_path:
        # Single-PDB mode: stage it alone so the directory walk sees one file.
        import shutil
        import tempfile
        stage = pathlib.Path(tempfile.mkdtemp(prefix="mpnn_single_"))
        shutil.copy(args.pdb_path, stage)
        pdb_dir = stage
    elif args.pdb_dir:
        pdb_dir = pathlib.Path(args.pdb_dir)

    if args.seed == 0:  # the runner picks a random seed for 0 (run.py:47-50)
        import random as _random
        args.seed = _random.randint(1, 999)
        logger.info(f"seed 0 -> random seed {args.seed}")
    weights = pathlib.Path(args.weights_path)
    if args.path_to_model_weights:
        folder = pathlib.Path(args.path_to_model_weights)
        name = args.model_name or "v_48_020"
        for ext in (".npz", ".pt"):
            if (folder / f"{name}{ext}").exists():
                weights = folder / f"{name}{ext}"
                break
        else:
            raise ToolUnavailable(
                f"no {name}.npz/.pt under {folder}"
            )
    params, cfg = load_mpnn_params(weights)
    if args.ca_only and not cfg.ca_only:
        raise ToolUnavailable(
            f"--ca_only given but {weights} is a full-backbone checkpoint "
            "(pass a ca_model_weights/ checkpoint)"
        )
    model_name = args.model_name or weights.stem
    batch_size = args.batch_size or None
    design_chains = [
        c.strip() for c in args.design_chains.split(",") if c.strip()
    ] or args.pdb_path_chains.split() or None
    if args.score_only:
        out = score_backbones(
            pdb_dir, args.out_folder, num_scores=args.num_seq_per_target,
            seed=args.seed, params=params, cfg=cfg, jsonl_path=jsonl_path,
        )
    elif args.conditional_probs_only or args.unconditional_probs_only:
        out = probs_backbones(
            pdb_dir, args.out_folder,
            conditional=args.conditional_probs_only,
            backbone_only=args.conditional_probs_only_backbone,
            num_repeats=args.num_seq_per_target, seed=args.seed,
            params=params, cfg=cfg, jsonl_path=jsonl_path,
        )
    else:
        bias = (
            json.loads(pathlib.Path(args.bias_AA_jsonl).read_text())
            if args.bias_AA_jsonl else None
        )
        out = design_sequences(
            pdb_dir, args.out_folder,
            num_seq_per_target=args.num_seq_per_target,
            sampling_temp=args.sampling_temp, seed=args.seed,
            params=params, cfg=cfg, omit_aas=args.omit_AAs, bias_aa=bias,
            save_score=args.save_score, save_probs=args.save_probs,
            tie_chains=args.tie_chains,
            design_chains=design_chains,
            chain_id_dict=(
                restraints.load_jsonl(args.chain_id_jsonl)
                if args.chain_id_jsonl else None
            ),
            fixed_positions=(
                restraints.load_jsonl(args.fixed_positions_jsonl)
                if args.fixed_positions_jsonl else None
            ),
            omit_aa_dict=(
                restraints.load_jsonl(args.omit_AA_jsonl)
                if args.omit_AA_jsonl else None
            ),
            bias_by_res_dict=(
                restraints.load_jsonl(args.bias_by_res_jsonl)
                if args.bias_by_res_jsonl else None
            ),
            tied_positions=(
                restraints.load_jsonl(args.tied_positions_jsonl)
                if args.tied_positions_jsonl else None
            ),
            pssm_dict=(
                restraints.load_jsonl(args.pssm_jsonl)
                if args.pssm_jsonl else None
            ),
            pssm_multi=args.pssm_multi,
            pssm_threshold=args.pssm_threshold,
            pssm_log_odds_flag=bool(args.pssm_log_odds_flag),
            pssm_bias_flag=bool(args.pssm_bias_flag),
            backbone_noise=args.backbone_noise,
            jsonl_path=jsonl_path,
            batch_size=batch_size,
            max_length=args.max_length,
            model_name=model_name,
        )
    print(out)


if __name__ == "__main__":
    main()
