"""Analysis IO helpers: atom37 -> PDB writers with diffusion-region
b-factor markers and trajectory (multi-model) support.

Role of framedipt/analysis/utils.py (write_prot_to_pdb :76-156 with its
auto-indexing filename convention, rigids_to_se3_vec :160).
"""
from __future__ import annotations

import os
import pathlib
import re

import numpy as np

from framedipt_tpu.data.protein import (
    Protein,
    format_models_native,
    prots_to_pdb,
    to_pdb,
)
from framedipt_tpu.geometry import quat as quat_ops

ATOM_MASK_EPS = 1e-7


def _as_protein(
    pos37: np.ndarray,
    aatype: np.ndarray | None,
    b_factors: np.ndarray | None,
    residue_index: np.ndarray | None,
    chain_index: np.ndarray | None,
) -> Protein:
    n = pos37.shape[0]
    atom_mask = (np.abs(pos37).sum(-1) > ATOM_MASK_EPS).astype(np.float64)
    return Protein(
        atom_positions=np.asarray(pos37, np.float64),
        aatype=np.zeros(n, np.int64) if aatype is None else np.asarray(aatype),
        atom_mask=atom_mask,
        residue_index=(
            np.arange(1, n + 1) if residue_index is None else np.asarray(residue_index)
        ),
        chain_index=(
            np.zeros(n, np.int64) if chain_index is None else np.asarray(chain_index)
        ),
        b_factors=(
            np.zeros((n, 37)) if b_factors is None else np.asarray(b_factors)
        ),
    )


def write_prot_to_pdb(
    prot_pos: np.ndarray,
    file_path: str | pathlib.Path,
    aatype: np.ndarray | None = None,
    overwrite: bool = False,
    no_indexing: bool = False,
    b_factors: np.ndarray | None = None,
    residue_index: np.ndarray | None = None,
    chain_index: np.ndarray | None = None,
) -> pathlib.Path:
    """Write atom37 positions ([N,37,3] or trajectory [T,N,37,3]) to PDB.

    Filename convention matches the reference: ``{stem}_{k}.pdb`` where k is
    1 + the largest existing index for that stem (auto-versioned outputs)."""
    file_path = pathlib.Path(file_path)
    if no_indexing:
        save_path = file_path if file_path.suffix == ".pdb" else file_path.with_suffix(".pdb")
    else:
        if overwrite:
            max_idx = 0
        else:
            stem = file_path.stem.removesuffix(".pdb")
            file_dir = file_path.parent
            max_idx = 0
            if file_dir.exists():
                for x in os.listdir(file_dir):
                    if stem in x:
                        m = re.findall(r"_(\d+).pdb", x)
                        if m:
                            max_idx = max(max_idx, int(m[0]))
        save_path = file_path.with_name(f"{file_path.stem}_{max_idx + 1}.pdb")

    pos = np.asarray(prot_pos)
    save_path.parent.mkdir(parents=True, exist_ok=True)
    n = pos.shape[-3]
    text = format_models_native(
        pos[None] if pos.ndim == 3 else pos,
        np.zeros(n, np.int64) if aatype is None else np.asarray(aatype),
        np.arange(1, n + 1) if residue_index is None else np.asarray(residue_index),
        np.zeros(n, np.int64) if chain_index is None else np.asarray(chain_index),
        np.zeros((n, 37)) if b_factors is None else np.asarray(b_factors),
    )
    if text is not None:
        # Native fast path: trajectory serialization is the host-side hot
        # spot of the sampling pipeline (see native/pdb_writer.cpp).
        save_path.write_text(text + "END\n")
    elif pos.ndim == 3:
        prot = _as_protein(pos, aatype, b_factors, residue_index, chain_index)
        save_path.write_text(to_pdb(prot))
    else:
        prots = [
            _as_protein(frame, aatype, b_factors, residue_index, chain_index)
            for frame in pos
        ]
        save_path.write_text(prots_to_pdb(prots))
    return save_path


def rigids_to_se3_vec(frames_t7: np.ndarray, scale_factor: float = 1.0) -> np.ndarray:
    """tensor7 frames -> [.., 6] (rotvec, scaled translation)
    (ref framedipt/analysis/utils.py:160-178)."""
    import jax.numpy as jnp

    trans = frames_t7[..., 4:] * scale_factor
    rotvec = np.asarray(quat_ops.to_rotvec(jnp.asarray(frames_t7[..., :4])))
    return np.concatenate([rotvec, trans], axis=-1)
