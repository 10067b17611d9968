"""Shared synthetic structure for MPNN parity fixtures and tests.

Deterministic numpy only — imported both by scripts/record_mpnn_fixture.py
(under torch) and by the offline parity test (under JAX).
"""
from __future__ import annotations

import numpy as np

from framedipt_tpu.model.mpnn import featurize_chains


def _backbone(rng: np.random.Generator, length: int) -> np.ndarray:
    """Plausible N/Ca/C/O coords [L,4,3]: a Ca walk with PHYSICAL step
    lengths (3.65-3.95 A, inside the reference's 3.6-4.0 CA-CA gate,
    protein_mpnn_utils.py:771) so the CA-model local frames are
    non-degenerate — degenerate frames put the quaternion branch on a
    knife edge (trace exactly -1) where torch/XLA 1-ulp rounding
    differences flip relu(1+trace) between 0 and epsilon."""
    dirs = rng.normal(0.0, 1.0, (length, 3)) + np.array([1.5, 0.4, 0.2])
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    steps = dirs * rng.uniform(3.65, 3.95, (length, 1))
    ca = np.cumsum(steps, axis=0)
    offs = rng.normal(0.0, 0.4, (length, 4, 3)) + np.array(
        [[-1.2, 0.3, 0.0], [0.0, 0.0, 0.0], [1.3, -0.2, 0.1], [1.9, 0.9, -0.4]]
    )
    x = ca[:, None, :] + offs
    x[:, 1, :] = ca
    return x


def synth_structure() -> dict[str, np.ndarray]:
    """Two chains (31 + 22 residues), two missing (NaN) residues, B=1.
    Sequences cover the full 21-letter alphabet including X."""
    rng = np.random.default_rng(5)
    seq_a = "ACDEFGHIKLMNPQRSTVWYXACDEFGHIKL"
    seq_b = "MNPQRSTVWYACDEFGHIKLMN"
    xa = _backbone(rng, len(seq_a))
    xb = _backbone(rng, len(seq_b)) + np.array([12.0, -4.0, 6.0])
    xa[7] = np.nan  # missing residue -> mask=0 at a mid-chain position
    xb[0] = np.nan  # missing residue at a chain start
    return featurize_chains([(seq_a, xa), (seq_b, xb)])
