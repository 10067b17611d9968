"""Shared synthetic structure for MPNN parity fixtures and tests.

Deterministic numpy only — imported both by scripts/record_mpnn_fixture.py
(under torch) and by the offline parity test (under JAX).
"""
from __future__ import annotations

import numpy as np

from framedipt_tpu.model.mpnn import featurize_chains


def _backbone(rng: np.random.Generator, length: int) -> np.ndarray:
    """Plausible N/Ca/C/O coords [L,4,3]: a jittered 3.8-A Ca walk with
    the other atoms offset ~1.2 A from Ca."""
    steps = rng.normal(0.0, 0.6, (length, 3)) + np.array([3.0, 1.5, 0.8])
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
