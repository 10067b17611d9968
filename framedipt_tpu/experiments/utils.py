"""Experiment helpers: diffusion-region bookkeeping and info files.

Role of experiments/utils.py host-side helpers (get_diffused_region_per_chain
:629-688, save_diffusion_info :690-750, Timer :872). The reverse-SDE driver
itself lives in framedipt_tpu/sampling/reverse.py as a lax.scan.
"""
from __future__ import annotations

import pathlib
import time

import numpy as np
import pandas as pd

from framedipt_tpu.data import constants as rc


def get_diffused_region_per_chain(
    diffused_mask: np.ndarray, chain_index: np.ndarray
) -> tuple[list[int], list[int], list[int]]:
    """Per-chain (chain, start, end) triples of contiguous diffused regions;
    indices are chain-local, chains renumbered 0..C-1 in sorted-unique order
    (semantics of experiments/utils.py:629-688, incl. multiple regions per
    chain)."""
    diffused_mask = np.asarray(diffused_mask).astype(bool)
    chain_index = np.asarray(chain_index)
    unique_chains = np.unique(chain_index)
    chain_renumber = {c: i for i, c in enumerate(unique_chains)}

    chains, starts, ends = [], [], []
    for c in np.unique(chain_index[diffused_mask]):
        chain_mask = chain_index == c
        local_diffused = np.where(diffused_mask[chain_mask])[0]
        gaps = np.where(np.diff(local_diffused) > 1)[0]
        region_starts = [0, *(gaps + 1)]
        region_ends = [*gaps, len(local_diffused) - 1]
        for s_i, e_i in zip(region_starts, region_ends):
            chains.append(chain_renumber[c])
            starts.append(int(local_diffused[s_i]))
            ends.append(int(local_diffused[e_i]))
    return chains, starts, ends


def save_diffusion_info(
    output_dir: pathlib.Path,
    pdb_name: str,
    seq: str,
    diffused_mask: np.ndarray,
    chain_index: np.ndarray,
) -> pathlib.Path:
    """Write diffusion_info.csv (tab-separated single row; the file contract
    consumed by evaluation, experiments/utils.py:690-750)."""
    if len(diffused_mask) != len(chain_index):
        raise ValueError(
            f"diffused_mask vs chain_index length mismatch: "
            f"{len(diffused_mask)} != {len(chain_index)}"
        )
    standard = np.asarray([c != "X" for c in seq])
    diffused_mask = np.asarray(diffused_mask)[standard]
    chain_index = np.asarray(chain_index)[standard]

    chains, starts, ends = get_diffused_region_per_chain(diffused_mask, chain_index)
    info = {
        "pdb_name": pdb_name,
        "seq": seq,
        "chain": ",".join(chr(ord("A") + c) for c in chains),
        "start": ",".join(str(s) for s in starts),
        "end": ",".join(str(e) for e in ends),
    }
    csv_path = pathlib.Path(output_dir) / "diffusion_info.csv"
    pd.DataFrame([info]).to_csv(csv_path, sep="\t", index=False)
    return csv_path


def aatype_to_seq(aatype: np.ndarray) -> str:
    return rc.aatype_to_sequence(aatype)


class Timer:
    """Context-manager wall-clock timer (ref experiments/utils.py:872-903)."""

    def __init__(self, label: str = "") -> None:
        self.label = label
        self.elapsed = 0.0

    def __enter__(self):
        self._start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self._start
        return False


def setup_compilation_cache(cfg, logger=None) -> None:
    """Point JAX's persistent compilation cache at a user-writable dir.

    The first TPU compile of the full 100-step sampler program is ~20-40 s;
    with the on-disk cache every later CLI invocation (common for the
    5-sample x strategies x loops eval protocols, and for sweeps) loads the
    executable instead. The reference has no equivalent concept — torch
    eager has no AOT compile step to amortize. Failure to create or use the
    directory is non-fatal: compilation falls back to in-memory only.
    """
    path = getattr(cfg.experiment, "compilation_cache_dir", None)
    if not path:
        return
    import jax

    try:
        cache = pathlib.Path(path).expanduser()
        cache.mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(cache))
        if logger is not None:
            logger.info(f"XLA compilation cache: {cache}")
    except OSError as exc:  # read-only FS etc.
        if logger is not None:
            logger.warning(f"compilation cache disabled: {exc}")


def resolve_pallas_flags(cfg, logger=None) -> None:
    """Resolve auto (None) Pallas-kernel flags in cfg.model.ipa, in place.

    Enabled iff the jitted sampler will actually execute on a TPU. NOTE:
    ``jax.default_backend()`` is the wrong probe — it reports the highest
    priority *registered* backend, which stays "tpu" whenever the TPU
    plugin is present even if ``jax_default_device`` pins execution to CPU
    (as the test harness does). Instead probe where an uncommitted array
    lands: that is the device jit will compile for.
    """
    import jax.numpy as jnp

    on_tpu = None
    # use_pallas_ipa is NOT auto-enabled: the fused IPA attention kernel is
    # MXU-padding-bound on the narrow bias/down_z projections and loses to
    # XLA (PERF.md round-2 negative results). It stays a flag-gated
    # reference implementation.
    for flag in ("use_pallas_kernel", "use_pallas_embedder"):
        if getattr(cfg.model.ipa, flag) is None:
            if on_tpu is None:
                on_tpu = next(iter(jnp.zeros(()).devices())).platform == "tpu"
            setattr(cfg.model.ipa, flag, on_tpu)
            if on_tpu and logger is not None:
                logger.info(f"fused Pallas kernel enabled ({flag})")
