"""In-training evaluation sampling.

The reference's config contract reserves a periodic-eval subsystem the
public repo never ships a driver for: ``experiment.eval_freq`` /
``eval_dir`` / ``eval_batch_size`` and ``data.samples_per_eval_length`` /
``num_eval_lengths`` (/root/reference/config/base.yaml:25-26,90,110-112,143)
— the FrameDiff lineage samples unconditional backbones with the current
weights every ``eval_freq`` steps, writes them under ``eval_dir``, and logs
structural-plausibility metrics. This module reconstructs that behavior
TPU-first: each eval length is padded to its static bucket so the jitted
reverse sampler compiles once per bucket (not once per length), and the
``samples_per_eval_length`` samples run as ONE batched ``lax.scan``.
"""
from __future__ import annotations

import pathlib
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from framedipt_tpu.analysis import dssp as dssp_lib
from framedipt_tpu.analysis import metrics as an_metrics
from framedipt_tpu.analysis.utils import write_prot_to_pdb
from framedipt_tpu.data.features import length_bucket
from framedipt_tpu.diffusion.se3_diffuser import SE3Diffuser
from framedipt_tpu.sampling import build_inference_fn
from framedipt_tpu.tools.config import Config
from framedipt_tpu.tools.log import get_logger

logger = get_logger(__name__)


def eval_lengths(cfg: Config) -> list[int]:
    """``num_eval_lengths`` lengths evenly spaced over the training length
    filter range (ref base.yaml data.filtering.min_len/max_len)."""
    lo = int(cfg.data.filtering.min_len)
    hi = int(min(cfg.data.filtering.max_len, cfg.data.filtering.chain_max_len))
    n = int(cfg.data.num_eval_lengths)
    return sorted({int(x) for x in np.linspace(lo, hi, n).round()})


def build_eval_sampler(
    model: Any, diffuser: SE3Diffuser, cfg: Config
) -> Callable:
    """The unconditional reverse sampler used for periodic eval. One jitted
    program per length bucket; no aux trajectories (cheap).

    ``inpainting`` must match the trained module: an inpainting model's
    embedder consumes the aatype one-hot channels, so the eval features
    carry an all-UNK aatype (below) and the sampler must not drop it."""
    return build_inference_fn(
        model,
        diffuser,
        num_t=cfg.data.num_t,
        min_t=cfg.data.min_t,
        aux_traj=False,
        inpainting=cfg.experiment.inpainting,
    )


def _batched_unconditional_feats(
    diffuser: SE3Diffuser,
    key: jax.Array,
    length: int,
    batch: int,
    inpainting: bool,
) -> dict[str, np.ndarray]:
    """Stationary-init features for ``batch`` samples of ``length`` residues,
    padded to the static length bucket (res_mask zero beyond ``length``)."""
    padded = length_bucket(length)
    rigids = jax.vmap(lambda k: diffuser.sample_ref(k, padded).to_tensor7())(
        jax.random.split(key, batch)
    )
    res_mask = np.zeros((batch, padded), np.float32)
    res_mask[:, :length] = 1.0
    feats = {
        "rigids_t": np.asarray(rigids, np.float32),
        "res_mask": res_mask,
        "fixed_mask": np.zeros((batch, padded), np.float32),
        "seq_idx": np.tile(np.arange(padded, dtype=np.int64)[None], (batch, 1)),
        "sc_ca_t": np.zeros((batch, padded, 3), np.float32),
        "torsion_angles_sin_cos": np.zeros((batch, padded, 7, 2), np.float32),
    }
    if inpainting:
        # Inpainting models embed aatype; everything is diffused here, so
        # every residue is UNK (20) — the same value preprocess_aatype
        # assigns to diffused regions.
        feats["aatype"] = np.full((batch, padded), 20, np.int32)
    return feats


def run_training_eval(
    run: Callable,
    diffuser: SE3Diffuser,
    cfg: Config,
    params: Any,
    step: int,
    key: jax.Array,
    out_dir: str | pathlib.Path | None = None,
) -> dict[str, float]:
    """Sample ``samples_per_eval_length`` backbones at each eval length with
    the current params, write PDBs under ``<out_dir>/step_<step>/`` and return
    aggregate plausibility metrics (CA-CA bond deviation/validity, clash
    fraction, secondary-structure composition, radius of gyration).

    ``out_dir`` defaults to ``cfg.experiment.eval_dir``; the train loop
    passes ``eval_dir/<run_name>`` so concurrent sweep jobs (same
    ``hydra.job.num`` hazard as ckpt_dir) never interleave samples in one
    step directory."""
    out_root = (
        pathlib.Path(out_dir if out_dir is not None else cfg.experiment.eval_dir)
        / f"step_{step}"
    )
    total = int(cfg.data.samples_per_eval_length)
    # Sampling runs in uniform chunks of eval_batch_size (one compiled shape
    # per bucket) so raising samples_per_eval_length cannot OOM the device.
    chunk = max(1, min(total, int(cfg.experiment.eval_batch_size)))
    rows: list[dict[str, float]] = []
    for length in eval_lengths(cfg):
        samples: list[np.ndarray] = []
        while len(samples) < total:
            key, k_init, k_run = jax.random.split(key, 3)
            feats = _batched_unconditional_feats(
                diffuser, k_init, length, chunk,
                inpainting=cfg.experiment.inpainting,
            )
            out = run(params, feats, k_run)
            # prot_traj starts at t=0 after the flip: index 0 = final.
            atom37 = np.asarray(out["prot_traj"][0], np.float32)[:, :length]
            samples.extend(atom37[: total - len(samples)])
        length_dir = out_root / f"length_{length}"
        length_dir.mkdir(parents=True, exist_ok=True)
        for i, pos in enumerate(samples):
            mask37 = np.any(pos != 0.0, axis=-1)
            write_prot_to_pdb(pos, length_dir / f"sample_{i}", no_indexing=False)
            ca = pos[:, 1]
            dev, valid = an_metrics.ca_ca_distance(ca)
            _, clash_frac = an_metrics.ca_ca_clashes(ca)
            ss = dssp_lib.ss_metrics_from_atom37(pos, mask37)
            rows.append(
                {
                    "ca_ca_deviation": dev,
                    "ca_ca_valid_percent": valid,
                    "ca_clash_percent": clash_frac,
                    **ss,
                }
            )
    agg = {
        f"eval_{k}": float(np.mean([r[k] for r in rows])) for k in rows[0]
    }
    logger.info(f"eval step {step}: {agg}")
    return agg
