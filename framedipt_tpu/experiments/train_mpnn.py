"""ProteinMPNN training CLI over preprocessed PDB datasets.

The reference vendors a torch training script
(``ProteinMPNN/training/training.py``: Noam Adam, smoothed loss, backbone
noise, periodic validation + ``.pt`` epoch checkpoints) fed by its own
PDB-cluster loader. This CLI reproduces that contract on TPU, fed by the
SAME preprocessed dataset the diffusion trainer uses
(``framedipt_tpu/data/pipeline.py`` metadata.csv + pickles):

- structures are rebuilt into MPNN chain features (N/Ca/C/O from atom37,
  100-gap residue_idx, 1-based chain encodings) and padded into static
  power-of-two length buckets — one compiled program per bucket instead
  of the reference's dynamic StructureLoader batching;
- every step is ONE jitted XLA program (noise draw + decoding order +
  forward + smoothed loss + Noam Adam update, train/mpnn_train.py);
- validation (noise-free NLL + recovery, training.py:174-188) runs every
  ``--eval_freq`` steps on a held-out split;
- checkpoints save as ``.npz`` in the reference state-dict naming
  (``mpnn_state_dict_from_params``), so a trained model loads directly
  into the in-process designer/scorer and the serving path
  (``tools/mpnn_design.load_mpnn_params``).

Usage:
    python -m framedipt_tpu.experiments.train_mpnn \
        --csv_path=processed/metadata.csv --output_dir=./mpnn_run \
        --num_steps=1000 [--batch_size=8] [--max_length=512] [--ca_only]
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import pathlib
import pickle
import time

import numpy as np

import jax

from framedipt_tpu.data import constants as rc
from framedipt_tpu.model import mpnn
from framedipt_tpu.tools.log import get_logger
from framedipt_tpu.train import mpnn_train

logger = get_logger()

_BB37 = [rc.atom_order[a] for a in ("N", "CA", "C", "O")]


def structure_to_mpnn_features(raw: dict, ca_only: bool = False) -> dict:
    """Processed-pipeline pickle -> MPNN featurize_chains output (B=1).

    Missing residues (bb_mask 0) become non-finite coords so
    featurize_chains masks them, matching the reference loader's NaN
    convention (training/utils.py loader_pdb)."""
    chains = []
    for cid in np.unique(raw["chain_index"]):
        m = raw["chain_index"] == cid
        seq = rc.aatype_to_sequence(raw["aatype"][m])
        xyz = raw["atom_positions"][m][:, _BB37].astype(np.float64)
        xyz[raw["bb_mask"][m] < 0.5] = np.nan
        chains.append((seq, xyz))
    feats = mpnn.featurize_chains(chains)
    if ca_only:
        feats["X"] = feats["X"][:, :, 1]  # Ca track only
    return feats


def _pad_to(feats: dict, length: int) -> dict:
    out = {}
    for k, v in feats.items():
        pad = length - v.shape[1]
        widths = [(0, 0), (0, pad)] + [(0, 0)] * (v.ndim - 2)
        out[k] = np.pad(v, widths)
    return out


class MPNNDataset:
    """metadata.csv + pickles -> bucketed static-shape MPNN batches."""

    def __init__(self, csv_path: str, max_length: int, min_length: int,
                 ca_only: bool, holdout_frac: float, seed: int) -> None:
        import pandas as pd

        meta = pd.read_csv(csv_path)
        meta = meta[meta.modeled_seq_len >= min_length]
        self.paths = list(meta["processed_path"])
        self.max_length = max_length
        self.ca_only = ca_only
        rng = np.random.default_rng(seed)
        order = rng.permutation(len(self.paths))
        n_hold = max(1, int(holdout_frac * len(order))) if len(order) > 1 else 0
        self.valid_idx = list(order[:n_hold])
        self.train_idx = list(order[n_hold:]) or list(order)
        self.rng = rng
        self._cache: dict[int, dict] = {}
        logger.info(
            f"MPNN dataset: {len(self.train_idx)} train / "
            f"{len(self.valid_idx)} valid structures"
        )

    def _features(self, idx: int) -> dict:
        if idx not in self._cache:
            with open(self.paths[idx], "rb") as f:
                raw = pickle.load(f)
            feats = structure_to_mpnn_features(raw, self.ca_only)
            if feats["X"].shape[1] > self.max_length:
                # Random contiguous crop (the reference truncates at
                # max_protein_length; a crop keeps more of the data).
                start = int(
                    self.rng.integers(0, feats["X"].shape[1] - self.max_length + 1)
                )
                feats = {
                    k: v[:, start : start + self.max_length]
                    for k, v in feats.items()
                }
            self._cache[idx] = feats
        return self._cache[idx]

    @staticmethod
    def _bucket(length: int) -> int:
        b = 64
        while b < length:
            b *= 2
        return b

    def batches(self, idxs: list[int], batch_size: int, shuffle: bool = True):
        """Yield same-bucket stacked batches; partial groups pad rows with
        zero-mask copies so shapes stay static."""
        order = list(idxs)
        if shuffle:
            self.rng.shuffle(order)
        groups: dict[int, list[int]] = {}
        for i in order:
            b = self._bucket(self._features(i)["X"].shape[1])
            groups.setdefault(b, []).append(i)
            if len(groups[b]) == batch_size:
                yield self._stack(groups.pop(b), b)
        for b, group in groups.items():
            yield self._stack(group, b, batch_size)

    def _stack(self, group: list[int], bucket: int,
               batch_size: int | None = None) -> dict:
        rows = [_pad_to(self._features(i), bucket) for i in group]
        batch = {
            k: np.concatenate([r[k] for r in rows], axis=0)
            for k in rows[0]
        }
        if batch_size and len(group) < batch_size:
            pad = batch_size - len(group)
            for k, v in batch.items():
                fill = np.zeros((pad,) + v.shape[1:], v.dtype)
                batch[k] = np.concatenate([v, fill], axis=0)
        return batch


def save_npz_checkpoint(path: pathlib.Path, params: dict,
                        cfg: mpnn.MPNNConfig) -> None:
    sd = mpnn.mpnn_state_dict_from_params(params)
    np.savez(path, num_edges=np.int64(cfg.k_neighbors), **sd)


def train(args: argparse.Namespace) -> dict:
    out = pathlib.Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    cfg = mpnn.MPNNConfig(
        hidden_dim=args.hidden_dim,
        num_encoder_layers=args.num_layers,
        num_decoder_layers=args.num_layers,
        k_neighbors=args.k_neighbors,
        ca_only=args.ca_only,
        augment_eps=args.backbone_noise,
        dropout=args.dropout,
    )
    data = MPNNDataset(
        args.csv_path, args.max_length, args.min_length, args.ca_only,
        args.holdout_frac, args.seed,
    )
    optimizer = mpnn_train.make_mpnn_optimizer(
        cfg, gradient_norm=args.gradient_norm
    )
    state = mpnn_train.init_train_state(
        jax.random.PRNGKey(args.seed), cfg, optimizer
    )
    if args.previous_checkpoint:
        # Warm start (training.py --previous_checkpoint): reuse the
        # designer's loader so .npz and .pt both work; fresh optimizer
        # state, matching the reference's rebuilt NoamOpt.
        from framedipt_tpu.tools.mpnn_design import load_mpnn_params

        params, _ = load_mpnn_params(args.previous_checkpoint)
        state = mpnn_train.MPNNTrainState(
            params=params, opt_state=optimizer.init(params), step=state.step
        )
        logger.info(f"warm-started from {args.previous_checkpoint}")
    step_fn = mpnn_train.make_mpnn_train_step(cfg, optimizer)
    eval_fn = mpnn_train.make_mpnn_eval_step(cfg)
    key = jax.random.PRNGKey(args.seed + 1)

    metrics_path = out / "metrics.jsonl"
    step = 0
    t0 = time.time()
    last = {}
    with open(metrics_path, "a") as mf:
        while step < args.num_steps:
            for batch in data.batches(data.train_idx, args.batch_size):
                jb = {k: jax.numpy.asarray(v) for k, v in batch.items()}
                state, metrics = step_fn(
                    state, jb, jax.random.fold_in(key, step)
                )
                step += 1
                if step % args.log_freq == 0 or step == args.num_steps:
                    last = {k: float(v) for k, v in metrics.items()}
                    row = {"step": step, "sec": round(time.time() - t0, 1), **last}
                    mf.write(json.dumps(row) + "\n")
                    mf.flush()
                    logger.info(
                        f"step {step}: loss {last['loss']:.4f} "
                        f"nll {last['nll']:.3f} acc {last['accuracy']:.3f}"
                    )
                if args.eval_freq and step % args.eval_freq == 0 and data.valid_idx:
                    ev = _evaluate(data, eval_fn, state.params, args, key)
                    mf.write(json.dumps({"step": step, **ev}) + "\n")
                    mf.flush()
                    logger.info(
                        f"eval @ {step}: nll {ev['eval_nll']:.3f} "
                        f"recovery {ev['eval_accuracy']:.3f}"
                    )
                if step % args.ckpt_freq == 0 or step == args.num_steps:
                    save_npz_checkpoint(out / f"step_{step}.npz", state.params, cfg)
                if step >= args.num_steps:
                    break
    save_npz_checkpoint(out / "last.npz", state.params, cfg)
    logger.info(f"done: {step} steps, checkpoints under {out}")
    return last


def _evaluate(data, eval_fn, params, args, key) -> dict:
    nlls, accs = [], []
    for batch in data.batches(data.valid_idx, args.batch_size, shuffle=False):
        jb = {k: jax.numpy.asarray(v) for k, v in batch.items()}
        m = eval_fn(params, jb, key)
        nlls.append(float(m["nll"]))
        accs.append(float(m["accuracy"]))
    return {
        "eval_nll": float(np.mean(nlls)),
        "eval_accuracy": float(np.mean(accs)),
    }


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--csv_path", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--num_steps", type=int, default=1000)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--max_length", type=int, default=512)
    p.add_argument("--min_length", type=int, default=10)
    p.add_argument("--hidden_dim", type=int, default=128)
    p.add_argument("--num_layers", type=int, default=3)
    p.add_argument("--k_neighbors", type=int, default=48)
    # training.py:231 default backbone noise.
    p.add_argument("--backbone_noise", type=float, default=0.2)
    # training.py:236 default dropout; 0 disables (eval-mode layers).
    p.add_argument("--dropout", type=float, default=0.1)
    # training.py:239 --gradient_norm: clip norm, negative = off.
    p.add_argument("--gradient_norm", type=float, default=-1.0)
    # training.py:229 --previous_checkpoint: warm-start weights (.npz here).
    p.add_argument("--previous_checkpoint", type=str, default="")
    p.add_argument("--ca_only", action="store_true")
    p.add_argument("--holdout_frac", type=float, default=0.1)
    p.add_argument("--log_freq", type=int, default=10)
    p.add_argument("--eval_freq", type=int, default=100)
    p.add_argument("--ckpt_freq", type=int, default=500)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    train(args)


if __name__ == "__main__":
    main()
