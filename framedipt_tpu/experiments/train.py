"""Training CLI: score-matching over preprocessed PDB datasets.

The reference ships no train.py (SURVEY.md intro); this reconstructs the
FrameDiff-lineage trainer from the reference's config contract
(config/base.yaml:81-147): Adam @1e-4, t ~ U(min_t, 1) per example,
forward-marginal noising, DSM losses (train/losses.py), length batching
under a max_squared_res memory cap, inpainting-mode redaction masks,
checkpoint every ckpt_freq steps with an early checkpoint, and t-stratified
loss reporting.

TPU-native: batches are padded to static buckets, sharded over the mesh
``dp`` axis, and the whole step (noising + model + loss + update) is one
jitted program.

Usage:
    python -m framedipt_tpu.experiments.train data.csv_path=.../metadata.csv \
        experiment.batch_size=32 [key=value ...]
"""
from __future__ import annotations

import collections
import os
import pathlib
import pickle
import sys
import time

import numpy as np

import jax

from framedipt_tpu.data import features as feature_lib
from framedipt_tpu.diffusion import SE3Diffuser
from framedipt_tpu.model import ScoreNetwork
from framedipt_tpu.parallel import make_mesh, shard_batch
from framedipt_tpu.tools.config import Config, load_config, save_config
from framedipt_tpu.tools.log import get_logger
from framedipt_tpu.train.checkpoints import latest_checkpoint, load_checkpoint, save_checkpoint
from framedipt_tpu.train.loop import build_train_step, init_train_state, make_optimizer
from framedipt_tpu.train.losses import t_stratified_metrics

logger = get_logger()

def _feats_nbytes(feats: dict) -> int:
    return sum(
        v.nbytes for v in feats.values() if isinstance(v, np.ndarray)
    )


_BATCH_KEYS = (
    "rigids_0",
    "res_mask",
    "fixed_mask",
    "seq_idx",
    "torsion_angles_sin_cos",
    "aatype",
)


class TrainDataset:
    """In-memory dataset over preprocessed pickles + metadata.csv, with
    per-epoch redaction masks (inpainting) and bucketed length batching."""

    def __init__(self, cfg: Config, rng: np.random.Generator) -> None:
        import pandas as pd

        self.cfg = cfg
        self.rng = rng
        meta = pd.read_csv(cfg.data.csv_path)
        filt = cfg.data.filtering
        meta = meta[meta.modeled_seq_len <= filt.max_len]
        meta = meta[meta.modeled_seq_len >= filt.min_len]
        if filt.subset:
            meta = meta.iloc[: filt.subset]
        self.meta = meta.reset_index(drop=True)
        logger.info(f"dataset: {len(self.meta)} structures after filters")
        # LRU over FEATURIZED (cropped) examples, mirroring the reference's
        # lru_cache(maxsize=50000) on process_csv_row (data/utils.py:744):
        # the rng object is part of that cache key (one Generator instance
        # for the sampler's lifetime, experiments/sampler.py:305-310), so
        # upstream the random chain pick / crop is FROZEN after the first
        # featurization of a structure and repeat epochs hit the cache.
        # Bounded in BYTES, not entries: a chain_max_len=512 example is
        # ~1 MB of arrays, so an entry count is no memory cap — evict LRU
        # past ~4 GiB (a 30k-structure PDB set mostly fits; beyond it the
        # coldest tail re-featurizes, re-rolling its crop, which batches()
        # tolerates by bucketing on actual lengths).
        self._cache: "collections.OrderedDict[int, dict]" = (
            collections.OrderedDict()
        )
        self._cache_bytes = 0
        self._cache_budget = 4 << 30

        # Cluster-balanced sampling (ref config data.cluster_file /
        # num_clusters): examples weighted 1/cluster_size so large sequence
        # families don't dominate an epoch.
        self.sample_weights = None
        if cfg.data.cluster_file:
            clusters = pd.read_csv(
                cfg.data.cluster_file,
                sep=None,
                engine="python",
                names=["pdb_name", "cluster"],
                header=0 if "pdb" in open(cfg.data.cluster_file).readline() else None,
            )
            cluster_of = dict(
                zip(clusters["pdb_name"].astype(str), clusters["cluster"])
            )
            assigned = self.meta["pdb_name"].astype(str).map(cluster_of)
            sizes = assigned.value_counts()
            w = np.asarray(
                [1.0 / sizes.get(c, 1) if pd.notna(c) else 1.0 for c in assigned]
            )
            self.sample_weights = w / w.sum()
            logger.info(
                f"cluster sampling over {assigned.nunique()} clusters"
            )

    def _features(self, idx: int) -> dict:
        # Featurized output is cached per structure: the random chain pick
        # and crop are drawn once and frozen for the run, exactly as in the
        # reference (rng is part of process_csv_row's lru_cache key, so its
        # cache hit returns the same crop every epoch). A cache miss after
        # eviction re-rolls — batches() buckets by each example's ACTUAL
        # length, so a re-rolled length cannot break the static padding.
        if idx in self._cache:
            self._cache.move_to_end(idx)
            return self._cache[idx]
        with open(self.meta.iloc[idx]["processed_path"], "rb") as f:
            raw = pickle.load(f)
        feats = feature_lib.build_model_features(
            raw,
            extract_single_chain=self.cfg.data.single_chain,
            rng=self.rng,
            chain_max_len=self.cfg.data.filtering.chain_max_len,
        )
        self._cache[idx] = feats
        self._cache_bytes += _feats_nbytes(feats)
        while self._cache_bytes > self._cache_budget and len(self._cache) > 1:
            _, evicted = self._cache.popitem(last=False)
            self._cache_bytes -= _feats_nbytes(evicted)
        return feats

    def example(self, idx: int) -> dict:
        feats = dict(self._features(idx))
        if self.cfg.experiment.inpainting:
            mask = feature_lib.create_redacted_regions(
                feats["chain_idx"],
                feats["res_mask"],
                self.rng,
                self.cfg.data.redaction.redact_min_len,
                self.cfg.data.redaction.redact_max_len,
            )
            feats["fixed_mask"] = (1 - mask).astype(np.float32)
        else:
            feats["fixed_mask"] = np.zeros_like(feats["res_mask"])
        return feats

    def batches(self, batch_size: int):
        """Yield stacked batches of same-bucket examples each epoch.

        Examples are featurized FIRST and bucketed by their actual length:
        with single-chain extraction the featurized length is the drawn
        chain's (frozen by the feature cache, but re-rolled if the LRU
        evicts), so a length derived from metadata or from a previous draw
        could mismatch and break the static bucket padding. Bucketing by
        the metadata's modeled_seq_len would instead pad every batch to
        the full complex size.
        """
        if self.sample_weights is not None:
            order = self.rng.choice(
                len(self.meta), size=len(self.meta), replace=True,
                p=self.sample_weights,
            )
        else:
            order = self.rng.permutation(len(self.meta))

        def _cap(bucket_len: int) -> int:
            # Cap batch by the reference's quadratic memory rule.
            return max(
                1,
                min(
                    batch_size,
                    self.cfg.experiment.max_squared_res // bucket_len**2,
                ),
            )

        def _stack(group: list[dict], bucket_len: int) -> dict:
            feats = [feature_lib.pad_feats(f, bucket_len) for f in group]
            return {k: np.stack([f[k] for f in feats]) for k in _BATCH_KEYS}

        pending: dict[int, list[dict]] = {}
        for idx in order:
            feats = self.example(int(idx))
            b = feature_lib.length_bucket(int(feats["res_mask"].shape[0]))
            pending.setdefault(b, []).append(feats)
            if len(pending[b]) >= _cap(b):
                yield _stack(pending[b][: _cap(b)], b)
                pending[b] = pending[b][_cap(b) :]
        for b, group in pending.items():
            for i in range(0, len(group), _cap(b)):
                yield _stack(group[i : i + _cap(b)], b)


def train(cfg: Config) -> None:
    seed = cfg.experiment.seed
    rng = np.random.default_rng(seed)
    from framedipt_tpu.experiments.utils import setup_compilation_cache

    setup_compilation_cache(cfg, logger)

    # Sweep-job run-dir separation (hydra.job.num equivalent, tools/sweep.py):
    # without it concurrent sweep jobs would share one ckpt_dir (and
    # eval_dir) and even cross-resume each other's checkpoints via the
    # auto-resume below.
    run_name = cfg.experiment.name
    job_num = os.environ.get("FRAMEDIPT_JOB_NUM")
    if job_num is not None:
        run_name = f"{run_name}_job{job_num}" if run_name else f"job{job_num}"
    ckpt_dir = pathlib.Path(cfg.experiment.ckpt_dir) / run_name
    resume = cfg.experiment.resume_ckpt_dir or (
        str(ckpt_dir) if latest_checkpoint(ckpt_dir) else None
    )

    if cfg.experiment.use_ckpt_conf and resume:
        # Warm-start config precedence (ref base.yaml:116 use_ckpt_conf +
        # inference.py:131-136 semantics): the checkpoint's model/diffuser
        # sections override the runtime config so the restored weights
        # always meet the architecture they were trained with — for BOTH
        # resume paths (explicit resume_ckpt_dir and auto-resume from the
        # run's own ckpt_dir). Experiment/data stay runtime-controlled.
        ckpt = latest_checkpoint(resume)
        if ckpt is not None and (ckpt / "config.yaml").exists():
            saved_cfg = load_config(str(ckpt / "config.yaml"))
            cfg.model = saved_cfg.model
            cfg.diffuser = saved_cfg.diffuser
            logger.info(f"use_ckpt_conf: model/diffuser config from {ckpt}")
    diffuser = SE3Diffuser(cfg.diffuser)
    import jax.numpy as jnp

    # NOT jax.default_backend(): in this environment the axon TPU plugin
    # registers itself regardless of JAX_PLATFORMS, so default_backend()
    # says "tpu" even when jax_default_device pins execution to CPU. The
    # honest question is "where will jit actually place arrays?" — probe
    # a real allocation's device platform.
    on_tpu = next(iter(jnp.zeros(()).devices())).platform == "tpu"
    if cfg.model.ipa.use_pallas_kernel is None:
        # Auto mode: train through the fused pair-MLP kernel on TPU
        # backends. Measured on the v5e (round 4): with the fused Pallas
        # backward (pallas_bwd_impl default) the whole train step runs
        # 181.5 vs 147.2 examples/s (+23%) over the XLA formulation at
        # B=4 N=256 bf16. CPU runs keep the XLA formulation.
        cfg.model.ipa.use_pallas_kernel = on_tpu
        if on_tpu:
            logger.info("fused Pallas pair-MLP kernel enabled for training")
    if cfg.model.ipa.use_pallas_embedder is None:
        # Auto mode: with the fused embedder backward
        # (pallas_emb_bwd_impl default "pallas") the embedder kernel is a
        # measured training win on the v5e — 185.5 vs 179.4 examples/s
        # (+3.4%, interleaved A/B at B=4 N=256 bf16). The round-3 remat
        # twin backward had made it a loss; see PERF.md.
        cfg.model.ipa.use_pallas_embedder = bool(
            on_tpu and cfg.model.ipa.use_pallas_kernel
        )
        if cfg.model.ipa.use_pallas_embedder:
            logger.info("fused Pallas embedder kernel enabled for training")
    if cfg.model.ipa.use_pallas_ipa is None:
        # Forward-only kernel: training always uses the XLA formulation.
        cfg.model.ipa.use_pallas_ipa = False
    model = ScoreNetwork(cfg.model, diffuser, inpainting=cfg.experiment.inpainting)
    optimizer = make_optimizer(cfg.experiment.learning_rate)
    dataset = TrainDataset(cfg, rng)

    mesh = make_mesh(dp_size=cfg.experiment.dp_size, fsdp_size=cfg.experiment.fsdp_size)
    logger.info(f"mesh: {dict(mesh.shape)} over {len(mesh.devices.flat)} devices")

    example = next(iter(dataset.batches(2)))
    state = init_train_state(model, optimizer, example, jax.random.PRNGKey(seed))

    if resume and latest_checkpoint(resume):
        # Restore against a fully-structured target (incl. the epoch field)
        # so optax state keeps its pytree structure.
        target = {
            "params": state.params,
            "opt_state": state.opt_state,
            "step": state.step,
            "epoch": 0,
        }
        restored, _ = load_checkpoint(latest_checkpoint(resume), target=target)
        state = state._replace(
            step=restored["step"],
            params=restored["params"],
            opt_state=restored["opt_state"],
        )
        logger.info(f"resumed from step {int(state.step)}")

    num_params = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
    cfg.experiment.num_parameters = int(num_params)
    logger.info(f"model parameters: {num_params:,}")
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    save_config(cfg, str(ckpt_dir / "train_conf.yaml"))

    train_step = jax.jit(build_train_step(model, diffuser, cfg, optimizer))
    key = jax.random.PRNGKey(seed + 1)

    from framedipt_tpu.tools.metrics_logger import MetricsLogger

    mlogger = MetricsLogger(ckpt_dir, use_neptune=False)
    importance = None
    if cfg.experiment.use_importance_sampling:
        from framedipt_tpu.train.importance import TimestepImportanceSampler

        importance = TimestepImportanceSampler(
            num_bins=cfg.experiment.num_bins,
            history_per_term=cfg.experiment.history_per_term,
            min_t=cfg.data.min_t,
        )
    from framedipt_tpu.train.prefetch import prefetch

    step = int(state.step)
    eval_run = None  # built lazily at the first eval_freq boundary
    log_t0 = time.time()
    with mesh:
        for epoch in range(cfg.experiment.num_epoch):
            # Featurization/padding for upcoming batches overlaps device
            # compute (background thread + bounded queue).
            for batch in prefetch(
                dataset.batches(cfg.experiment.batch_size),
                size=cfg.experiment.prefetch_buffer,
            ):
                # dp sharding requires batch divisible by dp; pad by repeat.
                dp = mesh.shape["dp"]
                bsz = batch["res_mask"].shape[0]
                if bsz % dp:
                    # Cycle indices: v[:reps] under-pads when reps > bsz
                    # (e.g. a 1-element max_squared_res-capped batch on a
                    # dp=4 mesh) and the NamedSharding put then raises.
                    pad_idx = np.resize(np.arange(bsz), dp - bsz % dp)
                    batch = {
                        k: np.concatenate([v, v[pad_idx]])
                        for k, v in batch.items()
                    }
                if importance is not None:
                    t_np, w_np = importance.sample(rng, batch["res_mask"].shape[0])
                    batch = {**batch, "t": t_np, "loss_weight": w_np}
                sharded = shard_batch(mesh, batch)
                key, sub = jax.random.split(key)
                state, metrics = train_step(state, sharded, sub)
                if importance is not None:
                    importance.update(
                        np.asarray(metrics["t"]),
                        np.asarray(metrics["raw_per_example_loss"]),
                    )
                step += 1

                if step % cfg.experiment.log_freq == 0 or step == 1:
                    loss = float(metrics["loss"])
                    rate = cfg.experiment.log_freq / max(time.time() - log_t0, 1e-9)
                    log_t0 = time.time()
                    strat = t_stratified_metrics(
                        np.asarray(metrics["per_example_loss"]),
                        np.asarray(metrics["t"]),
                    )
                    logger.info(
                        f"epoch {epoch} step {step}: loss {loss:.4f} "
                        f"({rate:.2f} steps/s) {strat}"
                    )
                    mlogger.log(
                        step,
                        {
                            "loss": loss,
                            "steps_per_sec": rate,
                            "grad_norm": metrics["grad_norm"],
                            "trans_loss": metrics["trans_loss"],
                            "rot_loss": metrics["rot_loss"],
                            **strat,
                        },
                    )
                early = (
                    cfg.experiment.early_ckpt
                    and step == cfg.experiment.early_ckpt_step
                )
                if step % cfg.experiment.ckpt_freq == 0 or early:
                    save_checkpoint(
                        ckpt_dir, step, state.params, state.opt_state, cfg,
                        epoch=epoch,
                    )
                if step % cfg.experiment.eval_freq == 0:
                    from framedipt_tpu.train.eval_sampling import (
                        build_eval_sampler,
                        run_training_eval,
                    )

                    if eval_run is None:
                        eval_run = build_eval_sampler(model, diffuser, cfg)
                    key, k_eval = jax.random.split(key)
                    mlogger.log(
                        step,
                        run_training_eval(
                            eval_run, diffuser, cfg, state.params, step,
                            k_eval,
                            out_dir=pathlib.Path(cfg.experiment.eval_dir)
                            / run_name,
                        ),
                    )
    save_checkpoint(ckpt_dir, step, state.params, state.opt_state, cfg)


def main(argv: list[str] | None = None) -> None:
    argv = sys.argv[1:] if argv is None else argv
    yaml_path = None
    overrides = []
    for arg in argv:
        if arg.startswith("--config="):
            yaml_path = arg.split("=", 1)[1]
        else:
            overrides.append(arg)
    cfg = load_config(yaml_path, overrides)
    train(cfg)


if __name__ == "__main__":
    main()
