"""Inference orchestration + CLI.

Role of experiments/inference.py (Inference class :41-742): builds the
diffuser/model from config + checkpoint (checkpoint model/diffuser config
takes precedence, :126-159), constructs the sampler, and runs conditional
(inpainting) or unconditional (de novo) sampling with the reference's
filesystem contract: per-structure ``{pdb}_length_{L}/`` directories with a
ground-truth PDB whose b-factors mark the diffusion region (=100),
``diffusion_info.csv``, and per-sample ``sample_{i}/`` directories with
``sample_{i}_1.pdb`` plus optional bb/x0 trajectory PDBs.

Usage:
    python -m framedipt_tpu.experiments.inference \
        inference.weights_path=weights/inpainting.pth \
        inference.output_dir=./out data.csv_path=... [key=value ...]
"""
from __future__ import annotations

import os
import pathlib
import sys
from concurrent.futures import ThreadPoolExecutor
from datetime import datetime

import numpy as np

import jax
import jax.numpy as jnp

from framedipt_tpu.analysis import utils as analysis_utils
from framedipt_tpu.data import constants as rc
from framedipt_tpu.diffusion import SE3Diffuser
from framedipt_tpu.experiments import utils as exp_utils
from framedipt_tpu.experiments.samplers import (
    ConditionalSampler,
    TCRSampler,
    UnconditionalSampler,
)
from framedipt_tpu.geometry import frames
from framedipt_tpu.geometry.rigid import Rigid
from framedipt_tpu.model import ScoreNetwork
from framedipt_tpu.model.import_torch import convert_state_dict, load_torch_checkpoint
from framedipt_tpu.sampling import build_inference_fn
from framedipt_tpu.sampling.confidence import logp_confidence_score
from dataclasses import asdict as dataclasses_asdict

from framedipt_tpu.tools.config import Config, load_config, merge_checkpoint_config, save_config
from framedipt_tpu.tools.log import get_logger

logger = get_logger()


class Inference:
    def __init__(
        self,
        cfg: Config,
        cif_dir: str | pathlib.Path | None = None,
        params=None,
    ) -> None:
        self.raw_cfg = cfg
        self._params = params
        self._load_checkpoint()
        self.cfg = self._cfg  # post-merge

        out_base = pathlib.Path(self.cfg.inference.output_dir)
        name = self.cfg.inference.name or datetime.now().strftime(
            "%d_%m_%Y_%H_%M_%S"
        )
        # Under the multirun sweeper each job gets its own subdir, the
        # hydra.job.num run-dir separation equivalent (tools/sweep.py;
        # reference /root/reference/experiments/utils.py:55-85).
        job_num = os.environ.get("FRAMEDIPT_JOB_NUM")
        if job_num is not None:
            name = f"{name}_job{job_num}" if name else f"job{job_num}"
        self.output_dir = out_base / name
        self.output_dir.mkdir(parents=True, exist_ok=True)
        save_config(self.cfg, str(self.output_dir / "inference_conf.yaml"))

        self.inpainting = self.cfg.inference.inpainting
        # Auto mode: fused Pallas kernels when the sampler will actually run
        # on a TPU (sampling is forward-only); XLA formulation on CPU/GPU.
        exp_utils.resolve_pallas_flags(self.cfg, logger)
        exp_utils.setup_compilation_cache(self.cfg, logger)
        self.model = ScoreNetwork(
            self.cfg.model, self.diffuser, inpainting=self.inpainting
        )
        if self._params is None:
            self._params = self._init_or_import_params()
        self.cif_dir = pathlib.Path(cif_dir) if cif_dir else None
        self.sampler = self._create_sampler()
        self._run_cache: dict[tuple, object] = {}
        # Single background writer: trajectory PDB serialization is the
        # host-side hot path (PERF.md), so the conditional loops queue it
        # here and the next case's device scan overlaps the disk work.
        # One worker keeps per-directory write ordering; futures drain
        # (re-raising errors) before each loop returns.
        self._write_pool: ThreadPoolExecutor | None = None
        self._write_futures: list = []

    # Max queued writes: each future pins that sample's trajectory arrays
    # (~100 MB at num_t=500, N~500), so an unbounded queue on a slow disk
    # would grow without limit — and defer a disk-full error to the very
    # end of the run. Blocking at 4 keeps compute/IO overlap (the scan for
    # the next case still runs while <=4 writes drain) with bounded memory
    # and error latency.
    _MAX_PENDING_WRITES = 4

    def _submit_write(self, fn, *args, **kwargs) -> None:
        if self._write_pool is None:
            self._write_pool = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="traj-writer"
            )
        while len(self._write_futures) >= self._MAX_PENDING_WRITES:
            self._write_futures.pop(0).result()
        self._write_futures.append(self._write_pool.submit(fn, *args, **kwargs))

    def _drain_writes(self) -> None:
        futures, self._write_futures = self._write_futures, []
        for f in futures:
            f.result()  # surfaces the first write error

    # -- setup ------------------------------------------------------------------

    def _load_checkpoint(self) -> None:
        """Accepts either a reference torch ``.pth`` file or one of this
        framework's orbax checkpoint directories (``.../step_N`` or a ckpt
        root containing them); checkpoint model/diffuser config wins over the
        runtime config, as in the reference (inference.py:126-159)."""
        cfg = self.raw_cfg
        self._ckpt_state_dict = None
        self._orbax_params = None
        weights_path = cfg.inference.weights_path
        path = pathlib.Path(weights_path) if weights_path else None
        if path and path.is_dir():
            from framedipt_tpu.train.checkpoints import (
                latest_checkpoint,
                load_checkpoint,
            )

            ckpt_dir = path if (path / "state").exists() else latest_checkpoint(path)
            if ckpt_dir is None:
                logger.warning(f"no checkpoints under {path}; using random init")
            else:
                state, ckpt_cfg = load_checkpoint(ckpt_dir)
                self._orbax_params = state["params"]
                if ckpt_cfg is not None:
                    cfg = merge_checkpoint_config(
                        cfg,
                        {
                            "model": dataclasses_asdict(ckpt_cfg.model),
                            "diffuser": dataclasses_asdict(ckpt_cfg.diffuser),
                        },
                    )
                    logger.info("merged model/diffuser config from orbax checkpoint")
        elif path and path.exists():
            state_dict, ckpt_conf = load_torch_checkpoint(weights_path)
            self._ckpt_state_dict = state_dict
            if ckpt_conf:
                cfg = merge_checkpoint_config(cfg, ckpt_conf)
                logger.info("merged model/diffuser config from checkpoint")
        elif weights_path:
            logger.warning(f"weights not found at {weights_path}; using random init")
        self._cfg = cfg
        self.diffuser = SE3Diffuser(cfg.diffuser)

    def _init_or_import_params(self):
        if self._orbax_params is not None:
            logger.info("loaded orbax checkpoint weights")
            return jax.tree_util.tree_map(jnp.asarray, self._orbax_params)
        if self._ckpt_state_dict is not None:
            params = convert_state_dict(
                self._ckpt_state_dict,
                num_blocks=self._cfg.model.ipa.num_blocks,
                seq_tfmr_layers=self._cfg.model.ipa.seq_tfmr_num_layers,
            )
            logger.info("imported torch checkpoint weights")
            return jax.tree_util.tree_map(jnp.asarray, params)
        # Random init on a dummy batch (explicitly logged — results are
        # only meaningful with real weights).
        logger.warning("initializing model with RANDOM weights")
        n = 32
        dummy = {
            "res_mask": jnp.ones((1, n)),
            "fixed_mask": jnp.zeros((1, n)),
            "seq_idx": jnp.arange(n)[None],
            "t": jnp.ones((1,)),
            "sc_ca_t": jnp.zeros((1, n, 3)),
            "rigids_t": jnp.concatenate(
                [
                    jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (1, n, 1)),
                    jnp.zeros((1, n, 3)),
                ],
                axis=-1,
            ),
            "torsion_angles_sin_cos": jnp.zeros((1, n, 7, 2)),
            "aatype": jnp.zeros((1, n), jnp.int32),
        }
        # jitted: eager init is per-op dispatched (minutes on a tunneled TPU)
        return jax.jit(self.model.init)(jax.random.PRNGKey(0), dummy)

    def _create_sampler(self):
        cfg = self.cfg
        if not self.inpainting:
            return UnconditionalSampler(cfg, self.diffuser, seed=cfg.inference.seed)
        if self.cif_dir is None:
            # Database-driven flow (ref experiments/sampler.py:184-226):
            # download structures listed in inpainting_samples.data_path
            # into download_dir, filter, cache metadata.csv.
            if (
                cfg.inference.inpainting_samples.tcr
                and cfg.inference.inpainting_samples.download_dir
            ):
                return TCRSampler.from_database(
                    cfg, self.diffuser, seed=cfg.inference.seed
                )
            raise ValueError(
                "conditional sampling requires cif_dir (or "
                "inference.inpainting_samples.download_dir for the "
                "database-driven TCR flow)"
            )
        if cfg.inference.inpainting_samples.tcr:
            csv_path = cfg.data.csv_path or "database/TCR.csv"
            return TCRSampler(
                cfg,
                self.diffuser,
                cif_dir=self.cif_dir,
                csv_path=csv_path,
                seed=cfg.inference.seed,
            )
        cif_paths = sorted(self.cif_dir.glob("*.cif"))
        return ConditionalSampler(
            cfg, self.diffuser, cif_paths, seed=cfg.inference.seed
        )

    def _get_run_fn(self):
        """Build (and cache) the jitted sampler for the current config."""
        key = (
            self.cfg.inference.diffusion.num_t,
            self.cfg.inference.diffusion.min_t,
            self.cfg.inference.diffusion.noise_scale,
            self.inpainting,
        )
        if key not in self._run_cache:
            self._run_cache[key] = build_inference_fn(
                self.model,
                self.diffuser,
                num_t=self.cfg.inference.diffusion.num_t,
                min_t=self.cfg.inference.diffusion.min_t,
                noise_scale=self.cfg.inference.diffusion.noise_scale,
                aux_traj=True,
                inpainting=self.inpainting,
                input_aatype=self.cfg.inference.input_aatype,
            )
        return self._run_cache[key]

    # -- sampling loops ------------------------------------------------------------

    def run_sampling(self) -> None:
        if self.inpainting:
            self.run_conditional_sampling()
        else:
            self.run_unconditional_sampling()

    def run_conditional_sampling(self) -> None:
        try:
            if self.cfg.inference.inpainting_samples.batch_samples:
                self._run_conditional_batched()
            else:
                self._run_conditional_serial()
        finally:
            # All queued trajectory writes must land (and any write error
            # surface) before callers read the output tree (e.g. tcr_eval).
            self._drain_writes()

    def _run_conditional_batched(self) -> None:
        """All S samples of a test case in one batched scan — S model
        forwards per step fuse into one program (the reference runs
        samples serially, experiments/inference.py:318-330)."""
        run = self._get_run_fn()
        samples_per_case = self.cfg.inference.inpainting_samples.samples
        n_examples = len(self.sampler) // samples_per_case
        for ex in range(n_examples):
            items = [
                self.sampler[ex * samples_per_case + s]
                for s in range(samples_per_case)
            ]
            pdb_name = items[0][0]
            batched = {
                k: np.concatenate([it[2][k] for it in items], axis=0)
                for k in items[0][2]
            }
            self._write_case_context(pdb_name, batched)
            length_dir = self._length_dir(pdb_name, batched)
            todo = [
                s
                for s, _ in enumerate(items)
                if not (length_dir / f"sample_{s}" / f"sample_{s}_1.pdb").exists()
            ]
            if not todo:
                continue
            key = jax.random.fold_in(
                jax.random.PRNGKey(self.cfg.inference.seed), ex
            )
            with exp_utils.Timer() as timer:
                out = run(self._params, _to_device(batched), key)
                out = {k: np.asarray(v) for k, v in out.items()}
            logger.info(
                f"{pdb_name}: {samples_per_case} samples x "
                f"{self.cfg.inference.diffusion.num_t} steps in {timer.elapsed:.2f}s"
            )
            res_mask = batched["res_mask"][0].astype(bool)
            fixed_mask = batched["fixed_mask"][0].astype(bool)
            diffused_mask = (~fixed_mask) & res_mask
            aatype = batched["aatype"][0].astype(np.int64)
            for s in todo:
                sample_dir = length_dir / f"sample_{s}"
                sample_dir.mkdir(parents=True, exist_ok=True)
                # Queued: the next case's device scan overlaps these writes.
                self._submit_write(
                    self.save_traj,
                    out["prot_traj"][:, s][:, res_mask],
                    out["rigid_0_traj"][:, s][:, res_mask],
                    diffused_mask[res_mask],
                    output_dir=sample_dir,
                    sample_idx=s,
                    aatype=aatype[res_mask],
                    residue_index=batched["residue_index"][0][res_mask],
                    chain_index=batched["chain_idx"][0][res_mask],
                )
                if self.cfg.inference.confidence_score == "eigenfold":
                    sample_feats = {
                        k: v[s : s + 1] for k, v in batched.items()
                    }
                    score = logp_confidence_score(
                        self.model,
                        self._params,
                        self.diffuser,
                        _to_device(sample_feats),
                        np.asarray(out["final_rigids"][s : s + 1]),
                        (diffused_mask[None]).astype(np.float32),
                        num_t=self.cfg.inference.diffusion.num_t,
                        min_t=self.cfg.inference.diffusion.min_t,
                        key=jax.random.fold_in(key, 1000 + s),
                    )
                    (sample_dir / "confidence_score.txt").write_text(
                        f"{float(score)}\n"
                    )

    def _length_dir(self, pdb_name: str, feats: dict) -> pathlib.Path:
        res_mask = feats["res_mask"][0].astype(bool)
        fixed_mask = feats["fixed_mask"][0].astype(bool)
        num_diffused = int(((~fixed_mask) & res_mask).sum())
        d = self.output_dir / f"{pdb_name}_length_{num_diffused}"
        d.mkdir(parents=True, exist_ok=True)
        return d

    def _write_case_context(self, pdb_name: str, feats: dict) -> None:
        """Ground-truth PDB + diffusion_info.csv for a test case."""
        res_mask = feats["res_mask"][0].astype(bool)
        fixed_mask = feats["fixed_mask"][0].astype(bool)
        diffused_mask = (~fixed_mask) & res_mask
        aatype = feats["aatype"][0].astype(np.int64)
        seq = rc.aatype_to_sequence(aatype[res_mask])
        length_dir = self._length_dir(pdb_name, feats)
        gt_pdb_path = length_dir / f"{pdb_name}_1.pdb"
        if not gt_pdb_path.exists():
            gt_atom37, gt_mask37, _, _ = frames.compute_backbone(
                Rigid.from_tensor7(jnp.asarray(feats["rigids_0"][:1])),
                jnp.asarray(feats["torsion_angles_sin_cos"][:1, :, 2, :]),
                aatype=jnp.asarray(feats["aatype"][:1]),
            )
            gt_prot = np.asarray(gt_atom37 * gt_mask37[..., None])[0]
            b_factors = np.tile((diffused_mask * 100.0)[:, None], (1, 37))
            analysis_utils.write_prot_to_pdb(
                gt_prot[res_mask],
                length_dir / pdb_name,
                aatype=aatype[res_mask],
                b_factors=b_factors[res_mask],
                residue_index=feats["residue_index"][0][res_mask],
                chain_index=feats["chain_idx"][0][res_mask],
            )
        info_path = length_dir / "diffusion_info.csv"
        if not info_path.exists():
            exp_utils.save_diffusion_info(
                length_dir, pdb_name, seq,
                diffused_mask[res_mask], feats["chain_idx"][0][res_mask],
            )

        if self.cfg.inference.inpainting_samples.run_esmfold:
            esmf_path = length_dir / "esmf_pred.pdb"
            if not esmf_path.exists():
                from framedipt_tpu.tools import external

                try:
                    # Fold chains separately, as the reference does for
                    # multimers via ':'-joined sequences. For TCR runs the
                    # first two chains (TCR alpha/beta in np.unique order,
                    # matching ref experiments/inference.py:455-475) are
                    # truncated to their variable domains so long constant
                    # domains don't OOM the folding model.
                    chains = np.unique(feats["chain_idx"][0][res_mask])
                    is_tcr = self.cfg.inference.inpainting_samples.tcr
                    seqs = []
                    for cid, c in enumerate(chains):
                        chain_seq = rc.aatype_to_sequence(
                            aatype[res_mask][feats["chain_idx"][0][res_mask] == c]
                        )
                        if is_tcr and cid < 2:
                            from framedipt_tpu.data import tcr as tcr_lib

                            try:
                                chain_seq = tcr_lib.cut_tcr_sequence(chain_seq)
                            except (ValueError, KeyError) as exc:
                                logger.warning(
                                    f"TCR variable-domain truncation failed "
                                    f"for chain {c}: {exc}; folding full chain"
                                )
                        seqs.append(chain_seq)
                    pdb_str = external.esmfold_predict(":".join(seqs))
                    esmf_path.write_text(pdb_str)
                except external.ToolUnavailable as e:
                    logger.warning(f"ESMFold prediction skipped: {e}")

    def _run_conditional_serial(self) -> None:
        run = self._get_run_fn()
        for item_idx, (pdb_name, sample_i, feats) in enumerate(self.sampler):
            res_mask = feats["res_mask"][0].astype(bool)
            fixed_mask = feats["fixed_mask"][0].astype(bool)
            diffused_mask = (~fixed_mask) & res_mask
            num_diffused = int(diffused_mask.sum())
            aatype = feats["aatype"][0].astype(np.int64)
            seq = rc.aatype_to_sequence(aatype[res_mask])
            residue_index = feats["residue_index"][0]
            chain_index = feats["chain_idx"][0]

            length_dir = self.output_dir / f"{pdb_name}_length_{num_diffused}"
            length_dir.mkdir(parents=True, exist_ok=True)

            gt_pdb_path = length_dir / f"{pdb_name}_1.pdb"
            if not gt_pdb_path.exists():
                gt_atom37, gt_mask37, _, _ = frames.compute_backbone(
                    Rigid.from_tensor7(jnp.asarray(feats["rigids_0"])),
                    jnp.asarray(feats["torsion_angles_sin_cos"][..., 2, :]),
                    aatype=jnp.asarray(feats["aatype"]),
                )
                gt_prot = np.asarray(gt_atom37 * gt_mask37[..., None])[0]
                b_factors = np.tile(
                    (diffused_mask * 100.0)[:, None], (1, 37)
                )
                analysis_utils.write_prot_to_pdb(
                    gt_prot[res_mask],
                    length_dir / pdb_name,
                    aatype=aatype[res_mask],
                    b_factors=b_factors[res_mask],
                    residue_index=residue_index[res_mask],
                    chain_index=chain_index[res_mask],
                )

            info_path = length_dir / "diffusion_info.csv"
            if not info_path.exists():
                exp_utils.save_diffusion_info(
                    length_dir,
                    pdb_name,
                    seq,
                    diffused_mask[res_mask],
                    chain_index[res_mask],
                )

            sample_dir = length_dir / f"sample_{sample_i}"
            sample_pdb = sample_dir / f"sample_{sample_i}_1.pdb"
            if sample_pdb.exists():
                continue
            sample_dir.mkdir(parents=True, exist_ok=True)

            key = jax.random.fold_in(
                jax.random.PRNGKey(self.cfg.inference.seed), item_idx
            )
            with exp_utils.Timer() as timer:
                out = run(self._params, _to_device(feats), key)
                out = {k: np.asarray(v) for k, v in out.items()}
            logger.info(
                f"{pdb_name} sample {sample_i}: "
                f"{self.cfg.inference.diffusion.num_t} steps in {timer.elapsed:.2f}s"
            )

            self._submit_write(
                self.save_traj,
                out["prot_traj"][:, 0][:, res_mask],
                out["rigid_0_traj"][:, 0][:, res_mask],
                diffused_mask[res_mask],
                output_dir=sample_dir,
                sample_idx=sample_i,
                aatype=aatype[res_mask],
                residue_index=residue_index[res_mask],
                chain_index=chain_index[res_mask],
            )

            if self.cfg.inference.confidence_score == "eigenfold":
                conf_path = sample_dir / "confidence_score.txt"
                score = logp_confidence_score(
                    self.model,
                    self._params,
                    self.diffuser,
                    feats,
                    np.asarray(out["final_rigids"]),
                    diffused_mask,
                    num_t=self.cfg.inference.diffusion.num_t,
                    min_t=self.cfg.inference.diffusion.min_t,
                    key=jax.random.fold_in(key, 1),
                )
                conf_path.write_text(f"{float(score)}\n")

    def run_unconditional_sampling(self) -> None:
        run = self._get_run_fn()
        for item_idx, (name, sample_i, feats) in enumerate(self.sampler):
            length = int(feats["res_mask"][0].sum())
            length_dir = self.output_dir / name
            sample_dir = length_dir / f"sample_{sample_i}"
            if sample_dir.exists():
                continue
            sample_dir.mkdir(parents=True, exist_ok=True)
            key = jax.random.fold_in(
                jax.random.PRNGKey(self.cfg.inference.seed), item_idx
            )
            out = run(self._params, _to_device(feats), key)
            out = {k: np.asarray(v) for k, v in out.items()}
            traj_paths = self.save_traj(
                out["prot_traj"][:, 0],
                out["rigid_0_traj"][:, 0],
                np.ones(length),
                output_dir=sample_dir,
                sample_idx=sample_i,
            )
            self.run_self_consistency(sample_dir, traj_paths["sample_path"])
            logger.info(f"done {name} sample {sample_i}: {traj_paths['sample_path']}")

    def run_self_consistency(
        self, sample_dir: pathlib.Path, sample_pdb: pathlib.Path
    ) -> None:
        """De novo self-consistency: ProteinMPNN sequences -> ESMFold refold
        -> scTM/scRMSD vs the generated backbone, written to
        self_consistency/sc_results.csv (experiments/inference.py:625-706).
        Degrades gracefully when the external tools are unavailable."""
        from framedipt_tpu.analysis import metrics as analysis_metrics
        from framedipt_tpu.data.protein import from_pdb_string
        from framedipt_tpu.tools import external

        sc_dir = sample_dir / "self_consistency"
        sc_dir.mkdir(exist_ok=True)
        # In-process TPU-native MPNN is the default (model/mpnn.py, parity
        # tested); the reference's subprocess invocation remains as a
        # fallback for environments that carry a ProteinMPNN checkout but
        # no weights file.
        try:
            from framedipt_tpu.tools import mpnn_design

            seqs_dir = mpnn_design.design_sequences(
                pdb_dir=sample_dir,
                output_dir=sc_dir,
                num_seq_per_target=self.cfg.inference.samples.seq_per_sample,
                weights_path=getattr(
                    self.cfg.inference, "mpnn_weights_path", None
                ),
            )
        except external.ToolUnavailable as e_inproc:
            try:
                seqs_dir = external.run_protein_mpnn(
                    pdb_dir=sample_dir,
                    output_dir=sc_dir,
                    mpnn_repo=getattr(self.cfg.inference, "pmpnn_dir", None),
                    num_seq_per_target=(
                        self.cfg.inference.samples.seq_per_sample
                    ),
                )
            except external.ToolUnavailable as e:
                logger.warning(
                    f"self-consistency skipped: {e_inproc}; fallback: {e}"
                )
                return

        sample_prot = from_pdb_string(pathlib.Path(sample_pdb).read_text())
        sample_ca = sample_prot.atom_positions[:, rc.CA_IDX]
        rows = []
        for fasta in sorted(pathlib.Path(seqs_dir).glob("*.fa")):
            seqs = [
                line.strip()
                for line in fasta.read_text().splitlines()
                if line and not line.startswith(">")
            ]
            for i, seq in enumerate(seqs):
                try:
                    pdb_str = external.esmfold_predict(seq)
                except external.ToolUnavailable as e:
                    logger.warning(f"ESMFold unavailable: {e}")
                    return
                pred_path = sc_dir / f"esmf_sample_{i}.pdb"
                pred_path.write_text(pdb_str)
                pred_prot = from_pdb_string(pdb_str)
                pred_ca = pred_prot.atom_positions[:, rc.CA_IDX]
                if len(pred_ca) != len(sample_ca):
                    continue
                _, tm = analysis_metrics.calc_tm_score(pred_ca, sample_ca)
                rmsd = analysis_metrics.calc_aligned_rmsd(pred_ca, sample_ca)
                rows.append(
                    {"sequence": seq, "sample": str(pred_path),
                     "rmsd": rmsd, "tm_score": tm}
                )
        if rows:
            import pandas as pd

            pd.DataFrame(rows).to_csv(sc_dir / "sc_results.csv", index=False)

    # -- output -----------------------------------------------------------------

    def save_traj(
        self,
        bb_prot_traj: np.ndarray,
        x0_traj: np.ndarray,
        diffuse_mask: np.ndarray,
        output_dir: pathlib.Path,
        sample_idx: int,
        aatype: np.ndarray | None = None,
        residue_index: np.ndarray | None = None,
        chain_index: np.ndarray | None = None,
    ) -> dict[str, pathlib.Path]:
        """Reference save_traj contract (experiments/inference.py:480-556)."""
        diffuse_mask = diffuse_mask.astype(bool)
        b_factors = np.tile((diffuse_mask * 100.0)[:, None], (1, 37))
        common = dict(
            aatype=aatype, residue_index=residue_index, chain_index=chain_index
        )
        sample_path = analysis_utils.write_prot_to_pdb(
            bb_prot_traj[0],
            output_dir / f"sample_{sample_idx}",
            b_factors=b_factors,
            **common,
        )
        traj_path = x0_path = None
        if self.cfg.inference.save_backbone_trajectory:
            traj_path = analysis_utils.write_prot_to_pdb(
                bb_prot_traj,
                output_dir / f"bb_traj_{sample_idx}",
                b_factors=b_factors,
                **common,
            )
        if self.cfg.inference.save_pred_x0_trajectory:
            x0_path = analysis_utils.write_prot_to_pdb(
                x0_traj,
                output_dir / f"x0_traj_{sample_idx}",
                b_factors=b_factors,
                **common,
            )
        return {
            "sample_path": sample_path,
            "traj_path": traj_path,
            "x0_traj_path": x0_path,
        }


def _to_device(feats: dict[str, np.ndarray]) -> dict[str, jnp.ndarray]:
    out = {}
    for k, v in feats.items():
        if k in ("aatype", "seq_idx"):
            out[k] = jnp.asarray(v, jnp.int32)
        elif k in ("chain_idx", "residue_index", "residx_atom14_to_atom37"):
            continue  # host-side bookkeeping only
        elif k in ("rigidgroups_0", "atom37_pos", "atom37_mask", "atom14_pos"):
            continue
        else:
            out[k] = jnp.asarray(v, jnp.float32)
    return out


def main(argv: list[str] | None = None) -> None:
    argv = sys.argv[1:] if argv is None else argv
    yaml_path = None
    overrides = []
    cif_dir = None
    for arg in argv:
        if arg.startswith("--config="):
            yaml_path = arg.split("=", 1)[1]
        elif arg.startswith("--cif_dir="):
            cif_dir = arg.split("=", 1)[1]
        else:
            overrides.append(arg)
    cfg = load_config(yaml_path, overrides)
    with exp_utils.Timer() as t:
        Inference(cfg, cif_dir=cif_dir).run_sampling()
    logger.info(f"inference finished in {t.elapsed:.1f}s")


if __name__ == "__main__":
    main()
