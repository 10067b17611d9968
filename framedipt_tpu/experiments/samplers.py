"""Dataset samplers: iterators yielding fully-formed feature dicts.

Role of experiments/sampler.py (UnconditionalSampler :22, ConditionalSampler
:138, TCRSampler :357): each item is (pdb_name, sample_idx, feats) with
batch dim 1, features padded to a static bucket length. Unlike the
reference's torch Datasets, these are plain host-side iterators producing
numpy; placement on device happens in the inference driver.
"""
from __future__ import annotations

import dataclasses
import pathlib
from typing import Iterator

import numpy as np
import pandas as pd

import jax

from framedipt_tpu.data import features as feature_lib
from framedipt_tpu.data import tcr as tcr_lib
from framedipt_tpu.data.mmcif import parse_mmcif
from framedipt_tpu.diffusion import SE3Diffuser
from framedipt_tpu.geometry.rigid import Rigid
from framedipt_tpu.tools.config import Config
from framedipt_tpu.tools.log import get_logger

import jax.numpy as jnp

logger = get_logger()

SampleItem = tuple[str, int, dict[str, np.ndarray]]


def init_database_metadata(
    cfg: Config,
    pdb_ids: list[str],
    chains_per_structure: list[list[str] | None],
    cif_dir: pathlib.Path | None = None,
) -> tuple[list[pathlib.Path], list[list[str] | None]]:
    """Database-driven sampler init (ref experiments/sampler.py:184-226):
    download the listed structures into ``download_dir/cifs`` (best-effort —
    already-present files are kept, a zero-egress environment just uses
    what exists), build/reuse ``download_dir/processed/metadata.csv`` by
    running the inference filters (resolution / total + per-chain length /
    chain count), and return the surviving (cif_path, chains) pairs."""
    from framedipt_tpu.data import pipeline as pipeline_lib
    from framedipt_tpu.tools import errors

    isc = cfg.inference.inpainting_samples
    download_dir = pathlib.Path(isc.download_dir)
    cifs_dir = pathlib.Path(cif_dir) if cif_dir else download_dir / "cifs"
    processed_dir = download_dir / "processed"
    metadata_path = processed_dir / "metadata.csv"

    missing = [
        pid
        for pid in pdb_ids
        if not (
            cifs_dir
            / (f"{pid.lower()}-assembly1.cif" if isc.first_assembly else f"{pid.lower()}.cif")
        ).exists()
    ]
    if missing:
        try:
            from framedipt_tpu.data.download import download_cifs

            download_cifs(
                missing,
                cifs_dir,
                first_assembly=isc.first_assembly,
                max_workers=isc.num_workers_download,
            )
        except Exception as e:  # noqa: BLE001 - offline is a supported mode
            logger.warning(f"structure download unavailable: {e}")

    suffix = "-assembly1.cif" if isc.first_assembly else ".cif"
    candidates: list[tuple[str, pathlib.Path, list[str] | None]] = []
    for pid, chains in zip(pdb_ids, chains_per_structure):
        path = cifs_dir / f"{pid.lower()}{suffix}"
        if path.exists():
            candidates.append((pid.lower(), path, chains))
        else:
            logger.warning(f"missing structure file {path}; skipping")

    if metadata_path.exists() and not isc.overwrite:
        try:
            metadata = pd.read_csv(metadata_path)
            kept = set(metadata["pdb_name"].astype(str))
        except pd.errors.EmptyDataError:
            kept = set()
        logger.info(f"reusing cached metadata ({len(kept)} entries)")
    else:
        rows = []
        for pid, path, chains in candidates:
            opts = pipeline_lib.ProcessOptions(
                output_dir=processed_dir,
                filtering=dataclasses.replace(
                    cfg.data.filtering,
                    max_len=isc.max_len or 10**9,
                    min_len=isc.min_len or 0,
                ),
                max_resolution=isc.max_resolution,
                first_assembly=isc.first_assembly,
                chains=list(chains) if chains else None,
                chain_min_len=isc.chain_min_len,
                chain_max_len=isc.chain_max_len,
                max_num_chains=isc.max_num_chains,
                check_valid_resolution=isc.check_valid_resolution,
                ss_filters=False,
            )
            try:
                row = pipeline_lib.process_mmcif(path, opts)
            except errors.DataError as e:
                logger.info(f"filtered out {path.name}: {e}")
                continue
            rows.append(row)
        metadata = pd.DataFrame(rows, columns=["pdb_name"] if not rows else None)
        processed_dir.mkdir(parents=True, exist_ok=True)
        metadata.to_csv(metadata_path, index=False)
        kept = set(metadata["pdb_name"].astype(str)) if rows else set()
        logger.info(f"processed {len(kept)}/{len(candidates)} structures")

    cif_paths = [p for pid, p, _ in candidates if pid in kept]
    chains_list = [c for pid, _, c in candidates if pid in kept]
    return cif_paths, chains_list


class UnconditionalSampler:
    """De novo sampling grid: lengths x samples_per_length
    (ref experiments/sampler.py:22-136)."""

    def __init__(self, cfg: Config, diffuser: SE3Diffuser, seed: int = 123) -> None:
        self.cfg = cfg
        self.diffuser = diffuser
        self.seed = seed
        s = cfg.inference.samples
        self.lengths = list(
            range(s.min_length, s.max_length + 1, s.length_step)
        )
        self.samples_per_length = s.samples_per_length

    def __len__(self) -> int:
        return len(self.lengths) * self.samples_per_length

    def __iter__(self) -> Iterator[SampleItem]:
        for length in self.lengths:
            for sample_i in range(self.samples_per_length):
                key = jax.random.fold_in(
                    jax.random.PRNGKey(self.seed), length * 1000 + sample_i
                )
                rigids_t = self.diffuser.sample_ref(key, length)
                feats = {
                    "res_mask": np.ones((length,), np.float32),
                    "fixed_mask": np.zeros((length,), np.float32),
                    "seq_idx": np.arange(length, dtype=np.int64),
                    "chain_idx": np.zeros((length,), np.int64),
                    "residue_index": np.arange(1, length + 1, dtype=np.int64),
                    "sc_ca_t": np.zeros((length, 3), np.float32),
                    "rigids_t": np.asarray(rigids_t.to_tensor7(), np.float32),
                    "torsion_angles_sin_cos": np.zeros((length, 7, 2), np.float32),
                    "t": np.asarray(1.0, np.float32),
                }
                feats = {k: v[None] if np.ndim(v) >= 1 else np.asarray([v]) for k, v in feats.items()}
                yield f"length_{length}", sample_i, feats


class ConditionalSampler:
    """Inpainting over real structures with random redaction regions
    (ref experiments/sampler.py:138-355). Reads mmCIF files from a directory
    (downloading is the caller's concern in a zero-egress environment)."""

    def __init__(
        self,
        cfg: Config,
        diffuser: SE3Diffuser,
        cif_paths: list[pathlib.Path],
        chains_per_structure: list[list[str] | None] | None = None,
        seed: int = 123,
    ) -> None:
        self.cfg = cfg
        self.diffuser = diffuser
        self.cif_paths = [pathlib.Path(p) for p in cif_paths]
        self.chains_per_structure = chains_per_structure or [None] * len(
            self.cif_paths
        )
        self.samples = cfg.inference.inpainting_samples.samples
        self.seed = seed
        self._mask_cache: dict[int, np.ndarray] = {}
        self._feat_cache: dict[int, dict[str, np.ndarray]] = {}

    def __len__(self) -> int:
        return len(self.cif_paths) * self.samples

    # -- overridable hooks ---------------------------------------------------

    def create_diffusion_mask(
        self, chain_feats: dict[str, np.ndarray], example_idx: int
    ) -> np.ndarray:
        """Random contiguous redaction per chain with a fixed per-example
        rng seed (ref sampler.py:226-257); or, when
        inpainting_samples.start_idx/end_idx are set, that explicit region
        of the first chain."""
        if example_idx in self._mask_cache:
            return self._mask_cache[example_idx]
        start = self.cfg.inference.inpainting_samples.start_idx
        end = self.cfg.inference.inpainting_samples.end_idx
        if start is not None and end is not None:
            mask = np.zeros_like(chain_feats["res_mask"])
            first_chain = chain_feats["chain_idx"] == np.unique(
                chain_feats["chain_idx"]
            )[0]
            rows = np.where(first_chain)[0][start : end + 1]
            mask[rows] = 1
        else:
            rng = np.random.default_rng(example_idx)
            mask = feature_lib.create_redacted_regions(
                chain_feats["chain_idx"],
                chain_feats["res_mask"],
                rng,
                redact_min_len=self.cfg.data.redaction.redact_min_len,
                redact_max_len=self.cfg.data.redaction.redact_max_len,
            )
        self._mask_cache[example_idx] = mask
        return mask

    def load_features(self, example_idx: int) -> dict[str, np.ndarray]:
        if example_idx in self._feat_cache:
            return self._feat_cache[example_idx]
        path = self.cif_paths[example_idx]
        mmcif_obj = parse_mmcif(path)
        chains = self.chains_per_structure[example_idx]
        missing = [c for c in (chains or []) if c not in mmcif_obj.chains]
        if missing:
            raise ValueError(f"{path.name}: chains {missing} not in structure")
        raw = feature_lib.structure_to_features(mmcif_obj, chain_ids=chains)
        feats = feature_lib.build_model_features(raw)
        self._feat_cache[example_idx] = feats
        return feats

    # -- iteration -------------------------------------------------------------

    def __iter__(self) -> Iterator[SampleItem]:
        for idx in range(len(self)):
            yield self[idx]

    def __getitem__(self, idx: int) -> SampleItem:
        example_idx = idx // self.samples
        sample_idx = idx % self.samples
        pdb_name = self.cif_paths[example_idx].stem[:4]
        chain_feats = dict(self.load_features(example_idx))

        diffused_mask = self.create_diffusion_mask(chain_feats, example_idx)
        if diffused_mask.sum() < 1:
            raise ValueError("Must have at least one diffused residue")
        chain_feats["fixed_mask"] = (1 - diffused_mask).astype(np.float32)

        gt_rigid = Rigid.from_tensor7(jnp.asarray(chain_feats["rigids_0"]))
        chain_feats["sc_ca_t"] = np.zeros_like(chain_feats["rigids_0"][:, 4:])

        key = jax.random.fold_in(jax.random.PRNGKey(self.seed), idx)
        rigids_t = self.diffuser.sample_ref(
            key,
            n_samples=chain_feats["rigids_0"].shape[0],
            impute=gt_rigid,
            diffuse_mask=jnp.asarray(diffused_mask, jnp.float32),
        )
        chain_feats["rigids_t"] = np.asarray(rigids_t.to_tensor7(), np.float32)
        chain_feats["t"] = np.asarray(1.0, np.float32)

        # Pad to a static bucket and add the batch dim.
        n = len(chain_feats["res_mask"])
        bucket = feature_lib.length_bucket(n)
        chain_feats = feature_lib.pad_feats(chain_feats, bucket)
        final = {
            k: (v[None] if np.ndim(v) >= 1 else np.asarray([v], np.float32))
            for k, v in chain_feats.items()
        }
        return pdb_name, sample_idx, final


class TCRSampler(ConditionalSampler):
    """CDR-loop inpainting driven by the curated TCR database CSVs
    (ref experiments/sampler.py:357-467)."""

    def __init__(
        self,
        cfg: Config,
        diffuser: SE3Diffuser,
        cif_dir: str | pathlib.Path | None = None,
        csv_path: str | pathlib.Path | None = None,
        first_assembly: bool = True,
        seed: int = 123,
        cif_paths: list[pathlib.Path] | None = None,
        chains_list: list[list[str] | None] | None = None,
    ) -> None:
        if cif_paths is None:
            csv = pd.read_csv(csv_path)
            pdb_ids, all_chains = _tcr_rows(csv)
            cif_dir = pathlib.Path(cif_dir)
            suffix = "-assembly1.cif" if first_assembly else ".cif"
            cif_paths, chains_list = [], []
            for pid, chains in zip(pdb_ids, all_chains):
                path = cif_dir / f"{pid}{suffix}"
                if not path.exists():
                    logger.warning(f"missing structure file {path}; skipping")
                    continue
                cif_paths.append(path)
                chains_list.append(chains)
        super().__init__(cfg, diffuser, cif_paths, chains_list, seed=seed)
        self.cdr_loops = [
            _canonical_loop(c) for c in cfg.inference.inpainting_samples.cdr_loops
        ]
        self.shifted_region = cfg.inference.inpainting_samples.shifted_region

    @classmethod
    def from_database(
        cls, cfg: Config, diffuser: SE3Diffuser, seed: int = 123
    ) -> "TCRSampler":
        """Reference-style init: the TCR database CSV drives download into
        ``inpainting_samples.download_dir``, inference filters build a
        cached metadata.csv, and sampling runs over the survivors
        (ref experiments/sampler.py:357-414 + :184-226)."""
        isc = cfg.inference.inpainting_samples
        csv_path = isc.data_path or cfg.data.csv_path or "database/TCR.csv"
        csv = pd.read_csv(csv_path)
        pdb_ids, all_chains = _tcr_rows(csv)
        cif_paths, chains_list = init_database_metadata(
            cfg, pdb_ids, all_chains
        )
        return cls(
            cfg, diffuser, seed=seed, cif_paths=cif_paths,
            chains_list=chains_list,
        )

    def create_diffusion_mask(
        self, chain_feats: dict[str, np.ndarray], example_idx: int
    ) -> np.ndarray:
        if example_idx in self._mask_cache:
            return self._mask_cache[example_idx]
        chains = self.chains_per_structure[example_idx]
        mask = tcr_lib.create_diffusion_mask(
            chain_indexes=chain_feats["chain_idx"],
            aatype=np.asarray(chain_feats["aatype"]),
            tcr_chains=list(chains[:2]),
            cdr_loops=self.cdr_loops,
            shifted_region=self.shifted_region,
        )
        self._mask_cache[example_idx] = mask
        return mask


def _tcr_rows(csv: pd.DataFrame) -> tuple[list[str], list[list[str]]]:
    """(pdb_ids, chains-to-process) from the curated TCR CSV: TCR alpha and
    beta first (the CDR-mask convention relies on processing order), then
    any peptide/MHC chains present."""
    pdb_ids: list[str] = []
    all_chains: list[list[str]] = []
    for _, row in csv.iterrows():
        chains = [row["tcr_alpha_chain"], row["tcr_beta_chain"]]
        for col in ("peptide_chain", "mhc_alpha_chain", "mhc_beta_chain"):
            v = row.get(col)
            if isinstance(v, str) and v:
                chains.append(v)
        pdb_ids.append(str(row["pdb_id"]).lower())
        all_chains.append(chains)
    return pdb_ids, all_chains


def _canonical_loop(name: str) -> str:
    """Map config names like 'beta_3'/'alpha_3' to CDR ids."""
    name = str(name)
    if name.upper().startswith("CDR"):
        return name.upper().replace("CDR2.5", "CDR2.5")
    digit = name.split("_")[-1]
    return {"1": "CDR1", "2": "CDR2", "2.5": "CDR2.5", "3": "CDR3"}.get(
        digit, "CDR3"
    )
