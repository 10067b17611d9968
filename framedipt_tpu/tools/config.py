"""Typed configuration system.

Replaces the reference's Hydra/OmegaConf stack (config/base.yaml,
config/inference.yaml composed at experiments/inference.py:727) with plain
dataclasses + YAML + dotted-path overrides: no external deps, serializable,
and hashable into jit static args where needed. Defaults mirror
/root/reference/config/base.yaml and inference.yaml so a reference user can
carry their configs over.
"""
from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any

import yaml


# --------------------------------------------------------------------------
# Diffuser
# --------------------------------------------------------------------------


@dataclass
class R3Config:
    """VP-SDE translation diffusion (ref config/base.yaml:38-43)."""

    min_b: float = 0.1
    max_b: float = 20.0
    coordinate_scaling: float = 0.1
    seed: int | None = None


@dataclass
class SO3Config:
    """IGSO(3) rotation diffusion (ref config/base.yaml:44-53)."""

    num_omega: int = 1000
    num_sigma: int = 1000
    min_sigma: float = 0.1
    max_sigma: float = 1.5
    schedule: str = "logarithmic"
    cache_dir: str = ".cache/"
    use_cached_score: bool = False
    seed: int | None = None


@dataclass
class DiffuserConfig:
    diffuse_trans: bool = True
    diffuse_rot: bool = True
    r3: R3Config = field(default_factory=R3Config)
    so3: SO3Config = field(default_factory=SO3Config)


# --------------------------------------------------------------------------
# Model
# --------------------------------------------------------------------------


@dataclass
class EmbedConfig:
    index_embed_size: int = 32
    aatype_embed_size: int = 64
    embed_self_conditioning: bool = True
    num_bins: int = 22
    min_bin: float = 1e-5
    max_bin: float = 20.0


@dataclass
class IPAConfig:
    c_s: int = 256
    c_z: int = 128
    c_hidden: int = 256
    c_skip: int = 64
    no_heads: int = 8
    no_qk_points: int = 8
    no_v_points: int = 12
    seq_tfmr_num_heads: int = 4
    seq_tfmr_num_layers: int = 2
    num_blocks: int = 4
    coordinate_scaling: float = 0.1
    # TPU-specific: fused Pallas pair-MLP kernel for the edge transitions.
    # None = auto (the inference CLI enables it on TPU backends; training
    # and CPU runs use the XLA formulation — the kernel is forward-only).
    use_pallas_kernel: bool | None = None
    # Fully-fused kernel for the Embedder's edge branch: synthesizes the
    # rel-offset sinusoids (rank-64 CP angle-addition factors) and the
    # self-conditioning distogram *inside* the kernel, so the pairwise
    # feature producers never materialize to HBM (the round-2 MLP-only
    # fusion lost exactly there — PERF.md). None = auto, same policy as
    # use_pallas_kernel (inference CLI enables on TPU backends).
    use_pallas_embedder: bool | None = None
    # Pallas tile shape over the N x N edge grid (elements per tile should
    # stay ~4096 to fit bf16 intermediates in VMEM; measured best at
    # 16x256 for len-256 and equal-best at len-512 on v5e).
    pallas_tile_i: int = 16
    pallas_tile_j: int = 256
    # Embedder-kernel tiles (measured: 16x256 best at len-256, within 1% of
    # best at len-512 — see PERF.md round-2 fused edge-embedder notes).
    pallas_emb_tile_i: int = 16
    pallas_emb_tile_j: int = 256
    # Fused IPA attention kernel (one pass over z, no [N, N] intermediates
    # in HBM; forward-only). The round-2 version lost to XLA on MXU padding
    # (narrow per-head pair projections); round 3 hoists both projections
    # to a single pass per z row-tile shared across head iterations via
    # VMEM scratch. None = auto, same policy as use_pallas_kernel.
    use_pallas_ipa: bool | None = None
    # Backward implementation when the fused pair-MLP kernel is trained
    # through: "xla" remats through the identical-math XLA twin; "pallas"
    # runs the fused backward kernel (forward recompute + all input grads
    # tile-resident, grid-reduced grads accumulated f32 in VMEM).
    # Default set by measurement on the v5e (round 4): whole train step
    # 181.5 vs 147.2 examples/s (+23%) over the saved-activation XLA
    # backward at B=4 N=256 bf16; edge-transition value+grad component
    # 9.0 vs 13.5 ms/fwd at N=512 (see PERF.md backward A/B table).
    pallas_bwd_impl: str = "pallas"
    # Backward for the fused edge-embedder kernel when trained through:
    # "xla" remat twin or "pallas" fused backward (the cotangent read is
    # its only N^2 HBM traffic — the pair input is synthesized in-kernel,
    # so there is no d_pair output at all). Measured on the v5e at B=4
    # N=256 bf16 (interleaved same-process A/B, two repeats): 185.7/185.2
    # examples/s vs 180.1/178.7 without the embedder kernel — the fused
    # backward flips the embedder kernel from a training loss (remat twin
    # re-materialized what the forward saved: 178 vs 185) into a +3.4% win.
    pallas_emb_bwd_impl: str = "pallas"
    # Run Pallas kernels in interpret mode (CPU-mesh tests only).
    pallas_interpret: bool = False


@dataclass
class ModelConfig:
    input_aatype: bool = False
    node_embed_size: int = 256
    edge_embed_size: int = 128
    dropout: float = 0.0
    # TPU compute dtype for the trunk's dense math ("float32"/"bfloat16").
    # Frame algebra, attention softmax accumulation, and score conversions
    # always stay float32.
    compute_dtype: str = "float32"
    embed: EmbedConfig = field(default_factory=EmbedConfig)
    ipa: IPAConfig = field(default_factory=IPAConfig)


# --------------------------------------------------------------------------
# Data
# --------------------------------------------------------------------------


@dataclass
class FilteringConfig:
    max_len: int = 512
    min_len: int = 60
    chain_max_len: int = 512
    subset: int | None = None
    allowed_oligomer: list[str] = field(default_factory=list)
    max_helix_percent: float = 1.0
    max_loop_percent: float = 0.5
    min_beta_percent: float = -1.0
    rog_quantile: float = 0.96


@dataclass
class RedactionConfig:
    redact_min_len: int = 8
    redact_max_len: int = 50


@dataclass
class DataConfig:
    csv_path: str | None = None
    cluster_file: str | None = None
    num_clusters: int | None = None
    single_chain: bool = False
    filtering: FilteringConfig = field(default_factory=FilteringConfig)
    min_t: float = 0.01
    samples_per_eval_length: int = 4
    num_eval_lengths: int = 10
    num_t: int = 100
    redaction: RedactionConfig = field(default_factory=RedactionConfig)


# --------------------------------------------------------------------------
# Experiment / training
# --------------------------------------------------------------------------


@dataclass
class RecycleConfig:
    enabled: bool = False
    mode: str = "max"  # "max" or "next"


@dataclass
class ExperimentConfig:
    name: str = "baseline"
    inpainting: bool = False
    seed: int = 0
    log_freq: int = 1000
    batch_size: int = 128
    eval_batch_size: int = 4
    num_epoch: int = 95
    learning_rate: float = 1e-4
    max_squared_res: int = 1_000_000
    num_gpus: int = 1  # kept for config compat; mesh size rules on TPU
    recycle: RecycleConfig = field(default_factory=RecycleConfig)
    ckpt_freq: int = 10_000
    early_ckpt: bool = True
    early_ckpt_step: int = 100
    eval_freq: int = 50_000
    resume_ckpt_dir: str | None = None
    # Persistent XLA executable cache (TPU-native addition: amortizes the
    # ~20-40 s sampler compile across CLI invocations/sweep jobs). None or
    # "" disables; unwritable paths degrade gracefully to in-memory.
    compilation_cache_dir: str | None = "~/.cache/framedipt_tpu/xla"
    use_ckpt_conf: bool = False
    ckpt_dir: str = "./ckpt/"
    # Loss weights (ref config/base.yaml:119-136).
    trans_loss_weight: float = 1.0
    separate_rot_loss: bool = True
    rot_loss_weight: float = 0.5
    rot_loss_t_threshold: float = 0.2
    trans_x0_threshold: float = 1.0
    coordinate_scaling: float = 0.1
    bb_atom_loss_weight: float = 1.0
    bb_atom_loss_t_filter: float = 0.25
    dist_mat_loss_weight: float = 1.0
    dist_mat_loss_t_filter: float = 0.25
    aux_loss_weight: float = 0.25
    use_importance_sampling: bool = False
    num_bins: int = 100
    history_per_term: int = 10
    eval_dir: str = "./eval_outputs"
    noise_scale: float = 1.0
    num_parameters: int | None = None
    # TPU mesh axes: data parallel size; -1 = all devices.
    dp_size: int = -1
    fsdp_size: int = 1
    # Background input-pipeline depth (batches buffered ahead of the step).
    prefetch_buffer: int = 4


# --------------------------------------------------------------------------
# Inference (ref config/inference.yaml)
# --------------------------------------------------------------------------


@dataclass
class InferenceDiffusionConfig:
    num_t: int = 100
    min_t: float = 0.01
    noise_scale: float = 0.1


@dataclass
class InferenceSamplesConfig:
    # De novo sampling grid (ref config/inference.yaml samples section).
    samples_per_length: int = 10
    seq_per_sample: int = 8
    min_length: int = 100
    max_length: int = 500
    length_step: int = 100


@dataclass
class InpaintingSamplesConfig:
    samples: int = 5
    # Batch all samples of a test case into one device program (TPU-native
    # replacement for the reference's one-sample-at-a-time loop).
    batch_samples: bool = True
    tcr: bool = True
    # CDR3 flank ablations: diffuse the region before/after the loop instead
    # (ref framedipt/protein/tcr.py:65-124 shifted_region).
    shifted_region: str | None = None
    # Save an ESMFold prediction of the full sequence next to the ground
    # truth (reference inference.py:291-305); requires ESMFold weights.
    run_esmfold: bool = False
    cdr_loops: list[str] = field(default_factory=lambda: ["beta_3"])
    start_idx: int | None = None
    end_idx: int | None = None
    # Database-driven sampler init (ref experiments/sampler.py:184-226 +
    # config/inference.yaml inpainting_samples): download structures listed
    # in data_path into download_dir, build a cached metadata.csv with the
    # filters below, and sample from the survivors. When the inference CLI
    # gets an explicit --cif_dir these are bypassed.
    data_path: str | None = None  # CSV with pdb_id + chain columns
    download_dir: str | None = None
    first_assembly: bool = True
    overwrite: bool = False  # rebuild metadata.csv even if cached
    max_resolution: float | None = None
    max_len: int | None = None
    min_len: int | None = None
    chain_max_len: int | None = None
    chain_min_len: int | None = None
    max_num_chains: int | None = None
    check_valid_resolution: bool = False
    num_workers_download: int = 4


@dataclass
class InferenceConfig:
    name: str | None = None
    seed: int = 123
    gpu_id: int | None = None
    inpainting: bool = True
    input_aatype: bool = False
    confidence_score: str | None = None
    output_dir: str = "./inference_outputs/"
    weights_path: str = "./weights/inpainting.pth"
    pmpnn_dir: str | None = None  # ProteinMPNN checkout (subprocess fallback)
    # In-process TPU-native ProteinMPNN weights (model/mpnn.py); .pt reference
    # checkpoint or converted .npz. fetch via scripts/fetch_weights.py.
    mpnn_weights_path: str = "./weights/mpnn/v_48_020.pt"
    save_backbone_trajectory: bool = True
    save_pred_x0_trajectory: bool = True
    diffusion: InferenceDiffusionConfig = field(
        default_factory=InferenceDiffusionConfig
    )
    samples: InferenceSamplesConfig = field(default_factory=InferenceSamplesConfig)
    inpainting_samples: InpaintingSamplesConfig = field(
        default_factory=InpaintingSamplesConfig
    )


@dataclass
class Config:
    """Root config, mirroring the reference's hydra composition."""

    data: DataConfig = field(default_factory=DataConfig)
    diffuser: DiffuserConfig = field(default_factory=DiffuserConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    experiment: ExperimentConfig = field(default_factory=ExperimentConfig)
    inference: InferenceConfig = field(default_factory=InferenceConfig)


# --------------------------------------------------------------------------
# Loading / overrides
# --------------------------------------------------------------------------


def _apply_dict(obj: Any, updates: dict[str, Any], path: str = "") -> None:
    for key, value in updates.items():
        if not hasattr(obj, key):
            raise KeyError(f"Unknown config key: {path}{key}")
        current = getattr(obj, key)
        if dataclasses.is_dataclass(current) and isinstance(value, dict):
            _apply_dict(current, value, path=f"{path}{key}.")
        else:
            setattr(obj, key, value)


def load_config(
    yaml_path: str | None = None, overrides: list[str] | None = None
) -> Config:
    """Build a Config from defaults, an optional YAML file, and CLI-style
    dotted overrides (``experiment.batch_size=8``)."""
    cfg = Config()
    if yaml_path is not None:
        with open(yaml_path, encoding="utf-8") as f:
            data = yaml.safe_load(f) or {}
        _apply_dict(cfg, data)
    for ov in overrides or []:
        key, _, raw = ov.partition("=")
        value = yaml.safe_load(raw)
        node = cfg
        *parents, leaf = key.split(".")
        for p in parents:
            node = getattr(node, p)
        if not hasattr(node, leaf):
            raise KeyError(f"Unknown config key: {key}")
        setattr(node, leaf, value)
    return cfg


def to_dict(cfg: Any) -> dict[str, Any]:
    return dataclasses.asdict(cfg)


def save_config(cfg: Any, path: str) -> None:
    with open(path, "w", encoding="utf-8") as f:
        yaml.safe_dump(to_dict(cfg), f, sort_keys=False)


def merge_checkpoint_config(cfg: Config, ckpt_conf: dict[str, Any]) -> Config:
    """Apply a checkpoint's saved model/diffuser config over the runtime
    config — the reference's precedence rule where checkpoint config wins for
    model and diffuser sections (experiments/inference.py:126-159)."""
    new = load_config()  # fresh defaults
    _apply_dict(new, to_dict(cfg))
    for section in ("model", "diffuser"):
        if section in ckpt_conf:
            _apply_dict(getattr(new, section), ckpt_conf[section])
    return new


def config_hash(cfg: Any) -> str:
    return json.dumps(to_dict(cfg), sort_keys=True)
