"""Orbax checkpointing with the reference's logical layout.

Role of the reference's torch-pickle checkpoints {model, conf, optim, epoch,
step} (framedipt/data/utils.py:381-417, older checkpoints pruned :402-404).
Here: orbax-checkpoint for the array state + a YAML config snapshot, plus
the torch importer (model/import_torch.py) for cross-loading published
reference weights.
"""
from __future__ import annotations

import pathlib
import shutil
from typing import Any

import orbax.checkpoint as ocp

from framedipt_tpu.tools.config import Config, save_config, load_config
from framedipt_tpu.tools.log import get_logger

logger = get_logger()


def save_checkpoint(
    ckpt_dir: str | pathlib.Path,
    step: int,
    params: Any,
    opt_state: Any,
    cfg: Config | None = None,
    epoch: int = 0,
    keep: int = 1,
) -> pathlib.Path:
    """Write step_{N}/ under ckpt_dir; prune older checkpoints to ``keep``
    (the reference deletes older pickles on each write)."""
    ckpt_dir = pathlib.Path(ckpt_dir).resolve()
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    path = ckpt_dir / f"step_{step}"
    if (path / "state").exists():
        # Already written this step (e.g. the final save after the loop
        # when the last step coincides with ckpt_freq) — idempotent no-op.
        return path
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(
            path / "state",
            {"params": params, "opt_state": opt_state, "step": step, "epoch": epoch},
        )
    if cfg is not None:
        save_config(cfg, str(path / "config.yaml"))
    existing = sorted(
        ckpt_dir.glob("step_*"), key=lambda p: int(p.name.split("_")[1])
    )
    for old in existing[:-keep]:
        shutil.rmtree(old, ignore_errors=True)
    logger.info(f"checkpoint saved: {path}")
    return path


def latest_checkpoint(ckpt_dir: str | pathlib.Path) -> pathlib.Path | None:
    ckpt_dir = pathlib.Path(ckpt_dir)
    if not ckpt_dir.exists():
        return None
    steps = sorted(
        ckpt_dir.glob("step_*"), key=lambda p: int(p.name.split("_")[1])
    )
    return steps[-1] if steps else None


def load_checkpoint(
    path: str | pathlib.Path, target: Any | None = None
) -> tuple[dict, Config | None]:
    """Load a checkpoint dir; returns (state dict, saved config or None)."""
    path = pathlib.Path(path).resolve()
    with ocp.PyTreeCheckpointer() as ckptr:
        if target is not None:
            state = ckptr.restore(path / "state", item=target)
        else:
            state = ckptr.restore(path / "state")
    cfg = None
    cfg_path = path / "config.yaml"
    if cfg_path.exists():
        cfg = load_config(str(cfg_path))
    return state, cfg
