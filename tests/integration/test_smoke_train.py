"""Smoke training on features derived from the real fixture cifs.

End-to-end contract (reference training config, config/base.yaml:81-147):
preprocess the 3 fixture structures -> a few hundred training steps with
the async input pipeline -> loss decreases, a checkpoint is written, and
the inference CLI can sample from that checkpoint. Also pins the input
pipeline's overlap: steps/s INCLUDING data loading must stay close to the
compute-only rate (VERDICT round-1 item 8).
"""
import json
import pathlib
import subprocess
import sys
import time

import numpy as np
import pytest

import jax

from framedipt_tpu.data.pipeline import ProcessOptions, process_serially
from framedipt_tpu.tools.config import Config, FilteringConfig, SO3Config

pytestmark = pytest.mark.slow

CIF_DIR = pathlib.Path(__file__).resolve().parents[1] / "data" / "cifs"
REPO = pathlib.Path(__file__).resolve().parents[2]


def _tiny_train_cfg(data_dir: pathlib.Path, ckpt_dir: pathlib.Path) -> Config:
    cfg = Config()
    cfg.diffuser.so3 = SO3Config(num_omega=50, num_sigma=20, cache_dir=None)
    m = cfg.model
    m.node_embed_size = 32
    m.edge_embed_size = 16
    m.ipa.c_s = 32
    m.ipa.c_z = 16
    m.ipa.c_hidden = 16
    m.ipa.c_skip = 8
    m.ipa.no_heads = 2
    m.ipa.no_qk_points = 4
    m.ipa.no_v_points = 4
    m.ipa.num_blocks = 1
    m.ipa.seq_tfmr_num_layers = 1
    m.ipa.seq_tfmr_num_heads = 2
    cfg.data.csv_path = str(data_dir / "metadata.csv")
    cfg.data.single_chain = True
    cfg.data.filtering.chain_max_len = 72
    cfg.data.filtering.max_len = 2000
    cfg.data.filtering.min_len = 10
    cfg.experiment.inpainting = True
    cfg.experiment.batch_size = 3
    cfg.experiment.learning_rate = 1e-3
    cfg.experiment.num_epoch = 200  # 1 bucketed batch/epoch -> 200 steps
    cfg.experiment.log_freq = 10
    cfg.experiment.ckpt_freq = 100
    cfg.experiment.early_ckpt = True
    cfg.experiment.early_ckpt_step = 50
    cfg.experiment.ckpt_dir = str(ckpt_dir)
    cfg.experiment.name = "smoke"
    cfg.experiment.dp_size = 1
    cfg.experiment.seed = 3
    return cfg


@pytest.fixture(scope="module")
def preprocessed(tmp_path_factory):
    out = tmp_path_factory.mktemp("processed")
    opts = ProcessOptions(
        output_dir=out,
        filtering=FilteringConfig(max_len=2000, min_len=10, chain_max_len=2000),
    )
    rows = process_serially(sorted(CIF_DIR.glob("*.cif")), opts)
    assert len(rows) == 3
    import pandas as pd

    pd.DataFrame(rows).to_csv(out / "metadata.csv", index=False)
    return out


def test_smoke_train_loss_ckpt_sample(preprocessed, tmp_path):
    from framedipt_tpu.experiments.train import train
    from framedipt_tpu.train.checkpoints import latest_checkpoint

    ckpt_root = tmp_path / "ckpt"
    cfg = _tiny_train_cfg(preprocessed, ckpt_root)
    train(cfg)

    ckpt_dir = ckpt_root / "smoke"
    ckpt = latest_checkpoint(ckpt_dir)
    assert ckpt is not None, "no checkpoint written"

    # Loss decreased over the run (metrics JSONL from MetricsLogger).
    metrics_path = ckpt_dir / "metrics.jsonl"
    rows = [json.loads(x) for x in metrics_path.read_text().splitlines()]
    losses = [r["loss"] for r in rows]
    assert len(losses) >= 10
    # Median over thirds: each log point's loss is dominated by that
    # batch's random t draw (small-t batches carry the x0 + auxiliary
    # terms, which are an order of magnitude larger than score losses),
    # so a 3-point mean is a lottery over t. Medians of the first/last
    # thirds measure the trend the test is actually about.
    k = max(3, len(losses) // 3)
    first = np.median(losses[:k])
    last = np.median(losses[-k:])
    assert last < first, f"loss did not decrease: {first:.3f} -> {last:.3f}"

    # Sample from the trained checkpoint via the real inference CLI.
    out_dir = tmp_path / "samples"
    cmd = [
        sys.executable, "-m", "framedipt_tpu.experiments.inference",
        f"--cif_dir={CIF_DIR}",
        "inference.inpainting=true",
        "inference.inpainting_samples.tcr=false",
        "inference.inpainting_samples.samples=1",
        "inference.diffusion.num_t=2",
        f"inference.weights_path={ckpt}",
        f"inference.output_dir={out_dir}",
        "data.single_chain=true",
        "data.filtering.chain_max_len=72",
        "diffuser.so3.cache_dir=null",
        "diffuser.so3.num_omega=50",
        "diffuser.so3.num_sigma=20",
    ]
    env = {"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin:/opt/venv/bin"}
    import os

    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    env.pop("PALLAS_AXON_POOL_IPS", None)
    proc = subprocess.run(
        cmd, cwd=REPO, env=env, capture_output=True, text=True, timeout=900
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    samples = list(out_dir.glob("*/*_length_*/sample_0/sample_0_1.pdb"))
    assert samples, "no sample written from trained checkpoint"


def test_use_ckpt_conf_warm_start(preprocessed, tmp_path):
    """Warm-start config precedence (ref base.yaml:116): with
    use_ckpt_conf=True the checkpoint's model/diffuser sections override a
    MISMATCHED runtime config, so the restored weights meet the
    architecture they were trained with."""
    from framedipt_tpu.experiments.train import train
    from framedipt_tpu.train.checkpoints import latest_checkpoint

    ckpt_root = tmp_path / "ckpt"
    cfg = _tiny_train_cfg(preprocessed, ckpt_root)
    cfg.experiment.num_epoch = 2
    cfg.experiment.ckpt_freq = 2
    cfg.experiment.early_ckpt = False
    train(cfg)
    first_ckpt_dir = ckpt_root / "smoke"
    assert latest_checkpoint(first_ckpt_dir) is not None

    # Second run: runtime config declares a DIFFERENT architecture, which
    # could not restore the step-2 weights; use_ckpt_conf must win.
    cfg2 = _tiny_train_cfg(preprocessed, tmp_path / "ckpt2")
    cfg2.model.node_embed_size = 48  # mismatched on purpose
    cfg2.model.ipa.c_s = 48
    cfg2.experiment.num_epoch = 3
    cfg2.experiment.ckpt_freq = 100
    cfg2.experiment.early_ckpt = False
    cfg2.experiment.resume_ckpt_dir = str(first_ckpt_dir)
    cfg2.experiment.use_ckpt_conf = True
    train(cfg2)  # raises on shape mismatch if precedence is broken
    assert cfg2.model.node_embed_size == 32
    # The resumed run continued past the restored step (final checkpoint).
    final = latest_checkpoint(tmp_path / "ckpt2" / "smoke")
    assert final is not None
    assert int(final.name.split("_")[-1]) > 2


def test_input_pipeline_overlaps_compute(preprocessed, tmp_path):
    """steps/s including data loading stays close to compute-only."""
    from framedipt_tpu.diffusion import SE3Diffuser
    from framedipt_tpu.model import ScoreNetwork
    from framedipt_tpu.experiments.train import TrainDataset
    from framedipt_tpu.train.loop import (
        build_train_step,
        init_train_state,
        make_optimizer,
    )
    from framedipt_tpu.train.prefetch import prefetch

    cfg = _tiny_train_cfg(preprocessed, tmp_path / "x")
    rng = np.random.default_rng(0)
    diffuser = SE3Diffuser(cfg.diffuser)
    model = ScoreNetwork(cfg.model, diffuser, inpainting=True)
    optimizer = make_optimizer(cfg.experiment.learning_rate)
    dataset = TrainDataset(cfg, rng)
    first = next(iter(dataset.batches(cfg.experiment.batch_size)))
    state = init_train_state(model, optimizer, first, jax.random.PRNGKey(0))
    step = jax.jit(build_train_step(model, diffuser, cfg, optimizer))
    key = jax.random.PRNGKey(1)

    # Warm both program variants (JAX compiles twice: second commit-shard).
    for _ in range(3):
        key, sub = jax.random.split(key)
        state, _ = step(state, first, sub)

    n = 24

    def run_compute_only():
        nonlocal state, key
        t0 = time.perf_counter()
        for _ in range(n):
            key, sub = jax.random.split(key)
            state, metrics = step(state, first, sub)
        jax.block_until_ready(metrics["loss"])
        return n / (time.perf_counter() - t0)

    def epochs():
        while True:
            yield from dataset.batches(cfg.experiment.batch_size)

    def run_with_pipeline():
        nonlocal state, key
        it = prefetch(epochs(), size=cfg.experiment.prefetch_buffer)
        # Let the buffer fill so steady-state overlap is measured.
        batches = [next(it) for _ in range(2)]
        t0 = time.perf_counter()
        done = 0
        for batch in it:
            key, sub = jax.random.split(key)
            state, metrics = step(state, batch, sub)
            done += 1
            if done >= n:
                break
        jax.block_until_ready(metrics["loss"])
        it.close()
        return done / (time.perf_counter() - t0)

    compute_rate = run_compute_only()
    pipeline_rate = run_with_pipeline()
    ratio = pipeline_rate / compute_rate
    print(
        f"compute-only {compute_rate:.2f} steps/s, "
        f"with input pipeline {pipeline_rate:.2f} steps/s (ratio {ratio:.2f})"
    )
    # Generous CI bound; without prefetch this sits far lower when
    # featurization is on the critical path.
    assert ratio > 0.6, f"input pipeline not overlapped: ratio {ratio:.2f}"


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])
