"""Regression guard for the bf16 compute path.

The headline benchmark variant runs the trunk's dense math in bfloat16
(PERF.md claims <1% relative trajectory drift vs float32). This pins that
claim: the deterministic (noise_scale=0) sampler from identical weights and
identical initial state must produce near-identical trajectories in f32 and
bf16 at the full model size, N=256. A silent bf16 numerics regression
(e.g. a softmax accumulating in bf16, frame algebra falling out of f32)
shows up here as a drift blow-up.
"""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from framedipt_tpu.diffusion import SE3Diffuser
from framedipt_tpu.model import ScoreNetwork
from framedipt_tpu.sampling import build_inference_fn
from framedipt_tpu.tools.config import Config, SO3Config

pytestmark = pytest.mark.slow

N_RES = 256
NUM_T = 5


@pytest.fixture(scope="module")
def setup():
    cfg = Config()
    cfg.diffuser.so3 = SO3Config(num_omega=100, num_sigma=50, cache_dir=None)
    diffuser = SE3Diffuser(cfg.diffuser)
    model_f32 = ScoreNetwork(cfg.model, diffuser, inpainting=True)
    mc_bf16 = dataclasses.replace(cfg.model, compute_dtype="bfloat16")
    model_bf16 = ScoreNetwork(mc_bf16, diffuser, inpainting=True)
    return diffuser, model_f32, model_bf16


def make_feats(seed=11):
    rng = np.random.default_rng(seed)
    B, N = 1, N_RES
    trans = rng.normal(size=(B, N, 3)).astype(np.float32) * 6
    qs = rng.normal(size=(B, N, 4)).astype(np.float32)
    qs /= np.linalg.norm(qs, axis=-1, keepdims=True)
    fixed = np.ones((B, N), np.float32)
    fixed[:, 100:120] = 0.0
    return {
        "res_mask": jnp.ones((B, N), jnp.float32),
        "fixed_mask": jnp.asarray(fixed),
        "seq_idx": jnp.tile(jnp.arange(N)[None], (B, 1)),
        "t": jnp.ones((B,), jnp.float32),
        "sc_ca_t": jnp.zeros((B, N, 3), jnp.float32),
        "rigids_t": jnp.asarray(np.concatenate([qs, trans], axis=-1)),
        "torsion_angles_sin_cos": jnp.asarray(
            rng.normal(size=(B, N, 7, 2)).astype(np.float32)
        ),
        "aatype": jnp.asarray(rng.integers(0, 20, size=(B, N)), jnp.int32),
    }


def test_bf16_trajectory_drift_bounded(setup):
    diffuser, model_f32, model_bf16 = setup
    feats = make_feats()
    # Same params drive both variants (dtype is a cast at use sites).
    params = model_f32.init(jax.random.PRNGKey(0), feats)

    outs = {}
    for name, model in (("f32", model_f32), ("bf16", model_bf16)):
        run = build_inference_fn(
            model, diffuser, num_t=NUM_T, min_t=0.01, noise_scale=0.0,
            aux_traj=False, inpainting=True,
        )
        outs[name] = run(params, feats, jax.random.PRNGKey(1))

    ca_f32 = np.asarray(outs["f32"]["prot_traj"])[:, :, :, 1]  # [T, B, N, 3]
    ca_bf16 = np.asarray(outs["bf16"]["prot_traj"])[:, :, :, 1]
    scale = np.abs(ca_f32).max()
    rel_drift = np.abs(ca_f32 - ca_bf16).max() / scale
    # PERF.md claims <1% relative; alarm with a little headroom.
    assert rel_drift < 0.015, f"bf16 trajectory drift {rel_drift:.2%} vs f32"

    # Fixed (inpainting-masked) residues must agree to f32 tolerance — the
    # motif channel must never round-trip through bf16.
    fixed = np.asarray(feats["fixed_mask"])[0].astype(bool)
    fixed_drift = np.abs(ca_f32[:, 0, fixed] - ca_bf16[:, 0, fixed]).max()
    assert fixed_drift < 1e-4, f"fixed-region drift {fixed_drift}"


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])
