"""End-to-end sampler parity vs the reference inference loop.

With noise_scale=0 the reverse SDE is deterministic, so running the
reference's torch inference_fn (experiments/utils.py:511) and this
framework's lax.scan sampler from identical initial rigids with identical
(imported) weights must produce matching trajectories — any divergence is
an implementation difference, not sampling noise.
"""
import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from framedipt_tpu.diffusion import SE3Diffuser
from framedipt_tpu.model import ScoreNetwork
from framedipt_tpu.model.import_torch import convert_state_dict
from framedipt_tpu.sampling import build_inference_fn
from framedipt_tpu.tools.config import DiffuserConfig, ModelConfig, R3Config, SO3Config

pytestmark = pytest.mark.slow

N_RES = 12
NUM_T = 4
MIN_T = 0.01
NUM_BLOCKS = 2


def _ns(**kw):
    return types.SimpleNamespace(**kw)


@pytest.fixture(scope="module")
def ref_setup(reference):
    if "omegaconf" not in sys.modules:
        m = types.ModuleType("omegaconf")
        m.DictConfig = object
        m.OmegaConf = object
        sys.modules["omegaconf"] = m
    from framedipt.diffusion.se3_diffuser import SE3Diffuser as RefSE3
    from framedipt.model.score_network import ScoreNetwork as RefScoreNetwork
    from experiments import utils as ref_exp_utils

    so3_conf = _ns(
        num_omega=100, num_sigma=50, min_sigma=0.1, max_sigma=1.5,
        schedule="logarithmic", cache_dir="/tmp/ref_igso3_cache",
        use_cached_score=False, seed=0,
    )
    r3_conf = _ns(min_b=0.1, max_b=20.0, coordinate_scaling=0.1, seed=0)
    diff_conf = _ns(diffuse_trans=True, diffuse_rot=True, so3=so3_conf, r3=r3_conf)
    ipa_conf = _ns(
        c_s=48, c_z=24, c_hidden=24, c_skip=16, no_heads=4, no_qk_points=4,
        no_v_points=6, seq_tfmr_num_heads=4, seq_tfmr_num_layers=2,
        num_blocks=NUM_BLOCKS, coordinate_scaling=0.1,
    )
    embed_conf = _ns(
        index_embed_size=16, aatype_embed_size=16,
        embed_self_conditioning=True, num_bins=22, min_bin=1e-5, max_bin=20.0,
    )
    model_conf = _ns(
        input_aatype=False, node_embed_size=48, edge_embed_size=24,
        dropout=0.0, embed=embed_conf, ipa=ipa_conf,
    )
    torch.manual_seed(0)
    ref_diffuser = RefSE3(diff_conf)
    ref_model = RefScoreNetwork(model_conf, ref_diffuser, inpainting=True)
    ref_model.eval()
    return ref_model, ref_diffuser, ref_exp_utils


@pytest.fixture(scope="module")
def my_setup():
    so3 = SO3Config(num_omega=100, num_sigma=50, cache_dir=None)
    diffuser = SE3Diffuser(DiffuserConfig(so3=so3, r3=R3Config()))
    mc = ModelConfig()
    mc.node_embed_size = 48
    mc.edge_embed_size = 24
    mc.embed.index_embed_size = 16
    mc.ipa.c_s = 48
    mc.ipa.c_z = 24
    mc.ipa.c_hidden = 24
    mc.ipa.c_skip = 16
    mc.ipa.no_heads = 4
    mc.ipa.no_qk_points = 4
    mc.ipa.no_v_points = 6
    mc.ipa.seq_tfmr_num_heads = 4
    mc.ipa.seq_tfmr_num_layers = 2
    mc.ipa.num_blocks = NUM_BLOCKS
    return ScoreNetwork(mc, diffuser, inpainting=True), diffuser


def make_init_feats(seed=0):
    rng = np.random.default_rng(seed)
    B, N = 1, N_RES
    trans = rng.normal(size=(B, N, 3)).astype(np.float32) * 4
    qs = rng.normal(size=(B, N, 4)).astype(np.float32)
    qs /= np.linalg.norm(qs, axis=-1, keepdims=True)
    qs = qs * np.sign(qs[..., :1])
    fixed = np.zeros((B, N), np.float32)
    fixed[:, :4] = 1.0
    return {
        "res_mask": np.ones((B, N), np.float32),
        "fixed_mask": fixed,
        "seq_idx": np.tile(np.arange(N)[None], (B, 1)),
        "t": np.ones((B,), np.float32),
        "sc_ca_t": np.zeros((B, N, 3), np.float32),
        "rigids_t": np.concatenate([qs, trans], axis=-1),
        "torsion_angles_sin_cos": rng.normal(size=(B, N, 7, 2)).astype(np.float32),
        "aatype": rng.integers(0, 20, size=(B, N)),
    }


def test_deterministic_trajectory_parity(ref_setup, my_setup):
    ref_model, ref_diffuser, ref_exp_utils = ref_setup
    my_model, my_diffuser = my_setup
    feats = make_init_feats()

    # Reference run (noise_scale=0 -> deterministic).
    torch_feats = {k: torch.tensor(v) for k, v in feats.items()}
    torch_feats["aatype"] = torch_feats["aatype"].long()
    torch_feats["seq_idx"] = torch_feats["seq_idx"].long()
    with torch.no_grad():
        ref_out = ref_exp_utils.inference_fn(
            model=ref_model,
            diffuser=ref_diffuser,
            data_init=torch_feats,
            num_t=NUM_T,
            min_t=MIN_T,
            aux_traj=True,
            noise_scale=0.0,
            embed_self_conditioning=True,
            inpainting=True,
            input_aatype=False,
        )

    # Framework run with imported weights.
    params = convert_state_dict(
        ref_model.state_dict(), num_blocks=NUM_BLOCKS, seq_tfmr_layers=2
    )
    run = build_inference_fn(
        my_model, my_diffuser, num_t=NUM_T, min_t=MIN_T, noise_scale=0.0,
        aux_traj=True, inpainting=True,
    )
    my_out = run(
        jax.tree_util.tree_map(jnp.asarray, params),
        {k: jnp.asarray(v) for k, v in feats.items()},
        jax.random.PRNGKey(0),
    )

    # Backbone trajectory: [T, B, N, 37, 3] both sides, both flipped to
    # start at t=0.
    ref_traj = np.asarray(ref_out["prot_traj"])
    my_traj = np.asarray(my_out["prot_traj"])
    assert ref_traj.shape == my_traj.shape
    scale = max(1.0, np.abs(ref_traj).max())
    for step in range(ref_traj.shape[0]):
        diff = np.abs(ref_traj[step] - my_traj[step]).max()
        assert diff / scale < 5e-3, f"trajectory diverged at step {step}: {diff}"

    # Final translations.
    ref_rigids = np.asarray(ref_out["rigid_traj"])[0]
    my_rigids = np.asarray(my_out["rigid_traj"])[0]
    np.testing.assert_allclose(
        my_rigids[..., 4:], ref_rigids[..., 4:], atol=5e-2
    )


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])
