"""Full-model weight-import parity: build the *reference* torch ScoreNetwork
(random init), convert its state_dict with import_torch, and compare every
forward output of the flax model on identical inputs."""
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
from framedipt_tpu.tools.config import (
    DiffuserConfig,
    ModelConfig,
    R3Config,
    SO3Config,
)

NUM_BLOCKS = 2
SEQ_TFMR_LAYERS = 2
N_RES = 14


def _ns(**kw):
    out = types.SimpleNamespace(**kw)
    return out


def _install_omegaconf_stub():
    if "omegaconf" in sys.modules:
        return
    m = types.ModuleType("omegaconf")
    m.DictConfig = object
    m.OmegaConf = object
    sys.modules["omegaconf"] = m


@pytest.fixture(scope="module")
def ref_model_and_cfg(reference):
    _install_omegaconf_stub()
    from framedipt.diffusion.se3_diffuser import SE3Diffuser as RefSE3
    from framedipt.model.score_network import ScoreNetwork as RefScoreNetwork

    so3_conf = _ns(
        num_omega=100,
        num_sigma=50,
        min_sigma=0.1,
        max_sigma=1.5,
        schedule="logarithmic",
        cache_dir="/tmp/ref_igso3_cache",
        use_cached_score=False,
        seed=0,
    )
    r3_conf = _ns(min_b=0.1, max_b=20.0, coordinate_scaling=0.1, seed=0)
    diff_conf = _ns(diffuse_trans=True, diffuse_rot=True, so3=so3_conf, r3=r3_conf)

    ipa_conf = _ns(
        c_s=48,
        c_z=24,
        c_hidden=24,
        c_skip=16,
        no_heads=4,
        no_qk_points=4,
        no_v_points=6,
        seq_tfmr_num_heads=4,
        seq_tfmr_num_layers=SEQ_TFMR_LAYERS,
        num_blocks=NUM_BLOCKS,
        coordinate_scaling=0.1,
    )
    embed_conf = _ns(
        index_embed_size=16,
        aatype_embed_size=16,
        embed_self_conditioning=True,
        num_bins=22,
        min_bin=1e-5,
        max_bin=20.0,
    )
    model_conf = _ns(
        input_aatype=False,
        node_embed_size=48,
        edge_embed_size=24,
        dropout=0.0,
        embed=embed_conf,
        ipa=ipa_conf,
    )

    torch.manual_seed(0)
    ref_diffuser = RefSE3(diff_conf)
    ref_model = RefScoreNetwork(model_conf, ref_diffuser, inpainting=True)
    ref_model.eval()
    return ref_model, ref_diffuser


@pytest.fixture(scope="module")
def my_model():
    so3 = SO3Config(num_omega=100, num_sigma=50, cache_dir=None)
    diffuser = SE3Diffuser(DiffuserConfig(so3=so3, r3=R3Config()))
    mc = ModelConfig()
    mc.node_embed_size = 48
    mc.edge_embed_size = 24
    mc.embed.index_embed_size = 16
    mc.embed.aatype_embed_size = 16
    mc.ipa.c_s = 48
    mc.ipa.c_z = 24
    mc.ipa.c_hidden = 24
    mc.ipa.c_skip = 16
    mc.ipa.no_heads = 4
    mc.ipa.no_qk_points = 4
    mc.ipa.no_v_points = 6
    mc.ipa.seq_tfmr_num_heads = 4
    mc.ipa.seq_tfmr_num_layers = SEQ_TFMR_LAYERS
    mc.ipa.num_blocks = NUM_BLOCKS
    return ScoreNetwork(mc, diffuser, inpainting=True)


def make_inputs(seed=0):
    rng = np.random.default_rng(seed)
    B, N = 1, N_RES
    trans = rng.normal(size=(B, N, 3)).astype(np.float32) * 5
    qs = rng.normal(size=(B, N, 4)).astype(np.float32)
    qs /= np.linalg.norm(qs, axis=-1, keepdims=True)
    qs = qs * np.sign(qs[..., :1])  # canonical sign for quat comparisons
    fixed = np.zeros((B, N), np.float32)
    fixed[:, :5] = 1.0
    return {
        "res_mask": np.ones((B, N), np.float32),
        "fixed_mask": fixed,
        "seq_idx": np.tile(np.arange(N)[None], (B, 1)),
        "t": np.full((B,), 0.43, np.float32),
        "sc_ca_t": trans + rng.normal(scale=0.5, size=(B, N, 3)).astype(np.float32),
        "rigids_t": np.concatenate([qs, trans], axis=-1),
        "torsion_angles_sin_cos": rng.normal(size=(B, N, 7, 2)).astype(np.float32),
        "aatype": rng.integers(0, 20, size=(B, N)),
    }


def test_forward_parity(ref_model_and_cfg, my_model):
    ref_model, _ = ref_model_and_cfg
    inputs = make_inputs()

    torch_feats = {
        k: torch.tensor(v) for k, v in inputs.items()
    }
    torch_feats["aatype"] = torch_feats["aatype"].long()
    torch_feats["seq_idx"] = torch_feats["seq_idx"].long()
    with torch.no_grad():
        ref_out = ref_model(torch_feats)

    params = convert_state_dict(
        ref_model.state_dict(),
        num_blocks=NUM_BLOCKS,
        seq_tfmr_layers=SEQ_TFMR_LAYERS,
    )
    jax_feats = {k: jnp.asarray(v) for k, v in inputs.items()}
    my_out = my_model.apply(params, jax_feats)

    for key, tol in (
        ("psi", 3e-4),
        ("trans_score", 2e-2),
        ("rot_score", 2e-2),
        ("atom37", 2e-3),
    ):
        ref_v = ref_out[key].numpy()
        got = np.asarray(my_out[key])
        diff = np.abs(got - ref_v).max()
        scale = max(1.0, np.abs(ref_v).max())
        assert diff / scale < tol, f"{key}: rel diff {diff/scale:.2e} (abs {diff:.2e})"

    # Rigids: translations directly, quaternions up to sign.
    ref_r = ref_out["rigids"].numpy()
    got_r = np.asarray(my_out["rigids"])
    np.testing.assert_allclose(got_r[..., 4:], ref_r[..., 4:], atol=2e-3)
    dots = np.abs(
        np.sum(got_r[..., :4] * ref_r[..., :4], axis=-1)
        / (
            np.linalg.norm(got_r[..., :4], axis=-1)
            * np.linalg.norm(ref_r[..., :4], axis=-1)
        )
    )
    np.testing.assert_allclose(dots, 1.0, atol=1e-4)


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])
