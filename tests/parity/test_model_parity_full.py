"""Full-size weight-import parity at the published model config.

Builds the *reference* torch ScoreNetwork at the exact config the paper /
benchmark measure (node 256 / edge 128, c_hidden 256, 8 heads, 8 qk /
12 v points, 4 IPA blocks — /root/reference/config/base.yaml:55-79), converts
its randomly-initialized state_dict with import_torch, and compares every
forward output on identical inputs at N=256, batch=2. This certifies the
importer + model wiring at the scale `inpainting.pth` / `denovo.pth` ship at
(toy-size parity lives in test_model_parity.py).
"""
import sys
import types

import numpy as np
import pytest
import torch

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

pytestmark = pytest.mark.slow

NUM_BLOCKS = 4
SEQ_TFMR_LAYERS = 2
N_RES = 256
BATCH = 2


def _ns(**kw):
    return types.SimpleNamespace(**kw)


def _install_omegaconf_stub():
    if "omegaconf" in sys.modules:
        return
    m = types.ModuleType("omegaconf")
    m.DictConfig = object
    m.OmegaConf = object
    sys.modules["omegaconf"] = m


@pytest.fixture(scope="module")
def ref_model(reference):
    _install_omegaconf_stub()
    from framedipt.diffusion.se3_diffuser import SE3Diffuser as RefSE3
    from framedipt.model.score_network import ScoreNetwork as RefScoreNetwork

    # Published diffuser config (/root/reference/config/base.yaml:33-53).
    so3_conf = _ns(
        num_omega=1000,
        num_sigma=1000,
        min_sigma=0.1,
        max_sigma=1.5,
        schedule="logarithmic",
        cache_dir="/tmp/ref_igso3_cache_full",
        use_cached_score=False,
        seed=0,
    )
    r3_conf = _ns(min_b=0.1, max_b=20.0, coordinate_scaling=0.1, seed=0)
    diff_conf = _ns(diffuse_trans=True, diffuse_rot=True, so3=so3_conf, r3=r3_conf)

    # Published model config (/root/reference/config/base.yaml:55-79).
    ipa_conf = _ns(
        c_s=256,
        c_z=128,
        c_hidden=256,
        c_skip=64,
        no_heads=8,
        no_qk_points=8,
        no_v_points=12,
        seq_tfmr_num_heads=4,
        seq_tfmr_num_layers=SEQ_TFMR_LAYERS,
        num_blocks=NUM_BLOCKS,
        coordinate_scaling=0.1,
    )
    embed_conf = _ns(
        index_embed_size=32,
        aatype_embed_size=64,
        embed_self_conditioning=True,
        num_bins=22,
        min_bin=1e-5,
        max_bin=20.0,
    )
    model_conf = _ns(
        input_aatype=False,
        node_embed_size=256,
        edge_embed_size=128,
        dropout=0.0,
        embed=embed_conf,
        ipa=ipa_conf,
    )

    torch.manual_seed(7)
    ref_diffuser = RefSE3(diff_conf)
    model = RefScoreNetwork(model_conf, ref_diffuser, inpainting=True)
    model.eval()
    return model


@pytest.fixture(scope="module")
def my_model():
    # ModelConfig defaults ARE the published config; assert that stays true.
    mc = ModelConfig()
    assert (mc.node_embed_size, mc.edge_embed_size) == (256, 128)
    assert (mc.ipa.c_hidden, mc.ipa.no_heads, mc.ipa.num_blocks) == (256, 8, 4)
    assert (mc.ipa.no_qk_points, mc.ipa.no_v_points) == (8, 12)
    diffuser = SE3Diffuser(
        DiffuserConfig(so3=SO3Config(cache_dir=".igso3_cache"), r3=R3Config())
    )
    return ScoreNetwork(mc, diffuser, inpainting=True)


def make_inputs(seed=0):
    rng = np.random.default_rng(seed)
    B, N = BATCH, N_RES
    trans = rng.normal(size=(B, N, 3)).astype(np.float32) * 8
    qs = rng.normal(size=(B, N, 4)).astype(np.float32)
    qs /= np.linalg.norm(qs, axis=-1, keepdims=True)
    qs = qs * np.sign(qs[..., :1])
    fixed = np.zeros((B, N), np.float32)
    fixed[0, :90] = 1.0
    fixed[1, 120:200] = 1.0
    res_mask = np.ones((B, N), np.float32)
    res_mask[1, 240:] = 0.0  # ragged batch: second example is shorter
    return {
        "res_mask": res_mask,
        "fixed_mask": fixed,
        "seq_idx": np.tile(np.arange(N)[None], (B, 1)),
        "t": np.array([0.43, 0.81], np.float32),
        "sc_ca_t": trans + rng.normal(scale=0.5, size=(B, N, 3)).astype(np.float32),
        "rigids_t": np.concatenate([qs, trans], axis=-1),
        "torsion_angles_sin_cos": rng.normal(size=(B, N, 7, 2)).astype(np.float32),
        "aatype": rng.integers(0, 20, size=(B, N)),
    }


def test_full_size_forward_parity(ref_model, my_model):
    inputs = make_inputs()
    torch_feats = {k: torch.tensor(v) for k, v in inputs.items()}
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
        ("psi", 1e-3),
        ("trans_score", 2e-2),
        ("rot_score", 2e-2),
        ("atom37", 5e-3),
    ):
        ref_v = ref_out[key].numpy()
        got = np.asarray(my_out[key])
        diff = np.abs(got - ref_v).max()
        scale = max(1.0, np.abs(ref_v).max())
        assert diff / scale < tol, (
            f"{key}: rel diff {diff / scale:.2e} (abs {diff:.2e})"
        )

    ref_r = ref_out["rigids"].numpy()
    got_r = np.asarray(my_out["rigids"])
    np.testing.assert_allclose(got_r[..., 4:], ref_r[..., 4:], atol=5e-3)
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
