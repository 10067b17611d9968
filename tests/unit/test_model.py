"""Score network tests: shapes, masking, SE(3) equivariance of the trunk."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from framedipt_tpu.diffusion import SE3Diffuser
from framedipt_tpu.geometry import quat as quat_ops
from framedipt_tpu.geometry.rigid import Rigid
from framedipt_tpu.model import ScoreNetwork
from framedipt_tpu.model.embed import calc_distogram, get_index_embedding, get_timestep_embedding
from framedipt_tpu.tools.config import DiffuserConfig, ModelConfig, SO3Config

SMALL_SO3 = SO3Config(num_omega=100, num_sigma=50, cache_dir=None)
SMALL_MODEL = ModelConfig()
# Shrink the trunk for test speed.
SMALL_MODEL.node_embed_size = 64
SMALL_MODEL.edge_embed_size = 32
SMALL_MODEL.ipa.c_s = 64
SMALL_MODEL.ipa.c_z = 32
SMALL_MODEL.ipa.c_hidden = 32
SMALL_MODEL.ipa.c_skip = 16
SMALL_MODEL.ipa.no_heads = 4
SMALL_MODEL.ipa.no_qk_points = 4
SMALL_MODEL.ipa.no_v_points = 6
SMALL_MODEL.ipa.num_blocks = 2
SMALL_MODEL.ipa.seq_tfmr_num_layers = 1
SMALL_MODEL.ipa.seq_tfmr_num_heads = 4


def make_feats(rng, B=1, N=16, n_fixed=6):
    trans = rng.normal(size=(B, N, 3)).astype(np.float32) * 5
    qs = rng.normal(size=(B, N, 4)).astype(np.float32)
    qs /= np.linalg.norm(qs, axis=-1, keepdims=True)
    rigids_t7 = np.concatenate([qs, trans], axis=-1)
    fixed = np.zeros((B, N), np.float32)
    fixed[:, :n_fixed] = 1.0
    return {
        "res_mask": jnp.ones((B, N), jnp.float32),
        "fixed_mask": jnp.asarray(fixed),
        "seq_idx": jnp.tile(jnp.arange(N)[None], (B, 1)),
        "t": jnp.full((B,), 0.5),
        "sc_ca_t": jnp.asarray(trans),
        "rigids_t": jnp.asarray(rigids_t7),
        "torsion_angles_sin_cos": jnp.asarray(
            rng.normal(size=(B, N, 7, 2)).astype(np.float32)
        ),
        "aatype": jnp.asarray(rng.integers(0, 20, size=(B, N)), jnp.int32),
    }


@pytest.fixture(scope="module")
def model_and_params():
    diffuser = SE3Diffuser(DiffuserConfig(so3=SMALL_SO3))
    model = ScoreNetwork(SMALL_MODEL, diffuser, inpainting=True)
    rng = np.random.default_rng(0)
    feats = make_feats(rng)
    params = model.init(jax.random.PRNGKey(0), feats)
    return model, params


class TestEmbeddings:
    def test_timestep_embedding_shape_and_range(self):
        emb = get_timestep_embedding(jnp.asarray([0.1, 0.9]), 32)
        assert emb.shape == (2, 32)
        assert np.abs(np.asarray(emb)).max() <= 1.0 + 1e-6

    def test_index_embedding(self):
        emb = get_index_embedding(jnp.arange(8)[None], 32)
        assert emb.shape == (1, 8, 32)

    def test_distogram_one_hot(self):
        pos = jnp.asarray(np.random.default_rng(0).normal(size=(1, 6, 3)) * 5)
        dg = np.asarray(calc_distogram(pos, 1e-5, 20.0, 22))
        assert dg.shape == (1, 6, 6, 22)
        off_diag = dg.sum(-1)[0][~np.eye(6, dtype=bool)]
        assert np.all(off_diag == 1.0)  # every pair falls in exactly one bin


class TestScoreNetwork:
    def test_output_shapes(self, model_and_params):
        model, params = model_and_params
        rng = np.random.default_rng(1)
        feats = make_feats(rng)
        out = model.apply(params, feats)
        B, N = feats["res_mask"].shape
        assert out["psi"].shape == (B, N, 2)
        assert out["rot_score"].shape == (B, N, 3)
        assert out["trans_score"].shape == (B, N, 3)
        assert out["rigids"].shape == (B, N, 7)
        assert out["atom37"].shape == (B, N, 37, 3)
        assert out["atom14"].shape == (B, N, 14, 3)
        for v in out.values():
            assert np.isfinite(np.asarray(v)).all()

    def test_fixed_frames_unchanged(self, model_and_params):
        # The diffuse-mask-gated backbone update must leave fixed residue
        # frames exactly at their input values (the fork's key delta).
        model, params = model_and_params
        rng = np.random.default_rng(2)
        feats = make_feats(rng, n_fixed=6)
        out = model.apply(params, feats)
        got = np.asarray(out["rigids"])[:, :6, 4:]
        expected = np.asarray(feats["rigids_t"])[:, :6, 4:]
        np.testing.assert_allclose(got, expected, atol=1e-5)

    def test_fixed_psi_from_ground_truth(self, model_and_params):
        model, params = model_and_params
        rng = np.random.default_rng(3)
        feats = make_feats(rng, n_fixed=6)
        out = model.apply(params, feats)
        gt_psi = np.asarray(feats["torsion_angles_sin_cos"])[:, :6, 2, :]
        np.testing.assert_allclose(np.asarray(out["psi"])[:, :6], gt_psi, atol=1e-6)

    def test_se3_invariance_of_scores(self, model_and_params):
        """Global rigid transforms of the input frames must leave rot/trans
        scores (computed in local/residual terms) consistent: the trunk is
        built from invariant features only."""
        model, params = model_and_params
        rng = np.random.default_rng(4)
        feats = make_feats(rng)
        out1 = model.apply(params, feats)

        # Apply a global rotation+translation to input frames and sc_ca.
        gq = quat_ops.from_rotvec(jnp.asarray([0.3, -0.5, 0.8]))
        g = Rigid(gq[None, None], jnp.asarray([[[4.0, -2.0, 7.0]]]))
        r_in = Rigid.from_tensor7(feats["rigids_t"])
        r_moved = g.compose(r_in)
        feats2 = dict(feats)
        feats2["rigids_t"] = r_moved.to_tensor7()
        feats2["sc_ca_t"] = g.apply(feats["sc_ca_t"])
        out2 = model.apply(params, feats2)

        # psi is invariant; rot score transforms covariantly in axis-angle;
        # its norm is invariant.
        np.testing.assert_allclose(
            np.asarray(out1["psi"]), np.asarray(out2["psi"]), atol=2e-3
        )
        n1 = np.linalg.norm(np.asarray(out1["rot_score"]), axis=-1)
        n2 = np.linalg.norm(np.asarray(out2["rot_score"]), axis=-1)
        np.testing.assert_allclose(n1, n2, rtol=2e-2, atol=2e-3)

    def test_res_mask_zeroes_outputs(self, model_and_params):
        model, params = model_and_params
        rng = np.random.default_rng(5)
        feats = make_feats(rng)
        mask = np.ones((1, 16), np.float32)
        mask[:, 12:] = 0.0
        feats["res_mask"] = jnp.asarray(mask)
        out = model.apply(params, feats)
        np.testing.assert_allclose(np.asarray(out["rot_score"])[:, 12:], 0.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(out["trans_score"])[:, 12:], 0.0, atol=1e-6)

    def test_jit_forward(self, model_and_params):
        model, params = model_and_params
        rng = np.random.default_rng(6)
        feats = make_feats(rng)
        fwd = jax.jit(lambda p, f: model.apply(p, f))
        out = fwd(params, feats)
        assert np.isfinite(np.asarray(out["rigids"])).all()


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
