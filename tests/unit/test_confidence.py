"""EigenFold confidence score: runs, finite, and orders an on-manifold
prediction above a wildly implausible one."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from framedipt_tpu.diffusion import SE3Diffuser
from framedipt_tpu.model import ScoreNetwork
from framedipt_tpu.sampling.confidence import logp_confidence_score
from tests.unit.test_sampling import SMALL_MODEL, SMALL_SO3, B, N
from framedipt_tpu.tools.config import DiffuserConfig


@pytest.fixture(scope="module")
def setup():
    diffuser = SE3Diffuser(DiffuserConfig(so3=SMALL_SO3))
    model = ScoreNetwork(SMALL_MODEL, diffuser, inpainting=True)
    rng = np.random.default_rng(0)
    trans = rng.normal(size=(B, N, 3)).astype(np.float32) * 3
    qs = rng.normal(size=(B, N, 4)).astype(np.float32)
    qs /= np.linalg.norm(qs, axis=-1, keepdims=True)
    fixed = np.zeros((B, N), np.float32)
    fixed[:, :4] = 1.0
    feats = {
        "res_mask": jnp.ones((B, N), jnp.float32),
        "fixed_mask": jnp.asarray(fixed),
        "seq_idx": jnp.tile(jnp.arange(N)[None], (B, 1)),
        "sc_ca_t": jnp.zeros((B, N, 3)),
        "torsion_angles_sin_cos": jnp.asarray(
            rng.normal(size=(B, N, 7, 2)).astype(np.float32)
        ),
        "aatype": jnp.asarray(rng.integers(0, 20, size=(B, N)), jnp.int32),
        "rigids_t": jnp.asarray(np.concatenate([qs, trans], -1)),
        "t": jnp.ones((B,)),
    }
    params = model.init(jax.random.PRNGKey(0), feats)
    diffuse_mask = ((1 - fixed) * np.ones((B, N))).astype(np.float32)
    return model, diffuser, params, feats, qs, trans, diffuse_mask


def test_confidence_finite_and_discriminative(setup):
    model, diffuser, params, feats, qs, trans, diffuse_mask = setup
    final = np.concatenate([qs, trans], -1)
    score_good = logp_confidence_score(
        model, params, diffuser, feats, final, diffuse_mask,
        num_t=4, min_t=0.01, key=jax.random.PRNGKey(1),
    )
    assert np.isfinite(float(score_good))

    # An absurdly displaced prediction must be less likely.
    bad = final.copy()
    bad[..., 4:] += 500.0
    score_bad = logp_confidence_score(
        model, params, diffuser, feats, bad, diffuse_mask,
        num_t=4, min_t=0.01, key=jax.random.PRNGKey(1),
    )
    assert float(score_bad) < float(score_good)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
