"""Multi-chip inference: the batched sampler with samples sharded over the
mesh dp axis — each device runs its samples' trajectories in parallel."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from framedipt_tpu.diffusion import SE3Diffuser
from framedipt_tpu.model import ScoreNetwork
from framedipt_tpu.parallel import make_mesh, shard_batch
from framedipt_tpu.sampling import build_inference_fn
from framedipt_tpu.tools.config import DiffuserConfig
from tests.unit.test_sampling import SMALL_MODEL, SMALL_SO3, N


@pytest.mark.slow
def test_sampler_batch_sharded_over_mesh():
    diffuser = SE3Diffuser(DiffuserConfig(so3=SMALL_SO3))
    model = ScoreNetwork(SMALL_MODEL, diffuser, inpainting=True)
    B = 4  # one sample per device
    rng = np.random.default_rng(0)
    trans = rng.normal(size=(B, N, 3)).astype(np.float32) * 4
    qs = rng.normal(size=(B, N, 4)).astype(np.float32)
    qs /= np.linalg.norm(qs, axis=-1, keepdims=True)
    fixed = np.zeros((B, N), np.float32)
    fixed[:, :4] = 1.0
    feats = {
        "res_mask": np.ones((B, N), np.float32),
        "fixed_mask": fixed,
        "seq_idx": np.tile(np.arange(N)[None], (B, 1)),
        "t": np.ones((B,), np.float32),
        "sc_ca_t": np.zeros((B, N, 3), np.float32),
        "rigids_t": np.concatenate([qs, trans], -1),
        "torsion_angles_sin_cos": rng.normal(size=(B, N, 7, 2)).astype(np.float32),
        "aatype": rng.integers(0, 20, size=(B, N)).astype(np.int32),
    }
    params = model.init(
        jax.random.PRNGKey(0), {k: jnp.asarray(v) for k, v in feats.items()}
    )
    run = build_inference_fn(
        model, diffuser, num_t=3, min_t=0.01, noise_scale=0.1, inpainting=True
    )

    mesh = make_mesh(jax.devices("cpu")[:4], dp_size=4)
    with mesh:
        sharded_feats = shard_batch(mesh, feats)
        # Batch really is sharded one-sample-per-device.
        shards = {
            s.data.shape for s in sharded_feats["rigids_t"].addressable_shards
        }
        assert shards == {(1, N, 7)}
        out = run(params, sharded_feats, jax.random.PRNGKey(1))
        final = np.asarray(out["final_rigids"])
    assert final.shape == (B, N, 7)
    assert np.isfinite(final).all()

    # Same math as the unsharded run.
    out_single = run(
        params, {k: jnp.asarray(v) for k, v in feats.items()}, jax.random.PRNGKey(1)
    )
    np.testing.assert_allclose(
        final, np.asarray(out_single["final_rigids"]), atol=2e-5
    )


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
