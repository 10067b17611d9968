"""FSDP-axis parameter sharding on a (dp=2, fsdp=2) virtual mesh."""
import numpy as np
import pytest

import jax

from framedipt_tpu.diffusion import SE3Diffuser
from framedipt_tpu.model import ScoreNetwork
from framedipt_tpu.parallel import make_mesh, shard_batch
from framedipt_tpu.parallel.mesh import shard_params
from framedipt_tpu.train.loop import build_train_step, init_train_state, make_optimizer
from tests.unit.test_train import make_batch, tiny_cfg


@pytest.mark.slow
def test_fsdp_sharded_train_step():
    cfg = tiny_cfg()
    diffuser = SE3Diffuser(cfg.diffuser)
    model = ScoreNetwork(cfg.model, diffuser, inpainting=True)
    opt = make_optimizer()
    batch = make_batch(B=4, N=8)
    state = init_train_state(model, opt, batch, jax.random.PRNGKey(0))
    mesh = make_mesh(jax.devices("cpu")[:4], dp_size=2, fsdp_size=2)
    with mesh:
        sharded_params = shard_params(mesh, state.params)
        leaves = jax.tree_util.tree_leaves(sharded_params)
        n_sharded = sum(
            1
            for leaf in leaves
            if {s.data.shape for s in leaf.addressable_shards} != {leaf.shape}
        )
        assert n_sharded > 0, "no parameter was sharded over fsdp"
        state = state._replace(
            params=sharded_params, opt_state=opt.init(sharded_params)
        )
        step = jax.jit(build_train_step(model, diffuser, cfg, opt))
        _, metrics = step(state, shard_batch(mesh, batch), jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


def test_make_mesh_takes_leading_slice_when_undersized():
    """Explicit dp*fsdp below the host device count runs on the leading
    slice (single-process; the reference's num_gpus-per-job semantics) —
    a bare dp_size=1 config must work on an 8-device host."""
    mesh = make_mesh(dp_size=1, fsdp_size=1)
    assert mesh.devices.shape == (1, 1)
    assert mesh.devices.flat[0] == jax.devices()[0]
    mesh2 = make_mesh(dp_size=2, fsdp_size=2)
    assert mesh2.devices.shape == (2, 2)
    with pytest.raises(ValueError):
        make_mesh(dp_size=len(jax.devices()) + 1, fsdp_size=2)
