"""Training step tests: finite grads, loss decreases, dp-mesh sharding."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from framedipt_tpu.diffusion import SE3Diffuser
from framedipt_tpu.model import ScoreNetwork
from framedipt_tpu.parallel import make_mesh, shard_batch
from framedipt_tpu.tools.config import Config, SO3Config
from framedipt_tpu.train.loop import (
    build_train_step,
    init_train_state,
    make_optimizer,
)


def tiny_cfg() -> Config:
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
    cfg.experiment.learning_rate = 1e-3
    return cfg


def make_batch(B=2, N=10, seed=0):
    rng = np.random.default_rng(seed)
    # Clean frames on a smooth random walk so x0 losses have structure.
    trans = np.cumsum(rng.normal(size=(B, N, 3)), axis=1).astype(np.float32) * 2
    trans -= trans.mean(axis=1, keepdims=True)
    qs = rng.normal(size=(B, N, 4)).astype(np.float32)
    qs /= np.linalg.norm(qs, axis=-1, keepdims=True)
    fixed = np.zeros((B, N), np.float32)
    fixed[:, :3] = 1.0
    return {
        "rigids_0": jnp.asarray(np.concatenate([qs, trans], -1)),
        "res_mask": jnp.ones((B, N), jnp.float32),
        "fixed_mask": jnp.asarray(fixed),
        "seq_idx": jnp.tile(jnp.arange(N)[None], (B, 1)),
        "torsion_angles_sin_cos": jnp.asarray(
            rng.normal(size=(B, N, 7, 2)).astype(np.float32)
        ),
        "aatype": jnp.asarray(rng.integers(0, 20, size=(B, N)), jnp.int32),
    }


@pytest.fixture(scope="module")
def trainer():
    cfg = tiny_cfg()
    diffuser = SE3Diffuser(cfg.diffuser)
    model = ScoreNetwork(cfg.model, diffuser, inpainting=True)
    optimizer = make_optimizer(cfg.experiment.learning_rate)
    batch = make_batch()
    state = init_train_state(model, optimizer, batch, jax.random.PRNGKey(0))
    step = jax.jit(build_train_step(model, diffuser, cfg, optimizer))
    return state, step, batch


def test_one_step_finite(trainer):
    state, step, batch = trainer
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["grad_norm"]))
    assert int(new_state.step) == 1


def test_loss_decreases(trainer):
    state, step, batch = trainer
    key = jax.random.PRNGKey(2)
    first_losses, last_losses = [], []
    for i in range(30):
        key, sub = jax.random.split(key)
        state, metrics = step(state, batch, sub)
        loss = float(metrics["loss"])
        assert np.isfinite(loss), f"loss diverged at step {i}"
        if i < 5:
            first_losses.append(loss)
        if i >= 25:
            last_losses.append(loss)
    assert np.mean(last_losses) < np.mean(first_losses), (
        f"loss did not decrease: {np.mean(first_losses):.3f} -> "
        f"{np.mean(last_losses):.3f}"
    )


@pytest.mark.slow
def test_dp_mesh_sharded_step():
    cfg = tiny_cfg()
    diffuser = SE3Diffuser(cfg.diffuser)
    model = ScoreNetwork(cfg.model, diffuser, inpainting=True)
    optimizer = make_optimizer()
    batch = make_batch(B=8, N=8)
    state = init_train_state(model, optimizer, batch, jax.random.PRNGKey(0))
    step = jax.jit(build_train_step(model, diffuser, cfg, optimizer))

    mesh = make_mesh(jax.devices("cpu")[:4], dp_size=4)
    with mesh:
        state = jax.device_put(
            state, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
        )
        sharded = shard_batch(mesh, batch)
        new_state, metrics = step(state, sharded, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["loss"]))
    # Batch really is sharded across dp.
    shard_shapes = {
        s.data.shape for s in sharded["rigids_0"].addressable_shards
    }
    assert shard_shapes == {(2, 8, 7)}


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
