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


@pytest.mark.parametrize("mode", ["max", "next"])
def test_recycle_enabled_step_finite(mode):
    """Training-time recycling (ref experiments/utils.py:440-508): the step
    must run with finite loss/grads, with score targets recomputed against
    the recycled x_t rather than the original forward_marginal draw."""
    cfg = tiny_cfg()
    cfg.experiment.recycle.enabled = True
    cfg.experiment.recycle.mode = mode
    diffuser = SE3Diffuser(cfg.diffuser)
    model = ScoreNetwork(cfg.model, diffuser, inpainting=True)
    optimizer = make_optimizer(cfg.experiment.learning_rate)
    batch = make_batch()
    state = init_train_state(model, optimizer, batch, jax.random.PRNGKey(0))
    step = jax.jit(build_train_step(model, diffuser, cfg, optimizer))
    _, metrics = step(state, batch, jax.random.PRNGKey(7))
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["grad_norm"]))


def test_calc_scores_consistent_with_forward_marginal():
    """The recycle path recomputes score targets via calc_{trans,rot}_score
    on the recycled rigids (train/loop.py loss_fn). That is only valid if
    those closed forms reproduce forward_marginal's own reported scores when
    fed its own draw — assert that identity here."""
    cfg = tiny_cfg()
    diffuser = SE3Diffuser(cfg.diffuser)
    batch = make_batch(B=2, N=6, seed=3)
    from framedipt_tpu.geometry.rigid import Rigid

    t = jnp.asarray([0.3, 0.8])
    marg = jax.vmap(
        lambda k, r7, ti: diffuser.forward_marginal(
            k, Rigid.from_tensor7(r7), ti
        )
    )(jax.random.split(jax.random.PRNGKey(5), 2), batch["rigids_0"], t)
    r_t7 = marg.rigids_t.to_tensor7()
    trans_again = diffuser.calc_trans_score(
        r_t7[..., 4:], batch["rigids_0"][..., 4:], t
    )
    rot_again = diffuser.calc_rot_score(
        r_t7[..., :4], batch["rigids_0"][..., :4], t
    )
    np.testing.assert_allclose(
        np.asarray(trans_again), np.asarray(marg.trans_score),
        rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(rot_again), np.asarray(marg.rot_score),
        rtol=1e-3, atol=1e-3,
    )


def test_importance_weighting_keeps_raw_history(trainer):
    """Under importance-sampled timesteps the sampler history must be fed
    the RAW per-example loss (improved-DDPM recipe), while the optimized
    loss is the 1/p-weighted one."""
    state, step, batch = trainer
    b = int(batch["res_mask"].shape[0])
    weighted = dict(batch)
    weighted["t"] = jnp.asarray(np.linspace(0.2, 0.9, b), jnp.float32)
    weighted["loss_weight"] = jnp.asarray([0.5, 2.0][:b], jnp.float32)
    _, metrics = step(state, weighted, jax.random.PRNGKey(11))
    raw = np.asarray(metrics["raw_per_example_loss"])
    per_ex = np.asarray(metrics["per_example_loss"])
    np.testing.assert_allclose(
        per_ex, raw * np.asarray(weighted["loss_weight"]), rtol=1e-6
    )
    np.testing.assert_allclose(
        float(metrics["total_loss"]), per_ex.mean(), rtol=1e-6
    )
    assert not np.allclose(raw, per_ex)


def test_dist_mat_loss_normalized_by_local_pairs():
    """The <6A restriction lives in the MASK: far pairs contribute neither
    error nor denominator. Normalizing by all valid pairs would shrink the
    auxiliary by the local/total ratio and vanish for long proteins."""
    from framedipt_tpu.train.losses import score_matching_losses

    cfg = tiny_cfg()
    B, N = 1, 3
    # Residues 10A apart (all inter-residue pairs excluded); 5 bb atoms per
    # residue spaced 0.5A apart along x (all intra pairs < 6A included).
    gt = np.zeros((B, N, 14, 3), np.float32)
    for i in range(N):
        for j in range(5):
            gt[0, i, j, 0] = 10.0 * i + 0.5 * j
    pred_atoms = gt.copy()
    pred_atoms[0, 0, 0, 1] += 1.0  # perturb one atom off-axis
    zeros_bn3 = jnp.zeros((B, N, 3), jnp.float32)
    rigids = jnp.concatenate(
        [jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (B, N, 1)), zeros_bn3], -1
    )
    batch = {
        "t": jnp.zeros((B,), jnp.float32),  # below every t-filter
        "res_mask": jnp.ones((B, N), jnp.float32),
        "fixed_mask": jnp.zeros((B, N), jnp.float32),
        "trans_score": zeros_bn3,
        "rot_score": zeros_bn3,
        "trans_score_scaling": jnp.ones((B,), jnp.float32),
        "rot_score_scaling": jnp.ones((B,), jnp.float32),
        "rigids_0": rigids,
        "atom14_gt": jnp.asarray(gt),
    }
    pred = {
        "trans_score": zeros_bn3,
        "rot_score": zeros_bn3,
        "rigids": rigids,
        "atom14": jnp.asarray(pred_atoms),
    }
    _, terms = score_matching_losses(pred, batch, cfg.experiment)
    # Hand-computed: only pairs (res0 atom0, res0 atom j!=0), both
    # directions, change distance; every local ordered intra-residue pair
    # counts in the denominator: 3 residues x 5x4 = 60.
    err = sum(
        (np.sqrt((0.5 * j) ** 2 + 1.0) - 0.5 * j) ** 2 for j in range(1, 5)
    )
    expected = (
        2 * err / 60.0
        * cfg.experiment.dist_mat_loss_weight
    )
    np.testing.assert_allclose(
        float(terms["dist_mat_loss"]), expected, rtol=1e-4
    )


def test_batches_bucket_by_rerolled_length():
    """batches() must featurize first and bucket by the ACTUAL drawn length:
    a cache-evicted example re-rolls its single-chain draw, so a length
    remembered from a previous epoch can undershoot the new draw."""
    from framedipt_tpu.data import features as feature_lib
    from framedipt_tpu.experiments.train import _BATCH_KEYS, TrainDataset

    lengths = iter([10, 70, 30, 130])  # re-rolled draws across two epochs

    def fake_example(idx):
        n = next(lengths)
        return {
            "rigids_0": np.zeros((n, 7), np.float32),
            "res_mask": np.ones((n,), np.float32),
            "fixed_mask": np.zeros((n,), np.float32),
            "seq_idx": np.arange(n, dtype=np.int32),
            "torsion_angles_sin_cos": np.zeros((n, 7, 2), np.float32),
            "aatype": np.zeros((n,), np.int32),
        }

    import pandas as pd

    ds = object.__new__(TrainDataset)
    ds.meta = pd.DataFrame({"processed_path": ["a", "b"]})
    ds.rng = np.random.default_rng(0)
    ds.sample_weights = None
    ds.cfg = tiny_cfg()
    ds.example = fake_example

    got = []
    for epoch in range(2):
        for b in ds.batches(batch_size=4):
            assert set(b) == set(_BATCH_KEYS)
            got.append(b["res_mask"].shape)
    # Each example padded to the bucket of its own drawn length.
    padded = sorted(s[1] for s in got)
    assert padded == [64, 64, 128, 192]


def test_training_eval_sampling(tmp_path):
    """Periodic in-training eval (config contract eval_freq/eval_dir,
    ref base.yaml:110-112): unconditional samples at bucket-padded eval
    lengths, PDBs written under eval_dir/step_<k>/, finite aggregate
    plausibility metrics."""
    from framedipt_tpu.train.eval_sampling import (
        build_eval_sampler,
        eval_lengths,
        run_training_eval,
    )

    cfg = tiny_cfg()
    cfg.data.num_t = 3
    cfg.data.filtering.min_len = 8
    cfg.data.filtering.max_len = 20
    cfg.data.num_eval_lengths = 2
    cfg.data.samples_per_eval_length = 2
    cfg.experiment.eval_dir = str(tmp_path / "eval")
    # Inpainting model: its embedder consumes aatype, so the eval feats must
    # carry the all-UNK aatype or the first eval boundary crashes mid-run.
    cfg.experiment.inpainting = True
    # Chunked sampling: 2 samples in chunks of 1 (eval_batch_size bound).
    cfg.experiment.eval_batch_size = 1

    assert eval_lengths(cfg) == [8, 20]

    diffuser = SE3Diffuser(cfg.diffuser)
    model = ScoreNetwork(cfg.model, diffuser, inpainting=True)
    batch = make_batch()
    state = init_train_state(
        model, make_optimizer(), batch, jax.random.PRNGKey(0)
    )
    run = build_eval_sampler(model, diffuser, cfg)
    agg = run_training_eval(
        run, diffuser, cfg, state.params, step=7, key=jax.random.PRNGKey(1)
    )
    for k, v in agg.items():
        assert np.isfinite(v), k
    assert "eval_ca_ca_deviation" in agg
    assert "eval_helix_percent" in agg
    for length in (8, 20):
        ldir = tmp_path / "eval" / "step_7" / f"length_{length}"
        pdbs = sorted(ldir.glob("sample_*.pdb"))
        assert len(pdbs) == 2, ldir
        from framedipt_tpu.data.protein import from_pdb_string

        prot = from_pdb_string(pdbs[0].read_text())
        assert len(prot.aatype) == length  # bucket padding sliced off


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


def test_train_step_pallas_bwd_matches_xla():
    """One full train step (noising + forward + DSM losses + Adam update)
    through the fused Pallas backward (pallas_bwd_impl='pallas', interpret)
    must produce the same loss and updated parameters as the plain XLA
    path from identical params/batch/key — the whole-training-step
    equivalence of the kernel backward, beyond per-module grad parity."""
    import dataclasses

    from jax.experimental.pallas import tpu as pltpu

    cfg = tiny_cfg()
    # tiny_cfg uses num_blocks=1, which has NO edge transition (they sit
    # between blocks) — 2 blocks puts one kernel call on the path.
    cfg.model.ipa.num_blocks = 2
    diffuser = SE3Diffuser(cfg.diffuser)
    batch = make_batch()
    key = jax.random.PRNGKey(3)

    model_xla = ScoreNetwork(cfg.model, diffuser, inpainting=True)
    optimizer = make_optimizer(cfg.experiment.learning_rate)
    state = init_train_state(model_xla, optimizer, batch, jax.random.PRNGKey(0))
    step_xla = jax.jit(build_train_step(model_xla, diffuser, cfg, optimizer))
    new_xla, m_xla = step_xla(state, batch, key)

    mc = dataclasses.replace(cfg.model)
    mc.ipa = dataclasses.replace(
        cfg.model.ipa,
        use_pallas_kernel=True,
        pallas_bwd_impl="pallas",
        pallas_interpret=True,
        pallas_tile_i=8,
        pallas_tile_j=128,
    )
    model_pallas = ScoreNetwork(mc, diffuser, inpainting=True)
    step_pallas = jax.jit(build_train_step(model_pallas, diffuser, cfg, optimizer))
    with pltpu.force_tpu_interpret_mode():
        new_pallas, m_pallas = step_pallas(state, batch, key)

    np.testing.assert_allclose(
        float(m_pallas["loss"]), float(m_xla["loss"]), rtol=1e-5
    )
    flat_x = jax.tree_util.tree_leaves(new_xla.params)
    flat_p = jax.tree_util.tree_leaves(new_pallas.params)
    assert len(flat_x) == len(flat_p)
    for a, b in zip(flat_x, flat_p):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=5e-4
        )
