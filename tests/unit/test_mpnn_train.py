"""TPU-native MPNN training step vs the reference training contract.

Reference: ProteinMPNN/training/model_utils.py (loss_smoothed :140-150,
loss_nll :128-137, NoamOpt/get_std_opt :474-511) and training.py (noise
augmentation :83, per-step random decoding order :150-162).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from framedipt_tpu.model import mpnn
from framedipt_tpu.train import mpnn_train

from .mpnn_helpers import synth_structure

CFG = mpnn.MPNNConfig(
    hidden_dim=32, num_encoder_layers=1, num_decoder_layers=1, k_neighbors=8
)


def _batch() -> dict:
    feats = synth_structure()
    return {
        "X": jnp.asarray(feats["X"]),
        "S": jnp.asarray(feats["S"]),
        "mask": jnp.asarray(feats["mask"]),
        "chain_M": jnp.asarray(feats["chain_M"]),
        "residue_idx": jnp.asarray(feats["residue_idx"]),
        "chain_encoding_all": jnp.asarray(feats["chain_encoding_all"]),
    }


def test_noam_schedule_matches_reference_formula():
    """NoamOpt.rate (model_utils.py:498-505): factor * d^-0.5 *
    min(step^-0.5, step * warmup^-1.5), step 1-indexed (rate is called
    after _step += 1 — optax count 0 is torch step 1)."""
    sched = mpnn_train.noam_schedule(128, factor=2.0, warmup=4000)
    for count in [0, 1, 99, 3999, 4000, 100000]:
        step = count + 1
        want = 2.0 * 128 ** -0.5 * min(step ** -0.5, step * 4000 ** -1.5)
        np.testing.assert_allclose(float(sched(count)), want, rtol=1e-6)
    # Ramp up during warmup, peak at warmup, decay after.
    assert float(sched(0)) < float(sched(3999))
    assert float(sched(3999)) > float(sched(100000))


def test_smoothed_loss_reference_formula():
    """loss_smoothed (model_utils.py:140-150): smoothed one-hot target,
    -(q * log_p).sum(-1), masked sum / fixed 2000."""
    rng = np.random.default_rng(0)
    s = rng.integers(0, 21, (2, 9))
    logits = rng.normal(size=(2, 9, 21))
    log_p = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    mask = (rng.random((2, 9)) > 0.3).astype(np.float64)

    q = np.eye(21)[s] + 0.1 / 21.0
    q = q / q.sum(-1, keepdims=True)
    want = ((-(q * log_p).sum(-1)) * mask).sum() / 2000.0

    got = mpnn_train.smoothed_loss(
        jnp.asarray(s), jnp.asarray(log_p, jnp.float32), jnp.asarray(mask, jnp.float32)
    )
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_nll_and_accuracy():
    s = jnp.asarray([[0, 1, 2]])
    # Peaked log-probs: correct at positions 0,1, wrong at 2 (masked out).
    lp = jnp.full((1, 3, 21), -20.0)
    lp = lp.at[0, 0, 0].set(-0.01).at[0, 1, 1].set(-0.01).at[0, 2, 5].set(-0.01)
    mask = jnp.asarray([[1.0, 1.0, 0.0]])
    nll, acc = mpnn_train.nll_and_accuracy(s, lp, mask)
    np.testing.assert_allclose(float(nll), 0.01, atol=1e-3)
    np.testing.assert_allclose(float(acc), 1.0, atol=1e-6)


def test_train_step_learns_and_stays_finite():
    """40 steps on one synthetic two-chain batch: smoothed loss and NLL
    decrease, recovery rises above chance (1/21), nothing goes non-finite
    (the reference trains with noise + random orders — same here, so the
    loss is stochastic; compare first-5 vs last-5 means). Dropout off:
    this test checks optimization mechanics, and 40 steps is too few to
    overfit through the default 0.1 dropout (covered separately by
    test_dropout_training_only_semantics)."""
    import dataclasses

    cfg = dataclasses.replace(CFG, dropout=0.0)
    batch = _batch()
    state = mpnn_train.init_train_state(jax.random.PRNGKey(0), cfg)
    step = mpnn_train.make_mpnn_train_step(cfg)
    key = jax.random.PRNGKey(1)
    hist = []
    for i in range(40):
        state, metrics = step(state, batch, jax.random.fold_in(key, i))
        m = {k: float(v) for k, v in metrics.items()}
        assert np.isfinite(list(m.values())).all(), f"non-finite at {i}: {m}"
        hist.append(m)
    first = np.mean([h["nll"] for h in hist[:5]])
    last = np.mean([h["nll"] for h in hist[-5:]])
    assert last < first, (first, last)
    assert hist[-1]["accuracy"] > 1.0 / 21.0
    # Noam warmup: lr strictly increasing over these early steps.
    assert hist[-1]["lr"] > hist[0]["lr"]


def test_eval_step_deterministic_and_noise_free():
    """Validation (training.py:174-188) uses no backbone noise: same key
    -> bit-identical metrics; train cfg's augment_eps must NOT leak in."""
    batch = _batch()
    params = mpnn.init_mpnn_params(jax.random.PRNGKey(0), CFG)
    eval_step = mpnn_train.make_mpnn_eval_step(CFG)
    m1 = eval_step(params, batch, jax.random.PRNGKey(7))
    m2 = eval_step(params, batch, jax.random.PRNGKey(7))
    assert float(m1["nll"]) == float(m2["nll"])
    assert float(m1["accuracy"]) == float(m2["accuracy"])


def test_train_cfg_applies_backbone_noise():
    """augment_eps=0.2 is forced on for training (training.py:83,231):
    two different noise keys at the SAME decoding order give different
    losses, while eval (no noise) is key-invariant given the order."""
    batch = _batch()
    params = mpnn.init_mpnn_params(jax.random.PRNGKey(0), CFG)
    randn = jax.random.normal(jax.random.PRNGKey(3), batch["S"].shape)
    cfg_noise = mpnn.MPNNConfig(
        hidden_dim=32, num_encoder_layers=1, num_decoder_layers=1,
        k_neighbors=8, augment_eps=0.2,
    )

    def lp(cfg, key):
        return mpnn.mpnn_log_probs(
            params, batch["X"], batch["S"], batch["mask"], batch["chain_M"],
            batch["residue_idx"], batch["chain_encoding_all"], cfg,
            randn=randn, key=key,
        )

    a = lp(cfg_noise, jax.random.PRNGKey(1))
    b = lp(cfg_noise, jax.random.PRNGKey(2))
    assert not np.allclose(np.asarray(a), np.asarray(b))
    c = lp(CFG, jax.random.PRNGKey(1))
    d = lp(CFG, jax.random.PRNGKey(2))
    np.testing.assert_array_equal(np.asarray(c), np.asarray(d))


def test_state_dict_export_roundtrip():
    """mpnn_state_dict_from_params is the exact inverse of
    convert_mpnn_state_dict: params -> reference-named flat dict ->
    params, bit-identical — so .npz checkpoints trained here load through
    the same path as converted reference weights."""
    params = mpnn.init_mpnn_params(jax.random.PRNGKey(4), CFG)
    sd = mpnn.mpnn_state_dict_from_params(params)
    back = mpnn.convert_mpnn_state_dict(sd)
    flat_a, tree_a = jax.tree_util.tree_flatten(params)
    flat_b, tree_b = jax.tree_util.tree_flatten(back)
    assert tree_a == tree_b
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Reference naming, spot-checked (so the torch runner could load it).
    assert "encoder_layers.0.W1.weight" in sd
    assert "features.norm_edges.bias" in sd
    assert sd["W_out.weight"].shape == (21, CFG.hidden_dim)


def test_dropout_training_only_semantics():
    """EncLayer/DecLayer dropout (utils :605-614): active iff a
    dropout_key is threaded (torch train() vs eval()); deterministic
    under a fixed key; identity at rate 0 and whenever no key is given
    (every inference path)."""
    b = _batch()
    params = mpnn.init_mpnn_params(jax.random.PRNGKey(0), CFG)
    randn = jax.random.normal(jax.random.PRNGKey(1), b["S"].shape)
    args = (params, b["X"], b["S"], b["mask"], b["chain_M"],
            b["residue_idx"], b["chain_encoding_all"])

    base = mpnn.mpnn_log_probs(*args, CFG, randn=randn)
    # No key -> identity regardless of cfg.dropout (inference contract).
    assert CFG.dropout > 0
    again = mpnn.mpnn_log_probs(*args, CFG, randn=randn)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(again))

    dk = jax.random.PRNGKey(7)
    dropped = mpnn.mpnn_log_probs(*args, CFG, randn=randn, dropout_key=dk)
    # Dropout changes the output...
    assert not np.allclose(np.asarray(base), np.asarray(dropped))
    # ...deterministically under the same key...
    dropped2 = mpnn.mpnn_log_probs(*args, CFG, randn=randn, dropout_key=dk)
    np.testing.assert_array_equal(np.asarray(dropped), np.asarray(dropped2))
    # ...differently under another key...
    dropped3 = mpnn.mpnn_log_probs(
        *args, CFG, randn=randn, dropout_key=jax.random.PRNGKey(8)
    )
    assert not np.allclose(np.asarray(dropped), np.asarray(dropped3))
    # ...and rate 0 with a key is still identity.
    cfg0 = mpnn.MPNNConfig(
        hidden_dim=32, num_encoder_layers=1, num_decoder_layers=1,
        k_neighbors=8, dropout=0.0,
    )
    off = mpnn.mpnn_log_probs(*args, cfg0, randn=randn, dropout_key=dk)
    base0 = mpnn.mpnn_log_probs(*args, cfg0, randn=randn)
    np.testing.assert_array_equal(np.asarray(off), np.asarray(base0))


def test_gradient_norm_clip_flag():
    """--gradient_norm (training.py:239): negative = off (update equals
    plain Noam Adam), positive = clip_by_global_norm prepended."""
    b = _batch()
    key = jax.random.PRNGKey(3)
    opt_off = mpnn_train.make_mpnn_optimizer(CFG, gradient_norm=-1.0)
    opt_clip = mpnn_train.make_mpnn_optimizer(CFG, gradient_norm=1e-6)
    s_off = mpnn_train.init_train_state(jax.random.PRNGKey(0), CFG, opt_off)
    s_clip = mpnn_train.init_train_state(jax.random.PRNGKey(0), CFG, opt_clip)
    # The step donates its state arg — snapshot the initial params first.
    p0 = jax.tree.map(lambda x: np.asarray(x).copy(), s_off.params)
    step_off = mpnn_train.make_mpnn_train_step(CFG, opt_off)
    step_clip = mpnn_train.make_mpnn_train_step(CFG, opt_clip)
    s_off1, m_off = step_off(s_off, b, key)
    s_clip1, m_clip = step_clip(s_clip, b, key)
    # Same grads either way (clip acts on the update, not the metric)...
    np.testing.assert_allclose(
        float(m_off["grad_norm"]), float(m_clip["grad_norm"]), rtol=1e-5
    )
    # ...but a tiny clip norm must shrink the applied update.
    d_off = jax.tree.reduce(
        lambda a, x: a + float(jnp.sum(jnp.abs(x))),
        jax.tree.map(lambda a, c: np.asarray(a) - c, s_off1.params, p0), 0.0,
    )
    d_clip = jax.tree.reduce(
        lambda a, x: a + float(jnp.sum(jnp.abs(x))),
        jax.tree.map(lambda a, c: np.asarray(a) - c, s_clip1.params, p0), 0.0,
    )
    assert d_clip < d_off
