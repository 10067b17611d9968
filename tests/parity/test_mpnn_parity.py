"""Offline torch-parity for the TPU-native ProteinMPNN.

Replays tests/parity/fixtures/recorded_mpnn_parity.npz (recorded by
scripts/record_mpnn_fixture.py against /root/reference/ProteinMPNN with
deterministically synthesized weights): regenerates the identical
state_dict from the committed (name, shape) manifest via
fixture_lib.synth_value, imports it through convert_mpnn_state_dict, and
compares every recorded activation. Zero skips, no torch needed.

Reference anchors: protein_mpnn_utils.py:1036 (forward), :1083 (sample),
:1332 (unconditional_probs), :18 (_scores).
"""
from __future__ import annotations

import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from framedipt_tpu.model import mpnn
from tests.parity.fixture_lib import synth_value

FIXTURE = pathlib.Path(__file__).parent / "fixtures/recorded_mpnn_parity.npz"


@pytest.fixture(scope="module")
def recorded():
    data = np.load(FIXTURE, allow_pickle=False)
    names = [str(n) for n in data["manifest_names"]]
    shapes = [
        tuple(int(x) for x in s.split(",")) for s in data["manifest_shapes"]
    ]
    sd = {
        n: synth_value(n, shape, seed=int(data["seed"]))
        for n, shape in zip(names, shapes)
    }
    params = jax.tree.map(
        jnp.asarray, mpnn.convert_mpnn_state_dict(sd)
    )
    cfg = mpnn.MPNNConfig(k_neighbors=48)
    feats = {
        k.removeprefix("in_"): data[k] for k in data.files if k.startswith("in_")
    }
    return data, params, cfg, feats


def test_forward_log_probs_random_order(recorded):
    data, params, cfg, f = recorded
    lp = mpnn.mpnn_log_probs(
        params, f["X"], f["S"], f["mask"], f["chain_M"], f["residue_idx"],
        f["chain_encoding_all"], cfg, randn=jnp.asarray(data["randn_fwd"]),
    )
    np.testing.assert_allclose(
        np.asarray(lp), data["log_probs_rand"], atol=2e-4, rtol=2e-4
    )


def test_forward_log_probs_fixed_order(recorded):
    data, params, cfg, f = recorded
    lp = mpnn.mpnn_log_probs(
        params, f["X"], f["S"], f["mask"], f["chain_M"], f["residue_idx"],
        f["chain_encoding_all"], cfg,
        decoding_order=jnp.asarray(data["order_fixed"]),
    )
    np.testing.assert_allclose(
        np.asarray(lp), data["log_probs_fixed"], atol=2e-4, rtol=2e-4
    )


def test_scores(recorded):
    data, params, cfg, f = recorded
    lp = mpnn.mpnn_log_probs(
        params, f["X"], f["S"], f["mask"], f["chain_M"], f["residue_idx"],
        f["chain_encoding_all"], cfg, randn=jnp.asarray(data["randn_fwd"]),
    )
    sc = mpnn.mpnn_scores(f["S"], lp, f["mask"] * f["chain_M"])
    np.testing.assert_allclose(np.asarray(sc), data["scores"], atol=2e-4)


def test_unconditional_log_probs(recorded):
    data, params, cfg, f = recorded
    lp = mpnn.mpnn_unconditional_log_probs(
        params, f["X"], f["mask"], f["residue_idx"], f["chain_encoding_all"],
        cfg,
    )
    np.testing.assert_allclose(
        np.asarray(lp), data["log_probs_uncond"], atol=2e-4, rtol=2e-4
    )


@pytest.mark.parametrize("backbone_only", [False, True])
def test_conditional_log_probs(recorded, backbone_only):
    """conditional_probs parity (utils :1272-1329): the chunked-lax.map
    TPU form must match the reference's per-position host loop, in both
    order conventions (target-last / target-first)."""
    data, params, cfg, f = recorded
    key = "log_probs_cond_bb" if backbone_only else "log_probs_cond"
    lp = mpnn.mpnn_conditional_log_probs(
        params, f["X"], f["S"], f["mask"], f["chain_M"], f["residue_idx"],
        f["chain_encoding_all"], cfg, randn=jnp.asarray(data["randn_cond"]),
        backbone_only=backbone_only, chunk=8,
    )
    np.testing.assert_allclose(
        np.asarray(lp), data[key], atol=2e-4, rtol=2e-4
    )
    # Non-designed rows are exact zeros (the reference only fills looped
    # positions, :1299).
    undesigned = (f["chain_M"] * f["mask"]) == 0
    assert np.all(np.asarray(lp)[undesigned] == 0.0)


def test_near_greedy_sample_matches_torch(recorded):
    """At temperature 1e-4 the per-step distribution is one-hot to fp
    precision, so torch.multinomial and jax.random.categorical both reduce
    to argmax — the sampled sequences and decoding order must match."""
    data, params, cfg, f = recorded
    out = jax.jit(
        lambda key: mpnn.mpnn_sample(
            params, key, jnp.asarray(f["X"]), jnp.asarray(data["randn_smp"]),
            jnp.asarray(f["S"]), jnp.asarray(f["chain_M"]),
            jnp.asarray(f["chain_encoding_all"]), jnp.asarray(f["residue_idx"]),
            jnp.asarray(f["mask"]), cfg, temperature=1e-4,
        )
    )(jax.random.PRNGKey(3))
    np.testing.assert_array_equal(
        np.asarray(out["decoding_order"]), data["sample_order"]
    )
    np.testing.assert_array_equal(np.asarray(out["S"]), data["sample_S"])


def test_pssm_restrained_probs_match_torch(recorded):
    """PSSM coef/bias mixing + log-odds mask renorm (utils :1147-1156).
    The mixing is in probability space, so per-draw S parity is impossible
    across RNGs — instead the fixture fixes every position but one, making
    that position's post-pssm probs row deterministic, and compares it."""
    data, params, cfg, f = recorded
    pos = int(data["pssm_pos"])
    chain_m_pos = np.zeros_like(f["chain_M"])
    chain_m_pos[:, pos] = 1.0
    out = jax.jit(
        lambda key: mpnn.mpnn_sample(
            params, key, jnp.asarray(f["X"]), jnp.asarray(data["randn_pssm"]),
            jnp.asarray(f["S"]), jnp.asarray(f["chain_M"]),
            jnp.asarray(f["chain_encoding_all"]), jnp.asarray(f["residue_idx"]),
            jnp.asarray(f["mask"]), cfg, temperature=0.2,
            chain_m_pos=jnp.asarray(chain_m_pos),
            pssm_coef=jnp.asarray(data["pssm_coef"]),
            pssm_bias=jnp.asarray(data["pssm_bias"]),
            pssm_multi=0.7,
            pssm_log_odds_mask=jnp.asarray(data["pssm_log_odds_mask"]),
        )
    )(jax.random.PRNGKey(5))
    probs = np.asarray(out["probs"])
    np.testing.assert_allclose(
        probs[:, pos], data["sample_pssm_probs"][:, pos],
        atol=2e-4, rtol=2e-4,
    )
    # every other row stayed zero (fixed positions, probs never written)
    rest = np.delete(probs, pos, axis=1)
    assert np.all(rest == 0.0)
    # and fixed positions copied S_true
    s = np.asarray(out["S"])
    keep = np.ones(s.shape[1], bool)
    keep[pos] = False
    np.testing.assert_array_equal(s[:, keep], f["S"][:, keep])


def test_tied_sample_matches_torch(recorded):
    """tied_sample parity (utils :1171-1267): the scan-over-groups form
    must reproduce the reference's host-loop sequences, flattened
    decoding order, and per-position probs at near-greedy temperature."""
    data, params, cfg, f = recorded
    tied_pos = tuple(tuple(int(x) for x in row) for row in data["tied_pos"])
    out = jax.jit(
        lambda key: mpnn.mpnn_tied_sample(
            params, key, jnp.asarray(f["X"]), jnp.asarray(data["randn_tied"]),
            jnp.asarray(f["S"]), jnp.asarray(f["chain_M"]),
            jnp.asarray(f["chain_encoding_all"]), jnp.asarray(f["residue_idx"]),
            jnp.asarray(f["mask"]), cfg, tied_pos, temperature=1e-4,
        )
    )(jax.random.PRNGKey(6))
    np.testing.assert_array_equal(
        np.asarray(out["decoding_order"]), data["sample_tied_order"]
    )
    np.testing.assert_array_equal(np.asarray(out["S"]), data["sample_tied_S"])
    np.testing.assert_allclose(
        np.asarray(out["probs"]), data["sample_tied_probs"],
        atol=2e-4, rtol=2e-4,
    )
    # Tied positions actually share one amino acid.
    s = np.asarray(out["S"])[0]
    for a, b in tied_pos:
        assert s[a] == s[b]


def test_sample_respects_masks_and_omit(recorded):
    """Invariants at a realistic temperature: visible/padded positions keep
    S_true, X (index 20) is never sampled at designed positions, probs rows
    are zero exactly where chain_mask is zero."""
    data, params, cfg, f = recorded
    chain_m = f["chain_M"].copy()
    chain_m[:, :10] = 0.0  # pretend the first 10 positions are visible
    out = mpnn.mpnn_sample(
        params, jax.random.PRNGKey(4), jnp.asarray(f["X"]),
        jnp.asarray(data["randn_smp"]), jnp.asarray(f["S"]),
        jnp.asarray(chain_m), jnp.asarray(f["chain_encoding_all"]),
        jnp.asarray(f["residue_idx"]), jnp.asarray(f["mask"]), cfg,
        temperature=0.2,
    )
    s = np.asarray(out["S"])
    eff = chain_m * f["mask"]
    fixed = eff == 0
    np.testing.assert_array_equal(s[fixed], f["S"][fixed])
    assert not np.any(s[eff > 0] == mpnn.MPNN_ALPHABET.index("X"))
    probs = np.asarray(out["probs"])
    assert np.all(probs[fixed] == 0)
    rowsum = probs[eff > 0].sum(-1)
    np.testing.assert_allclose(rowsum, 1.0, atol=1e-5)


# ---------------------------------------------------------------------------
# CA-only model family (--ca_only / ca_model_weights: CA_ProteinFeatures,
# utils :718-894) — same recorded-fixture methodology.
# ---------------------------------------------------------------------------

CA_FIXTURE = pathlib.Path(__file__).parent / "fixtures/recorded_mpnn_ca_parity.npz"


@pytest.fixture(scope="module")
def recorded_ca():
    data = np.load(CA_FIXTURE, allow_pickle=False)
    names = [str(n) for n in data["manifest_names"]]
    shapes = [
        tuple(int(x) for x in s.split(",")) for s in data["manifest_shapes"]
    ]
    sd = {
        n: synth_value(n, shape, seed=int(data["seed"]))
        for n, shape in zip(names, shapes)
    }
    params = jax.tree.map(jnp.asarray, mpnn.convert_mpnn_state_dict(sd))
    cfg = mpnn.MPNNConfig(k_neighbors=48, ca_only=True)
    feats = {
        k.removeprefix("in_"): data[k] for k in data.files if k.startswith("in_")
    }
    return data, params, cfg, feats


def test_ca_forward_log_probs(recorded_ca):
    """CA-model tolerance is 0.03 absolute (vanilla: 2e-4): the quaternion
    features at each residue's SELF-neighbor compute 0.5*sqrt(|1+Rxx-Ryy-
    Rzz|) on R = O^T O = I +/- 1ulp, amplifying matmul rounding to ~3e-4
    per feature (measured; inherent to the reference's own formula — two
    torch backends differ the same way), which compounds through the 6
    message-passing layers to ~2e-2 in log-probs. The argmax check below
    and the exact near-greedy sample parity pin the functional behavior."""
    data, params, cfg, f = recorded_ca
    lp = mpnn.mpnn_log_probs(
        params, f["X"], f["S"], f["mask"], f["chain_M"], f["residue_idx"],
        f["chain_encoding_all"], cfg, randn=jnp.asarray(data["randn_fwd"]),
    )
    got = np.asarray(lp)
    np.testing.assert_allclose(
        got, data["log_probs_rand"], atol=3e-2, rtol=1e-2
    )
    valid = f["mask"][0] > 0
    np.testing.assert_array_equal(
        got[0, valid].argmax(-1), data["log_probs_rand"][0, valid].argmax(-1)
    )


def test_ca_near_greedy_sample_matches_torch(recorded_ca):
    data, params, cfg, f = recorded_ca
    out = jax.jit(
        lambda key: mpnn.mpnn_sample(
            params, key, jnp.asarray(f["X"]), jnp.asarray(data["randn_smp"]),
            jnp.asarray(f["S"]), jnp.asarray(f["chain_M"]),
            jnp.asarray(f["chain_encoding_all"]), jnp.asarray(f["residue_idx"]),
            jnp.asarray(f["mask"]), cfg, temperature=1e-4,
        )
    )(jax.random.PRNGKey(5))
    np.testing.assert_array_equal(
        np.asarray(out["decoding_order"]), data["sample_order"]
    )
    np.testing.assert_array_equal(np.asarray(out["S"]), data["sample_S"])
