"""Record reference-torch ProteinMPNN activations as a parity fixture.

Run where /root/reference/ProteinMPNN + torch are importable. Builds the
reference ProteinMPNN at the released vanilla-model hyperparameters
(hidden 128, 3+3 layers, k=48 — protein_mpnn_run.py:33-34,167), loads
deterministically synthesized weights (tests/parity/fixture_lib.synth_value,
a pure function of each param's name+shape, so the test can regenerate the
identical state_dict offline without torch), and records:

- teacher-forced forward log_probs, both with a recorded randn (random
  decoding order) and with an explicit decoding order
  (use_input_decoding_order=True) — protein_mpnn_utils.py:1036-1079;
- per-sample scores (_scores, :18-26);
- unconditional log-probs (:1332-1362);
- a near-greedy sample (temperature 1e-4, recorded randn) where
  multinomial == argmax to fp precision, so the JAX categorical draw
  matches exactly (:1083-1168).

Writes tests/parity/fixtures/recorded_mpnn_parity.npz; replayed offline by
tests/parity/test_mpnn_parity.py with zero skips.
"""
from __future__ import annotations

import pathlib
import sys

import numpy as np

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from tests.parity.fixture_lib import synth_value  # noqa: E402
from tests.unit.mpnn_helpers import synth_structure  # noqa: E402

SEED = 7


def main() -> None:
    import torch

    sys.path.insert(0, "/root/reference/ProteinMPNN")
    from protein_mpnn_utils import ProteinMPNN, _scores

    torch.manual_seed(0)
    model = ProteinMPNN(
        num_letters=21, node_features=128, edge_features=128, hidden_dim=128,
        num_encoder_layers=3, num_decoder_layers=3, augment_eps=0.0,
        k_neighbors=48,
    )
    manifest = [
        [name, list(t.shape)] for name, t in model.state_dict().items()
    ]
    sd = {
        name: torch.from_numpy(synth_value(name, tuple(shape), seed=SEED))
        for name, shape in manifest
    }
    model.load_state_dict(sd)
    model.eval()

    feats = synth_structure()
    t = {
        k: torch.from_numpy(v.copy()).to(
            torch.long if v.dtype in (np.int32, np.int64) else torch.float32
        )
        for k, v in feats.items()
    }

    rng = np.random.default_rng(11)
    bsz, length = feats["S"].shape
    randn_fwd = rng.normal(size=(bsz, length)).astype(np.float32)
    randn_smp = rng.normal(size=(bsz, length)).astype(np.float32)
    order_fixed = rng.permutation(length).astype(np.int64)[None].repeat(bsz, 0)

    with torch.no_grad():
        lp_rand = model(
            t["X"], t["S"], t["mask"], t["chain_M"], t["residue_idx"],
            t["chain_encoding_all"], torch.from_numpy(randn_fwd),
        )
        lp_fixed = model(
            t["X"], t["S"], t["mask"], t["chain_M"], t["residue_idx"],
            t["chain_encoding_all"], torch.from_numpy(randn_fwd),
            use_input_decoding_order=True,
            decoding_order=torch.from_numpy(order_fixed),
        )
        scores = _scores(t["S"], lp_rand, t["mask"] * t["chain_M"])
        lp_uncond = model.unconditional_probs(
            t["X"], t["mask"], t["residue_idx"], t["chain_encoding_all"]
        )
        # conditional_probs (utils :1272-1329), both order conventions.
        randn_cond = rng.normal(size=(bsz, length)).astype(np.float32)
        lp_cond = model.conditional_probs(
            t["X"], t["S"], t["mask"], t["chain_M"], t["residue_idx"],
            t["chain_encoding_all"], torch.from_numpy(randn_cond),
            backbone_only=False,
        )
        lp_cond_bb = model.conditional_probs(
            t["X"], t["S"], t["mask"], t["chain_M"], t["residue_idx"],
            t["chain_encoding_all"], torch.from_numpy(randn_cond),
            backbone_only=True,
        )
        omit_aas = np.zeros(21, np.float32)
        omit_aas[20] = 1.0  # omit X (protein_mpnn_run default omit_AAs='X')
        sample = model.sample(
            t["X"], torch.from_numpy(randn_smp), t["S"], t["chain_M"],
            t["chain_encoding_all"], t["residue_idx"], mask=t["mask"],
            temperature=1e-4, omit_AAs_np=omit_aas,
            bias_AAs_np=np.zeros(21, np.float32),
            chain_M_pos=torch.ones_like(t["chain_M"]),
            omit_AA_mask=None, pssm_coef=None, pssm_bias=None,
            pssm_multi=0.0, pssm_log_odds_flag=False, pssm_log_odds_mask=None,
            pssm_bias_flag=False,
            bias_by_res=torch.zeros((bsz, length, 21)),
        )
        # PSSM-restrained sampling (utils :1147-1156): coef/bias mixing +
        # log-odds mask renormalization. The mixing happens in PROBABILITY
        # space, so draws are non-degenerate even at tiny temperature and
        # torch/jax RNGs can't be matched on S — instead pin the math on
        # the recorded per-position probs with a SINGLE designed position
        # (everything else fixed => its probs row is deterministic).
        pssm_coef = rng.uniform(0.2, 0.9, (bsz, length)).astype(np.float32)
        raw = rng.uniform(0.05, 1.0, (bsz, length, 21)).astype(np.float32)
        pssm_bias = raw / raw.sum(-1, keepdims=True)
        pssm_lom = (
            rng.uniform(size=(bsz, length, 21)) > 0.3
        ).astype(np.float32)
        randn_pssm = rng.normal(size=(bsz, length)).astype(np.float32)
        pssm_pos = 12
        chain_m_pos = np.zeros((bsz, length), np.float32)
        chain_m_pos[:, pssm_pos] = 1.0
        sample_pssm = model.sample(
            t["X"], torch.from_numpy(randn_pssm), t["S"], t["chain_M"],
            t["chain_encoding_all"], t["residue_idx"], mask=t["mask"],
            temperature=0.2, omit_AAs_np=omit_aas,
            bias_AAs_np=np.zeros(21, np.float32),
            chain_M_pos=torch.from_numpy(chain_m_pos),
            omit_AA_mask=None,
            pssm_coef=torch.from_numpy(pssm_coef),
            pssm_bias=torch.from_numpy(pssm_bias),
            pssm_multi=0.7, pssm_log_odds_flag=True,
            pssm_log_odds_mask=torch.from_numpy(pssm_lom),
            pssm_bias_flag=True,
            bias_by_res=torch.zeros((bsz, length, 21)),
        )
        # Tied sample (utils :1171-1267): tie residue i of chain A (31aa)
        # to residue i of chain B (22aa) for the first 22 positions —
        # the homo-oligomer pattern of tied_positions_jsonl.
        tied_pos = [[i, 31 + i] for i in range(22)]
        tied_beta = torch.ones((length,))
        randn_tied = rng.normal(size=(bsz, length)).astype(np.float32)
        sample_tied = model.tied_sample(
            t["X"], torch.from_numpy(randn_tied), t["S"], t["chain_M"],
            t["chain_encoding_all"], t["residue_idx"], mask=t["mask"],
            temperature=1e-4, omit_AAs_np=omit_aas,
            bias_AAs_np=np.zeros(21, np.float32),
            chain_M_pos=torch.ones_like(t["chain_M"]),
            omit_AA_mask=None, pssm_coef=torch.zeros((bsz, length)),
            pssm_bias=torch.zeros((bsz, length, 21)),
            pssm_multi=0.0, pssm_log_odds_flag=False,
            pssm_log_odds_mask=torch.ones((bsz, length, 21)),
            pssm_bias_flag=False,
            tied_pos=tied_pos, tied_beta=tied_beta,
            bias_by_res=torch.zeros((bsz, length, 21)),
        )

    out = pathlib.Path(REPO / "tests/parity/fixtures/recorded_mpnn_parity.npz")
    np.savez_compressed(
        out,
        manifest_names=np.array([n for n, _ in manifest]),
        manifest_shapes=np.array(
            [",".join(map(str, s)) for _, s in manifest]
        ),
        seed=np.int64(SEED),
        randn_fwd=randn_fwd,
        randn_smp=randn_smp,
        order_fixed=order_fixed,
        log_probs_rand=lp_rand.numpy(),
        log_probs_fixed=lp_fixed.numpy(),
        scores=scores.numpy(),
        log_probs_uncond=lp_uncond.numpy(),
        randn_cond=randn_cond,
        log_probs_cond=lp_cond.numpy(),
        log_probs_cond_bb=lp_cond_bb.numpy(),
        sample_S=sample["S"].numpy(),
        sample_order=sample["decoding_order"].numpy(),
        randn_pssm=randn_pssm,
        pssm_coef=pssm_coef,
        pssm_bias=pssm_bias,
        pssm_log_odds_mask=pssm_lom,
        pssm_pos=np.int64(pssm_pos),
        sample_pssm_probs=sample_pssm["probs"].numpy(),
        randn_tied=randn_tied,
        tied_pos=np.array(tied_pos, np.int32),
        sample_tied_S=sample_tied["S"].numpy(),
        sample_tied_order=sample_tied["decoding_order"].numpy(),
        sample_tied_probs=sample_tied["probs"].numpy(),
        **{f"in_{k}": v for k, v in feats.items()},
    )
    print(f"wrote {out} ({out.stat().st_size} bytes)")

    record_ca_model(torch, ProteinMPNN, feats)


def record_ca_model(torch, ProteinMPNN, feats) -> None:
    """CA-only family (--ca_only, ca_model_weights/ — CA_ProteinFeatures,
    utils :718-894): teacher-forced forward with recorded randn + a
    near-greedy sample, on the same synthetic structure's CA trace."""
    model = ProteinMPNN(
        num_letters=21, node_features=128, edge_features=128, hidden_dim=128,
        num_encoder_layers=3, num_decoder_layers=3, augment_eps=0.0,
        k_neighbors=48, ca_only=True,
    )
    manifest = [
        [name, list(t.shape)] for name, t in model.state_dict().items()
    ]
    sd = {
        name: torch.from_numpy(synth_value(name, tuple(shape), seed=SEED + 1))
        for name, shape in manifest
    }
    model.load_state_dict(sd)
    model.eval()

    t = {
        k: torch.from_numpy(v.copy()).to(
            torch.long if v.dtype in (np.int32, np.int64) else torch.float32
        )
        for k, v in feats.items()
    }
    x_ca = t["X"][:, :, 1, :]  # the Ca trace (tied_featurize ca_only X_out)
    rng = np.random.default_rng(13)
    bsz, length = feats["S"].shape
    randn_fwd = rng.normal(size=(bsz, length)).astype(np.float32)
    randn_smp = rng.normal(size=(bsz, length)).astype(np.float32)
    with torch.no_grad():
        lp = model(
            x_ca, t["S"], t["mask"], t["chain_M"], t["residue_idx"],
            t["chain_encoding_all"], torch.from_numpy(randn_fwd),
        )
        omit_aas = np.zeros(21, np.float32)
        omit_aas[20] = 1.0
        sample = model.sample(
            x_ca, torch.from_numpy(randn_smp), t["S"], t["chain_M"],
            t["chain_encoding_all"], t["residue_idx"], mask=t["mask"],
            temperature=1e-4, omit_AAs_np=omit_aas,
            bias_AAs_np=np.zeros(21, np.float32),
            chain_M_pos=torch.ones_like(t["chain_M"]),
            omit_AA_mask=None, pssm_coef=None, pssm_bias=None,
            pssm_multi=0.0, pssm_log_odds_flag=False, pssm_log_odds_mask=None,
            pssm_bias_flag=False,
            bias_by_res=torch.zeros((bsz, length, 21)),
        )
    out = pathlib.Path(
        REPO / "tests/parity/fixtures/recorded_mpnn_ca_parity.npz"
    )
    np.savez_compressed(
        out,
        manifest_names=np.array([n for n, _ in manifest]),
        manifest_shapes=np.array(
            [",".join(map(str, s)) for _, s in manifest]
        ),
        seed=np.int64(SEED + 1),
        randn_fwd=randn_fwd,
        randn_smp=randn_smp,
        log_probs_rand=lp.numpy(),
        sample_S=sample["S"].numpy(),
        sample_order=sample["decoding_order"].numpy(),
        **{f"in_{k}": v for k, v in feats.items()},
    )
    print(f"wrote {out} ({out.stat().st_size} bytes)")


if __name__ == "__main__":
    main()
