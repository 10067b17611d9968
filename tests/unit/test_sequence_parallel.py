"""Sequence parallelism: the N^2 edge stack sharded over the mesh ``sp``
axis (parallel/sp.py). The reference is single-GPU at inference
(experiments/inference.py; SURVEY.md §2.9) — this is the TPU-native scaling
dimension for long complexes. Verified on the virtual 8-CPU mesh:

- numerics match the single-device sampler,
- the edge tensors are *actually* row-sharded (checked via the compiled
  HLO's sharding annotations, not just absence of errors).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from framedipt_tpu.diffusion import SE3Diffuser
from framedipt_tpu.model import ScoreNetwork
from framedipt_tpu.parallel import make_sp_mesh
from framedipt_tpu.parallel import sp as sp_mod
from framedipt_tpu.sampling import build_inference_fn
from framedipt_tpu.tools.config import DiffuserConfig
from tests.unit.test_sampling import SMALL_MODEL, SMALL_SO3, N


def _make_feats(B, N=N):
    rng = np.random.default_rng(0)
    trans = rng.normal(size=(B, N, 3)).astype(np.float32) * 4
    qs = rng.normal(size=(B, N, 4)).astype(np.float32)
    qs /= np.linalg.norm(qs, axis=-1, keepdims=True)
    fixed = np.zeros((B, N), np.float32)
    fixed[:, :4] = 1.0
    return {
        "res_mask": np.ones((B, N), np.float32),
        "fixed_mask": fixed,
        "seq_idx": np.tile(np.arange(N)[None], (B, 1)),
        "t": np.ones((B,), np.float32),
        "sc_ca_t": np.zeros((B, N, 3), np.float32),
        "rigids_t": np.concatenate([qs, trans], -1),
        "torsion_angles_sin_cos": rng.normal(size=(B, N, 7, 2)).astype(
            np.float32
        ),
        "aatype": rng.integers(0, 20, size=(B, N)).astype(np.int32),
    }


def test_sp_sampler_matches_single_device():
    diffuser = SE3Diffuser(DiffuserConfig(so3=SMALL_SO3))
    model = ScoreNetwork(SMALL_MODEL, diffuser, inpainting=True)
    feats = _make_feats(B=1)
    jfeats = {k: jnp.asarray(v) for k, v in feats.items()}
    params = model.init(jax.random.PRNGKey(0), jfeats)

    run_single = build_inference_fn(
        model, diffuser, num_t=3, min_t=0.01, noise_scale=0.1, inpainting=True
    )
    out_single = run_single(params, jfeats, jax.random.PRNGKey(1))

    mesh = make_sp_mesh(sp_size=4, dp_size=1, devices=jax.devices("cpu")[:4])
    run_sp = build_inference_fn(
        model, diffuser, num_t=3, min_t=0.01, noise_scale=0.1,
        inpainting=True, sp_mesh=mesh,
    )
    out_sp = run_sp(params, jfeats, jax.random.PRNGKey(1))
    np.testing.assert_allclose(
        np.asarray(out_sp["final_rigids"]),
        np.asarray(out_single["final_rigids"]),
        atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out_sp["prot_traj"]),
        np.asarray(out_single["prot_traj"]),
        atol=2e-4,
    )


def test_sp_edge_tensors_are_row_sharded():
    """The model forward under an sp context really distributes the edge
    stack: compile it and look for the sp sharding in the HLO."""
    diffuser = SE3Diffuser(DiffuserConfig(so3=SMALL_SO3))
    model = ScoreNetwork(SMALL_MODEL, diffuser, inpainting=True)
    feats = _make_feats(B=1)
    jfeats = {k: jnp.asarray(v) for k, v in feats.items()}
    params = model.init(jax.random.PRNGKey(0), jfeats)

    mesh = make_sp_mesh(sp_size=4, dp_size=1, devices=jax.devices("cpu")[:4])
    with sp_mod.sp_context(mesh):
        lowered = jax.jit(model.apply).lower(params, jfeats)
    compiled_text = lowered.compile().as_text()
    # Row-sharding of a [1, N, N, C] tensor over 4 devices shows up as a
    # {devices=[1,4,1,1]...} annotation; GSPMD keeping everything
    # replicated would leave none.
    assert "devices=[1,4,1,1]" in compiled_text.replace(" ", ""), (
        "no row-sharded edge tensor found in compiled HLO"
    )


def test_sp_context_is_identity_when_inactive():
    x = jnp.ones((2, 8, 8, 4))
    assert sp_mod.constrain_edge(x) is x
    assert sp_mod.constrain_rows(x) is x
    assert sp_mod.constrain_attn(x) is x


def test_sp_rejects_unsupported_pallas_kernels():
    """The fused IPA attention kernel is not sp-aware (the edge-transition
    and embedder kernels run per-shard via shard_map)."""
    import dataclasses

    diffuser = SE3Diffuser(DiffuserConfig(so3=SMALL_SO3))
    mesh = make_sp_mesh(sp_size=4, dp_size=1, devices=jax.devices("cpu")[:4])
    mc = dataclasses.replace(SMALL_MODEL)
    mc.ipa = dataclasses.replace(SMALL_MODEL.ipa, use_pallas_ipa=True)
    model = ScoreNetwork(mc, diffuser, inpainting=True)
    with pytest.raises(ValueError, match="use_pallas_ipa"):
        build_inference_fn(
            model, diffuser, num_t=3, min_t=0.01, inpainting=True,
            sp_mesh=mesh,
        )


def test_sp_pallas_edge_kernel_trajectory_parity(monkeypatch):
    """VERDICT r2 item 5 + r3 item 6: under sp BOTH the edge-transition and
    the embedder Pallas kernels run per shard via shard_map (rows local,
    columns full) instead of being forfeited for XLA. Asserts (a) each
    kernel really executes once per shard on [N/sp, N] row blocks and
    (b) the sp=4 trajectory matches the single-device XLA sampler."""
    import dataclasses

    from framedipt_tpu.model.pallas import edge_embedder as emb_mod
    from framedipt_tpu.model.pallas import pair_mlp as pair_mlp_mod

    diffuser = SE3Diffuser(DiffuserConfig(so3=SMALL_SO3))
    xla_model = ScoreNetwork(SMALL_MODEL, diffuser, inpainting=True)
    feats = _make_feats(B=1)
    jfeats = {k: jnp.asarray(v) for k, v in feats.items()}
    params = xla_model.init(jax.random.PRNGKey(0), jfeats)

    run_single = build_inference_fn(
        xla_model, diffuser, num_t=2, min_t=0.01, noise_scale=0.1,
        inpainting=True,
    )
    out_single = run_single(params, jfeats, jax.random.PRNGKey(1))

    mc = dataclasses.replace(SMALL_MODEL)
    mc.ipa = dataclasses.replace(
        SMALL_MODEL.ipa, use_pallas_kernel=True, use_pallas_embedder=True,
        pallas_interpret=True,
    )
    pallas_model = ScoreNetwork(mc, diffuser, inpainting=True)

    shard_shapes = []
    orig = pair_mlp_mod.fused_pair_mlp_trainable

    def spy(tile_i, tile_j, interpret, bwd_impl, pair, *rest):
        shard_shapes.append(tuple(pair.shape))
        return orig(tile_i, tile_j, interpret, bwd_impl, pair, *rest)

    monkeypatch.setattr(pair_mlp_mod, "fused_pair_mlp_trainable", spy)

    emb_shapes = []
    emb_orig = emb_mod.fused_edge_embedder_trainable

    def emb_spy(*a):
        # diff args start at index 6 (g is the first array argument).
        emb_shapes.append((tuple(a[6].shape), tuple(a[7].shape)))
        return emb_orig(*a)

    monkeypatch.setattr(emb_mod, "fused_edge_embedder_trainable", emb_spy)

    mesh = make_sp_mesh(sp_size=4, dp_size=1, devices=jax.devices("cpu")[:4])
    run_sp = build_inference_fn(
        pallas_model, diffuser, num_t=2, min_t=0.01, noise_scale=0.1,
        inpainting=True, sp_mesh=mesh,
    )
    out_sp = run_sp(params, jfeats, jax.random.PRNGKey(1))

    # Each edge transition traced the kernel on a LOCAL [1, N/4, N, C] row
    # shard — the custom call is per-shard, not global.
    assert shard_shapes, "pallas kernel was never invoked under sp"
    assert all(s[1] == N // 4 and s[2] == N for s in shard_shapes), shard_shapes
    # The embedder kernel too: row CP factor g local, col factor h full.
    assert emb_shapes, "embedder kernel was never invoked under sp"
    assert all(
        gs[1] == N // 4 and hs[1] == N for gs, hs in emb_shapes
    ), emb_shapes

    np.testing.assert_allclose(
        np.asarray(out_sp["prot_traj"]),
        np.asarray(out_single["prot_traj"]),
        atol=2e-4,
    )


def test_sp_pallas_falls_back_to_xla_for_indivisible_n(monkeypatch):
    """Real complexes have arbitrary N: when N is not divisible by sp the
    shard_map kernel path cannot form equal row shards, so EdgeTransition
    must fall back to the GSPMD XLA formulation (which handles ragged
    sharding) instead of crashing at trace time."""
    import dataclasses

    from framedipt_tpu.model.pallas import pair_mlp as pair_mlp_mod

    n_odd = N + 2  # not divisible by sp=4
    assert n_odd % 4
    diffuser = SE3Diffuser(DiffuserConfig(so3=SMALL_SO3))
    feats = _make_feats(B=1, N=n_odd)
    jfeats = {k: jnp.asarray(v) for k, v in feats.items()}

    mc = dataclasses.replace(SMALL_MODEL)
    mc.ipa = dataclasses.replace(
        SMALL_MODEL.ipa, use_pallas_kernel=True, pallas_interpret=True
    )
    pallas_model = ScoreNetwork(mc, diffuser, inpainting=True)
    params = pallas_model.init(jax.random.PRNGKey(0), jfeats)

    calls = []
    orig = pair_mlp_mod.fused_pair_mlp_trainable
    monkeypatch.setattr(
        pair_mlp_mod,
        "fused_pair_mlp_trainable",
        lambda *a: calls.append(1) or orig(*a),
    )

    xla_model = ScoreNetwork(SMALL_MODEL, diffuser, inpainting=True)
    run_single = build_inference_fn(
        xla_model, diffuser, num_t=2, min_t=0.01, noise_scale=0.1,
        inpainting=True,
    )
    out_single = run_single(params, jfeats, jax.random.PRNGKey(1))

    mesh = make_sp_mesh(sp_size=4, dp_size=1, devices=jax.devices("cpu")[:4])
    run_sp = build_inference_fn(
        pallas_model, diffuser, num_t=2, min_t=0.01, noise_scale=0.1,
        inpainting=True, sp_mesh=mesh,
    )
    out_sp = run_sp(params, jfeats, jax.random.PRNGKey(1))

    assert not calls, "kernel must not run under sp with indivisible N"
    np.testing.assert_allclose(
        np.asarray(out_sp["prot_traj"]),
        np.asarray(out_single["prot_traj"]),
        atol=2e-4,
    )


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
