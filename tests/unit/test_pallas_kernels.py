"""Pallas kernel correctness vs the XLA formulation (interpret mode on CPU)."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from framedipt_tpu.model.ipa import EdgeTransition


@pytest.mark.parametrize("n", [16, 40])  # 40 exercises the padding path
def test_fused_edge_transition_matches_xla(n):
    rng = np.random.default_rng(0)
    B, Cs, Ce = 1, 64, 32
    node = jnp.asarray(rng.normal(size=(B, n, Cs)).astype(np.float32))
    edge = jnp.asarray(rng.normal(size=(B, n, n, Ce)).astype(np.float32))
    mask = np.ones((B, n), np.float32)
    mask[:, -3:] = 0.0  # exercise the fused edge-mask epilogue
    mask = jnp.asarray(mask)

    et = EdgeTransition(node_embed_size=Cs, edge_embed_out=Ce)
    params = et.init(jax.random.PRNGKey(0), node, edge)
    params = jax.tree_util.tree_map(
        lambda x: x
        + 0.05 * np.random.default_rng(1).normal(size=x.shape).astype(np.float32),
        params,
    )
    out_xla = et.apply(params, node, edge)
    out_xla = out_xla * (mask[:, :, None] * mask[:, None, :])[..., None]

    et_pallas = EdgeTransition(
        node_embed_size=Cs, edge_embed_out=Ce, use_pallas=True
    )
    with pltpu.force_tpu_interpret_mode():
        out_pallas = et_pallas.apply(params, node, edge, node_mask=mask)
    np.testing.assert_allclose(
        np.asarray(out_xla), np.asarray(out_pallas), atol=1e-5
    )


def test_fused_pair_mlp_embedder_variant():
    """residual=False variant (the Embedder's edge MLP shape)."""
    from framedipt_tpu.model.pallas.pair_mlp import fused_pair_mlp

    rng = np.random.default_rng(2)
    B, N, c_in, h, c_out = 1, 24, 16, 32, 32
    pair = jnp.asarray(rng.normal(size=(B, N, N, c_in)).astype(np.float32))
    i_term = jnp.asarray(rng.normal(size=(B, N, h)).astype(np.float32))
    j_term = jnp.asarray(rng.normal(size=(B, N, h)).astype(np.float32))
    mask = np.ones((B, N), np.float32)
    mask[:, -2:] = 0.0
    w0 = rng.normal(size=(c_in, h)).astype(np.float32) * 0.2
    b0 = rng.normal(size=(h,)).astype(np.float32) * 0.1
    w1 = rng.normal(size=(h, h)).astype(np.float32) * 0.2
    b1 = rng.normal(size=(h,)).astype(np.float32) * 0.1
    wf = rng.normal(size=(h, c_out)).astype(np.float32) * 0.2
    bf = rng.normal(size=(c_out,)).astype(np.float32) * 0.1
    lns = rng.normal(size=(c_out,)).astype(np.float32) * 0.3 + 1.0
    lnb = rng.normal(size=(c_out,)).astype(np.float32) * 0.1

    # XLA oracle.
    y0 = jax.nn.relu(
        jnp.einsum("bijc,ch->bijh", pair, w0)
        + i_term[:, :, None, :]
        + j_term[:, None, :, :]
        + b0
    )
    y1 = jax.nn.relu(jnp.einsum("bijh,hk->bijk", y0, w1) + b1)
    out = jnp.einsum("bijh,ho->bijo", y1, wf) + bf
    mean = jnp.mean(out, axis=-1, keepdims=True)
    var = jnp.var(out, axis=-1, keepdims=True)
    normed = (out - mean) * jax.lax.rsqrt(var + 1e-6) * lns + lnb
    expect = normed * (mask[:, :, None] * mask[:, None, :])[..., None]

    with pltpu.force_tpu_interpret_mode():
        got = fused_pair_mlp(
            pair, i_term, j_term, jnp.asarray(mask), jnp.asarray(mask),
            w0, b0, w1, b1, wf, bf, lns, lnb,
            tile_i=8, tile_j=16,
        )
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), atol=1e-5)


@pytest.mark.slow
def test_full_model_pallas_matches_xla():
    """Whole ScoreNetwork forward: pallas path (embedder edge MLP + edge
    transitions, interpret mode) vs the XLA formulation, ragged mask."""
    import dataclasses

    from framedipt_tpu.diffusion import SE3Diffuser
    from framedipt_tpu.model import ScoreNetwork
    from framedipt_tpu.tools.config import Config, SO3Config

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
    m.ipa.num_blocks = 2
    m.ipa.seq_tfmr_num_layers = 1
    m.ipa.seq_tfmr_num_heads = 2
    m.ipa.pallas_tile_i = 8
    m.ipa.pallas_tile_j = 16
    diffuser = SE3Diffuser(cfg.diffuser)

    rng = np.random.default_rng(4)
    B, N = 1, 20
    trans = rng.normal(size=(B, N, 3)).astype(np.float32) * 4
    qs = rng.normal(size=(B, N, 4)).astype(np.float32)
    qs /= np.linalg.norm(qs, axis=-1, keepdims=True)
    res_mask = np.ones((B, N), np.float32)
    res_mask[:, -3:] = 0.0
    fixed = np.zeros((B, N), np.float32)
    fixed[:, :5] = 1.0
    feats = {
        "res_mask": jnp.asarray(res_mask),
        "fixed_mask": jnp.asarray(fixed),
        "seq_idx": jnp.tile(jnp.arange(N)[None], (B, 1)),
        "t": jnp.full((B,), 0.5, jnp.float32),
        "sc_ca_t": jnp.asarray(trans),
        "rigids_t": jnp.asarray(np.concatenate([qs, trans], -1)),
        "torsion_angles_sin_cos": jnp.asarray(
            rng.normal(size=(B, N, 7, 2)).astype(np.float32)
        ),
        "aatype": jnp.asarray(rng.integers(0, 20, size=(B, N)), jnp.int32),
    }

    model_xla = ScoreNetwork(m, diffuser, inpainting=True)
    params = model_xla.init(jax.random.PRNGKey(0), feats)
    out_xla = model_xla.apply(params, feats)

    m_pallas = dataclasses.replace(m)
    m_pallas.ipa = dataclasses.replace(
        m.ipa,
        use_pallas_kernel=True,
        use_pallas_embedder=True,
        use_pallas_ipa=True,
    )
    model_pallas = ScoreNetwork(m_pallas, diffuser, inpainting=True)
    with pltpu.force_tpu_interpret_mode():
        out_pallas = model_pallas.apply(params, feats)

    for key in ("psi", "rot_score", "trans_score", "atom37"):
        a, b = np.asarray(out_xla[key]), np.asarray(out_pallas[key])
        scale = max(1.0, np.abs(a).max())
        # 2e-4: the fused IPA path reassociates the point logits (augmented
        # matmul) and the softmax normalization order.
        assert np.abs(a - b).max() / scale < 2e-4, key


def test_trainable_kernel_gradients_match_xla():
    """The custom-VJP path (pallas forward, rematerialized XLA backward)
    must produce the same parameter/input gradients as differentiating the
    plain XLA EdgeTransition."""
    rng = np.random.default_rng(7)
    B, n, Cs, Ce = 1, 24, 64, 32
    node = jnp.asarray(rng.normal(size=(B, n, Cs)).astype(np.float32))
    edge = jnp.asarray(rng.normal(size=(B, n, n, Ce)).astype(np.float32))
    mask_np = np.ones((B, n), np.float32)
    mask_np[:, -3:] = 0.0
    mask = jnp.asarray(mask_np)
    cot = jnp.asarray(rng.normal(size=(B, n, n, Ce)).astype(np.float32))

    et_xla = EdgeTransition(node_embed_size=Cs, edge_embed_out=Ce)
    params = et_xla.init(jax.random.PRNGKey(0), node, edge)
    params = jax.tree_util.tree_map(
        lambda x: x
        + 0.05 * np.random.default_rng(8).normal(size=x.shape).astype(np.float32),
        params,
    )

    def loss_xla(p, nd, ed):
        out = et_xla.apply(p, nd, ed)
        out = out * (mask[:, :, None] * mask[:, None, :])[..., None]
        return jnp.sum(out * cot)

    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(params, node, edge)

    et_pallas = EdgeTransition(
        node_embed_size=Cs, edge_embed_out=Ce, use_pallas=True,
        tile_i=8, tile_j=128,
    )

    def loss_pallas(p, nd, ed):
        out = et_pallas.apply(p, nd, ed, node_mask=mask)
        return jnp.sum(out * cot)

    with pltpu.force_tpu_interpret_mode():
        g_pallas = jax.grad(loss_pallas, argnums=(0, 1, 2))(params, node, edge)

    flat_x, _ = jax.tree_util.tree_flatten(g_xla)
    flat_p, _ = jax.tree_util.tree_flatten(g_pallas)
    assert len(flat_x) == len(flat_p)
    for a, b in zip(flat_x, flat_p):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4
        )


def test_trainable_kernel_gradients_embedder_variant():
    """residual=False variant: value + grads of fused_pair_mlp_trainable
    vs the plain XLA chain."""
    from framedipt_tpu.model.pallas.pair_mlp import (
        _xla_pair_mlp,
        fused_pair_mlp_trainable,
    )

    rng = np.random.default_rng(9)
    B, N, c_in, h = 1, 16, 8, 32
    pair = jnp.asarray(rng.normal(size=(B, N, N, c_in)).astype(np.float32))
    i_term = jnp.asarray(rng.normal(size=(B, N, h)).astype(np.float32))
    j_term = jnp.asarray(rng.normal(size=(B, N, h)).astype(np.float32))
    mask_np = np.ones((B, N), np.float32)
    mask_np[:, -2:] = 0.0
    mask = jnp.asarray(mask_np)
    weights = [
        jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.2)
        for s in [(c_in, h), (h,), (h, h), (h,), (h, h), (h,), (h,), (h,)]
    ]
    cot = jnp.asarray(rng.normal(size=(B, N, N, h)).astype(np.float32))

    def loss_fused(pair, i_term, j_term, *ws):
        out = fused_pair_mlp_trainable(
            8, 16, False, "xla", pair, i_term, j_term, mask, mask, *ws, None, None, None
        )
        return jnp.sum(out * cot)

    def loss_xla(pair, i_term, j_term, *ws):
        out = _xla_pair_mlp(pair, i_term, j_term, mask, mask, *ws, None, None, None)
        return jnp.sum(out * cot)

    argnums = tuple(range(3 + len(weights)))
    with pltpu.force_tpu_interpret_mode():
        g_fused = jax.grad(loss_fused, argnums=argnums)(
            pair, i_term, j_term, *weights
        )
    g_xla = jax.grad(loss_xla, argnums=argnums)(pair, i_term, j_term, *weights)
    for a, b in zip(g_fused, g_xla):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4
        )


def test_trainable_kernel_bf16_forward_matches_xla_twin():
    """Under bf16 inputs the kernel and its rematerialized XLA twin must
    agree: both accumulate matmuls in f32 and cast to bf16 (ADVICE r2 —
    a bf16-accumulating twin would drift from the kernel). Tolerance covers
    bf16 rounding-order differences in the elementwise adds only."""
    from framedipt_tpu.model.pallas.pair_mlp import (
        _xla_pair_mlp,
        fused_pair_mlp_trainable,
    )

    rng = np.random.default_rng(11)
    B, N, c_in, h = 1, 16, 8, 32
    bf16 = jnp.bfloat16
    pair = jnp.asarray(rng.normal(size=(B, N, N, c_in)), dtype=bf16)
    i_term = jnp.asarray(rng.normal(size=(B, N, h)), dtype=bf16)
    j_term = jnp.asarray(rng.normal(size=(B, N, h)), dtype=bf16)
    mask_np = np.ones((B, N), np.float32)
    mask_np[:, -2:] = 0.0
    mask = jnp.asarray(mask_np)
    weights = [
        jnp.asarray(rng.normal(size=s) * 0.2, dtype=bf16)
        for s in [(c_in, h), (h,), (h, h), (h,), (h, h), (h,), (h,), (h,)]
    ]

    with pltpu.force_tpu_interpret_mode():
        out_fused = fused_pair_mlp_trainable(
            8, 16, False, "xla", pair, i_term, j_term, mask, mask, *weights,
            None, None, None,
        )
    out_xla = _xla_pair_mlp(pair, i_term, j_term, mask, mask, *weights,
                            None, None, None)
    assert out_fused.dtype == out_xla.dtype
    np.testing.assert_allclose(
        np.asarray(out_fused, np.float32),
        np.asarray(out_xla, np.float32),
        atol=5e-2, rtol=5e-2,
    )

    # Gradients flow (backward is the XLA twin's VJP by construction).
    cot = jnp.asarray(rng.normal(size=(B, N, N, h)), dtype=bf16)

    def loss(pair, *ws):
        out = fused_pair_mlp_trainable(
            8, 16, False, "xla", pair, i_term, j_term, mask, mask, *ws, None, None, None
        )
        return jnp.sum((out * cot).astype(jnp.float32))

    with pltpu.force_tpu_interpret_mode():
        grads = jax.grad(loss, argnums=(0, 1))(pair, *weights)
    for g in grads:
        assert np.isfinite(np.asarray(g, np.float32)).all()


def test_rel_cp_factors_exact():
    """CP factor product == sinusoid embedding of the index difference."""
    from framedipt_tpu.model.embed import get_index_embedding
    from framedipt_tpu.model.pallas.edge_embedder import (
        expand_w_rel,
        rel_cp_factors,
    )

    rng = np.random.default_rng(11)
    E = 32
    seq_idx = jnp.asarray(rng.integers(0, 500, size=(1, 33)), jnp.int32)
    g, h = rel_cp_factors(seq_idx, E)
    w = jnp.asarray(rng.normal(size=(E, 5)).astype(np.float32))

    rel = get_index_embedding(
        seq_idx[:, :, None] - seq_idx[:, None, :], E
    )  # [1, N, N, 32]
    expect = jnp.einsum("bije,ec->bijc", rel, w)
    got = jnp.einsum(
        "bik,bjk,kc->bijc", g, h, expand_w_rel(w)
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(expect), atol=2e-4, rtol=1e-4
    )


def _tiny_embedder_setup(n=20, use_pallas=False, emb_bwd="xla"):
    import dataclasses

    from framedipt_tpu.model.embed import Embedder
    from framedipt_tpu.tools.config import Config

    cfg = Config()
    m = dataclasses.replace(cfg.model)
    m.node_embed_size = 24
    m.edge_embed_size = 16
    m.ipa = dataclasses.replace(
        m.ipa, pallas_tile_i=8, pallas_tile_j=16,
        pallas_emb_tile_i=8, pallas_emb_tile_j=16,
        pallas_emb_bwd_impl=emb_bwd,
    )
    emb = Embedder(m, inpainting=True, use_pallas=use_pallas)
    rng = np.random.default_rng(12)
    B = 1
    feats = dict(
        seq_idx=jnp.asarray(rng.integers(0, 40, size=(B, n)), jnp.int32),
        t=jnp.full((B,), 0.37, jnp.float32),
        fixed_mask=jnp.asarray(
            (rng.random((B, n)) > 0.5).astype(np.float32)
        ),
        self_conditioning_ca=jnp.asarray(
            rng.normal(size=(B, n, 3)).astype(np.float32) * 6
        ),
        aatype=jnp.asarray(rng.integers(0, 21, size=(B, n)), jnp.int32),
    )
    mask_np = np.ones((B, n), np.float32)
    mask_np[:, -3:] = 0.0
    return emb, feats, jnp.asarray(mask_np)


def test_fused_edge_embedder_matches_xla_embedder():
    """The fully-fused embedder kernel (in-kernel rel sinusoids + distogram)
    vs the XLA Embedder path, through the flax module."""
    emb_xla, feats, mask = _tiny_embedder_setup(n=20, use_pallas=False)
    emb_pal, _, _ = _tiny_embedder_setup(n=20, use_pallas=True)
    params = emb_xla.init(jax.random.PRNGKey(0), **feats)
    params = jax.tree_util.tree_map(
        lambda x: x
        + 0.05 * np.random.default_rng(13).normal(size=x.shape).astype(
            np.float32
        ),
        params,
    )
    node_x, edge_x = emb_xla.apply(params, **feats)
    edge_x = edge_x * (mask[:, :, None] * mask[:, None, :])[..., None]
    with pltpu.force_tpu_interpret_mode():
        node_p, edge_p = emb_pal.apply(params, **feats, node_mask=mask)
    np.testing.assert_allclose(np.asarray(node_x), np.asarray(node_p), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(edge_x), np.asarray(edge_p), atol=5e-4, rtol=1e-3
    )


def test_fused_edge_embedder_gradients():
    """Trainable path: pallas forward + rematerialized XLA backward must match
    differentiating the plain XLA embedder (weights + coordinate grads are
    zero a.e. through the distogram either way)."""
    emb_xla, feats, mask = _tiny_embedder_setup(n=16, use_pallas=False)
    emb_pal, _, _ = _tiny_embedder_setup(n=16, use_pallas=True)
    params = emb_xla.init(jax.random.PRNGKey(0), **feats)
    params = jax.tree_util.tree_map(
        lambda x: x
        + 0.05 * np.random.default_rng(14).normal(size=x.shape).astype(
            np.float32
        ),
        params,
    )
    cot = jnp.asarray(
        np.random.default_rng(15).normal(size=(1, 16, 16, 16)).astype(
            np.float32
        )
    )

    def loss_xla(p):
        _, e = emb_xla.apply(p, **feats)
        e = e * (mask[:, :, None] * mask[:, None, :])[..., None]
        return jnp.sum(e * cot)

    def loss_pal(p):
        _, e = emb_pal.apply(p, **feats, node_mask=mask)
        return jnp.sum(e * cot)

    g_xla = jax.grad(loss_xla)(params)
    with pltpu.force_tpu_interpret_mode():
        g_pal = jax.grad(loss_pal)(params)
    flat_x, _ = jax.tree_util.tree_flatten(g_xla)
    flat_p, _ = jax.tree_util.tree_flatten(g_pal)
    for a, b in zip(flat_x, flat_p):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-3, rtol=5e-3
        )


def _emb_bwd_args(dtype, B=2, n_r=24, n_c=20, cp_half=8, c=16, n_bins=7,
                  same_pos=False, seed=21):
    """Random args in _xla_edge_embedder order; rectangular and
    non-tile-multiple shapes exercise the bwd kernel's padding and
    per-batch accumulators. ``same_pos`` makes pos_rows equal pos_cols
    (square case) whose d=0 diagonal NaNs the XLA twin's pos grads."""
    rng = np.random.default_rng(seed)

    def arr(*shape, scale=1.0):
        return jnp.asarray(rng.normal(size=shape) * scale, dtype=dtype)

    cp = 4 * cp_half
    g = arr(B, n_r, cp)
    h = arr(B, n_c, cp)
    pos_rows = jnp.asarray(
        rng.normal(size=(B, n_r, 3)).astype(np.float32) * 6
    )
    if same_pos:
        assert n_r == n_c
        pos_cols = pos_rows
    else:
        pos_cols = jnp.asarray(
            rng.normal(size=(B, n_c, 3)).astype(np.float32) * 6
        )
    i_term = arr(B, n_r, c)
    j_term = arr(B, n_c, c)
    rmask_np = np.ones((B, n_r), np.float32)
    rmask_np[:, -3:] = 0.0
    cmask_np = np.ones((B, n_c), np.float32)
    cmask_np[:, -2:] = 0.0
    lower = np.linspace(1e-3, 12.0, n_bins)
    upper = np.concatenate([lower[1:], [1e8]])
    return (
        jnp.asarray(rng.normal(size=(B, n_r, n_c, c)), dtype),  # cotangent
        (
            g, h, pos_rows, pos_cols, i_term, j_term,
            jnp.asarray(rmask_np, dtype), jnp.asarray(cmask_np, dtype),
            arr(cp, c, scale=0.3), arr(n_bins, c, scale=0.3),  # w_rel/w_dist
            arr(c, scale=0.3),  # b0
            arr(c, c, scale=0.3), arr(c, scale=0.3),  # w1/b1
            arr(c, c, scale=0.3), arr(c, scale=0.3),  # w2/b2
            jnp.asarray(1.0 + 0.1 * rng.normal(size=c), jnp.float32),
            jnp.asarray(0.1 * rng.normal(size=c), jnp.float32),
        ),
        (tuple(float(x) for x in lower), tuple(float(x) for x in upper)),
    )


_EMB_ARG_NAMES = (
    "g h pos_rows pos_cols i_term j_term row_mask col_mask "
    "w_rel w_dist b0 w1 b1 w2 b2 ln_scale ln_bias"
).split()


def test_edge_embedder_bwd_kernel_matches_xla_vjp():
    """fused_edge_embedder_bwd must reproduce every cotangent of
    jax.vjp(_xla_edge_embedder, ...) — CP factor grads, O(N) node-term
    grads, mask grads, and the grid-reduced weight/bias/LN grads — except
    pos grads, which the kernel returns as exact zeros (the one-hot
    distogram is a step function; with distinct random coordinates the
    twin's pos grads are exactly zero too, so they ARE compared here)."""
    from framedipt_tpu.model.pallas.edge_embedder import (
        _xla_edge_embedder,
        fused_edge_embedder_bwd,
    )

    cot, args, (lower, upper) = _emb_bwd_args(jnp.float32)
    _, vjp = jax.vjp(
        lambda *a: _xla_edge_embedder(*a, lower, upper), *args
    )
    want = vjp(cot)
    with pltpu.force_tpu_interpret_mode():
        got = fused_edge_embedder_bwd(
            cot, *args, bins_lower=lower, bins_upper=upper,
            tile_i=8, tile_j=16, interpret=True,
        )
    assert len(want) == len(got) == len(_EMB_ARG_NAMES)
    for name, a, b in zip(_EMB_ARG_NAMES, want, got):
        assert b.dtype == a.dtype, name
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-4, rtol=3e-4,
            err_msg=name,
        )


def test_edge_embedder_bwd_kernel_square_identical_pos():
    """The production (square) case: pos_rows is pos_cols, so the twin's
    pos grads are NaN on the d=0 diagonal (0 x d(sqrt)(0)); the kernel
    must return exact zeros there and match the twin everywhere else."""
    from framedipt_tpu.model.pallas.edge_embedder import (
        _xla_edge_embedder,
        fused_edge_embedder_bwd,
    )

    cot, args, (lower, upper) = _emb_bwd_args(
        jnp.float32, n_r=20, n_c=20, same_pos=True, seed=22
    )
    _, vjp = jax.vjp(
        lambda *a: _xla_edge_embedder(*a, lower, upper), *args
    )
    want = vjp(cot)
    with pltpu.force_tpu_interpret_mode():
        got = fused_edge_embedder_bwd(
            cot, *args, bins_lower=lower, bins_upper=upper,
            tile_i=8, tile_j=16, interpret=True,
        )
    for name, a, b in zip(_EMB_ARG_NAMES, want, got):
        if name in ("pos_rows", "pos_cols"):
            assert not np.asarray(b).any(), name
            continue
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-4, rtol=3e-4,
            err_msg=name,
        )


def test_edge_embedder_bwd_kernel_bf16_close_to_xla_vjp():
    """bf16: fused backward vs the twin's VJP differ only in rounding
    order (both accumulate matmuls in f32). No b0 pre-fold needed: the
    backward now takes b0 as its own ref and adds it after i0 + j0, the
    forward's exact addition order, so the recomputed relu mask is
    bit-identical to the actual forward's (ADVICE r4)."""
    from framedipt_tpu.model.pallas.edge_embedder import (
        _xla_edge_embedder,
        fused_edge_embedder_bwd,
    )

    cot, args, (lower, upper) = _emb_bwd_args(jnp.bfloat16, seed=23)
    _, vjp = jax.vjp(
        lambda *a: _xla_edge_embedder(*a, lower, upper), *args
    )
    want = vjp(cot)
    with pltpu.force_tpu_interpret_mode():
        got = fused_edge_embedder_bwd(
            cot, *args, bins_lower=lower, bins_upper=upper,
            tile_i=8, tile_j=16, interpret=True,
        )
    for name, a, b in zip(_EMB_ARG_NAMES, want, got):
        a32 = np.asarray(a, np.float32)
        b32 = np.asarray(b, np.float32)
        assert np.isfinite(b32).all(), name
        scale = max(1.0, np.abs(a32).max())
        assert np.abs(a32 - b32).max() / scale < 0.08, name


def test_embedder_pallas_bwd_through_module():
    """Embedder with pallas_emb_bwd_impl='pallas': parameter grads through
    the fused backward kernel must match the plain XLA embedder's
    (sc_ca_t is stop-gradded in training, so its zero-vs-NaN pos grad
    difference never reaches parameters)."""
    emb_xla, feats, mask = _tiny_embedder_setup(n=16, use_pallas=False)
    emb_pal, _, _ = _tiny_embedder_setup(
        n=16, use_pallas=True, emb_bwd="pallas"
    )
    params = emb_xla.init(jax.random.PRNGKey(0), **feats)
    params = jax.tree_util.tree_map(
        lambda x: x
        + 0.05 * np.random.default_rng(24).normal(size=x.shape).astype(
            np.float32
        ),
        params,
    )
    cot = jnp.asarray(
        np.random.default_rng(25).normal(size=(1, 16, 16, 16)).astype(
            np.float32
        )
    )

    def loss_xla(p):
        _, e = emb_xla.apply(p, **feats)
        e = e * (mask[:, :, None] * mask[:, None, :])[..., None]
        return jnp.sum(e * cot)

    def loss_pal(p):
        _, e = emb_pal.apply(p, **feats, node_mask=mask)
        return jnp.sum(e * cot)

    g_xla = jax.grad(loss_xla)(params)
    with pltpu.force_tpu_interpret_mode():
        g_pal = jax.grad(loss_pal)(params)
    flat_x, _ = jax.tree_util.tree_flatten(g_xla)
    flat_p, _ = jax.tree_util.tree_flatten(g_pal)
    for a, b in zip(flat_x, flat_p):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-3, rtol=5e-3
        )


def test_fused_ipa_attention_matches_xla():
    """Fused IPA attention kernel (one pass over z, augmented point-logit
    matmul) vs the XLA module path, through InvariantPointAttention with a
    ragged mask and non-trivial frames."""
    from framedipt_tpu.geometry.rigid import Rigid
    from framedipt_tpu.model.ipa import InvariantPointAttention
    from framedipt_tpu.tools.config import Config

    cfg = Config()
    ipa_conf = cfg.model.ipa
    import dataclasses

    ipa_conf = dataclasses.replace(
        ipa_conf,
        c_s=32, c_z=16, c_hidden=16, no_heads=2,
        no_qk_points=4, no_v_points=4,
    )
    rng = np.random.default_rng(21)
    B, N = 1, 20
    s = jnp.asarray(rng.normal(size=(B, N, 32)).astype(np.float32))
    z = jnp.asarray(rng.normal(size=(B, N, N, 16)).astype(np.float32))
    mask_np = np.ones((B, N), np.float32)
    mask_np[:, -4:] = 0.0
    mask = jnp.asarray(mask_np)
    qs = rng.normal(size=(B, N, 4)).astype(np.float32)
    qs /= np.linalg.norm(qs, axis=-1, keepdims=True)
    trans = rng.normal(size=(B, N, 3)).astype(np.float32) * 3
    rigids = Rigid.from_tensor7(
        jnp.asarray(np.concatenate([qs, trans], -1))
    )

    ipa_xla = InvariantPointAttention(ipa_conf, use_pallas=False)
    params = ipa_xla.init(jax.random.PRNGKey(0), s, z, rigids, mask)
    params = jax.tree_util.tree_map(
        lambda x: x
        + 0.05 * np.random.default_rng(22).normal(size=x.shape).astype(
            np.float32
        ),
        params,
    )
    out_xla = ipa_xla.apply(params, s, z, rigids, mask)

    ipa_pal = InvariantPointAttention(ipa_conf, use_pallas=True)
    with pltpu.force_tpu_interpret_mode():
        out_pal = ipa_pal.apply(params, s, z, rigids, mask)
    # Masked rows: the XLA path leaves uniform-softmax garbage, the kernel
    # zeroes its attention outputs; both are node-masked downstream, so
    # compare valid rows only and require masked rows finite.
    assert np.isfinite(np.asarray(out_pal)).all()
    m3 = mask_np[..., None]
    np.testing.assert_allclose(
        np.asarray(out_xla) * m3, np.asarray(out_pal) * m3,
        atol=2e-4, rtol=1e-3,
    )


def _bwd_args(residual: bool, dtype, B=2, n_r=24, n_c=20, c_in=8, h=32, c_out=8):
    """Random args in _xla_pair_mlp order; rectangular + non-tile-multiple
    shapes exercise the bwd kernel's padding and per-batch accumulators."""
    rng = np.random.default_rng(17 if residual else 18)

    def arr(*shape, scale=1.0):
        return jnp.asarray(rng.normal(size=shape) * scale, dtype=dtype)

    pair = arr(B, n_r, n_c, c_in)
    i_term = arr(B, n_r, h)
    j_term = arr(B, n_c, h)
    rmask_np = np.ones((B, n_r), np.float32)
    rmask_np[:, -3:] = 0.0
    cmask_np = np.ones((B, n_c), np.float32)
    cmask_np[:, -2:] = 0.0
    rmask = jnp.asarray(rmask_np, dtype=dtype)
    cmask = jnp.asarray(cmask_np, dtype=dtype)
    w0 = arr(c_in, h, scale=0.3)
    b0 = arr(h, scale=0.3)
    w1 = arr(h, h, scale=0.3)
    b1 = arr(h, scale=0.3)
    wf = arr(h, c_out, scale=0.3)
    bf = arr(c_out, scale=0.3)
    lns = jnp.asarray(1.0 + 0.1 * rng.normal(size=c_out), jnp.float32)
    lnb = jnp.asarray(0.1 * rng.normal(size=c_out), jnp.float32)
    if residual:
        fi = arr(B, n_r, c_out)
        fj = arr(B, n_c, c_out)
        wfe = arr(c_in, c_out, scale=0.3)
    else:
        fi = fj = wfe = None
    g = arr(B, n_r, n_c, c_out)
    return g, (pair, i_term, j_term, rmask, cmask,
               w0, b0, w1, b1, wf, bf, lns, lnb, fi, fj, wfe)


@pytest.mark.parametrize("residual", [True, False])
def test_pallas_bwd_kernel_matches_xla_vjp(residual):
    """fused_pair_mlp_bwd (one fused backward kernel) must reproduce every
    cotangent of jax.vjp(_xla_pair_mlp, ...): data grads, O(N) row/column
    term grads, mask grads, and the grid-reduced weight/bias/LN grads."""
    from framedipt_tpu.model.pallas.pair_mlp import (
        _xla_pair_mlp,
        fused_pair_mlp_bwd,
    )

    g, args = _bwd_args(residual, jnp.float32)
    _, vjp = jax.vjp(_xla_pair_mlp, *args)
    want = vjp(g)
    with pltpu.force_tpu_interpret_mode():
        got = fused_pair_mlp_bwd(g, *args, tile_i=8, tile_j=16, interpret=True)

    names = (
        "pair i_term j_term row_mask col_mask w0 b0 w1 b1 wf bf "
        "ln_scale ln_bias fi fj wfe"
    ).split()
    assert len(want) == len(got) == len(names)
    for name, a, b in zip(names, want, got):
        assert (a is None) == (b is None), name
        if a is None:
            continue
        assert b.dtype == a.dtype, name
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-4,
            err_msg=name,
        )


def test_pallas_bwd_kernel_bf16_close_to_xla_vjp():
    """Under bf16 the fused backward and the XLA twin's VJP differ only in
    rounding order (both accumulate matmuls in f32); grads must agree to
    bf16 tolerance and be finite.

    Biases are pre-folded to zero here: the bwd kernel folds b0 into i_term
    (bf16 reassociation), which can flip a relu mask for pre-activations
    within 1 ulp of zero and toggle that element's entire grad contribution
    — an inherent property of any bf16 reassociation, not an accumulation
    error. The f32 variant of this test covers the fold exactly."""
    from framedipt_tpu.model.pallas.pair_mlp import (
        _xla_pair_mlp,
        fused_pair_mlp_bwd,
    )

    g, args = _bwd_args(True, jnp.bfloat16)
    (pair, i_term, j_term, rmask, cmask,
     w0, b0, w1, b1, wf, bf, lns, lnb, fi, fj, wfe) = args
    args = (pair, i_term + b0, j_term, rmask, cmask,
            w0, jnp.zeros_like(b0), w1, b1, wf, jnp.zeros_like(bf),
            lns, lnb, fi + bf, fj, wfe)
    _, vjp = jax.vjp(_xla_pair_mlp, *args)
    want = vjp(g)
    with pltpu.force_tpu_interpret_mode():
        got = fused_pair_mlp_bwd(g, *args, tile_i=8, tile_j=16, interpret=True)
    for a, b in zip(want, got):
        if a is None:
            continue
        a32 = np.asarray(a, np.float32)
        b32 = np.asarray(b, np.float32)
        assert np.isfinite(b32).all()
        scale = max(1.0, np.abs(a32).max())
        assert np.abs(a32 - b32).max() / scale < 0.08


def test_edge_transition_pallas_bwd_gradients():
    """EdgeTransition with bwd_impl='pallas' (fused backward kernel) must
    match the plain XLA EdgeTransition's parameter/input gradients through
    the module plumbing (w0/wf slicing, b0/bf folds, shared masks)."""
    rng = np.random.default_rng(7)
    B, n, Cs, Ce = 1, 24, 64, 32
    node = jnp.asarray(rng.normal(size=(B, n, Cs)).astype(np.float32))
    edge = jnp.asarray(rng.normal(size=(B, n, n, Ce)).astype(np.float32))
    mask_np = np.ones((B, n), np.float32)
    mask_np[:, -3:] = 0.0
    mask = jnp.asarray(mask_np)
    cot = jnp.asarray(rng.normal(size=(B, n, n, Ce)).astype(np.float32))

    et_xla = EdgeTransition(node_embed_size=Cs, edge_embed_out=Ce)
    params = et_xla.init(jax.random.PRNGKey(0), node, edge)
    params = jax.tree_util.tree_map(
        lambda x: x
        + 0.05 * np.random.default_rng(8).normal(size=x.shape).astype(np.float32),
        params,
    )

    def loss_xla(p, nd, ed):
        out = et_xla.apply(p, nd, ed)
        out = out * (mask[:, :, None] * mask[:, None, :])[..., None]
        return jnp.sum(out * cot)

    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(params, node, edge)

    et_pallas = EdgeTransition(
        node_embed_size=Cs, edge_embed_out=Ce, use_pallas=True,
        tile_i=8, tile_j=128, bwd_impl="pallas",
    )

    def loss_pallas(p, nd, ed):
        out = et_pallas.apply(p, nd, ed, node_mask=mask)
        return jnp.sum(out * cot)

    with pltpu.force_tpu_interpret_mode():
        g_pallas = jax.grad(loss_pallas, argnums=(0, 1, 2))(params, node, edge)

    flat_x, _ = jax.tree_util.tree_flatten(g_xla)
    flat_p, _ = jax.tree_util.tree_flatten(g_pallas)
    assert len(flat_x) == len(flat_p)
    for a, b in zip(flat_x, flat_p):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-4
        )


@pytest.mark.skipif(
    not os.environ.get("FRAMEDIPT_TPU_TESTS"),
    reason="real-TPU smoke; set FRAMEDIPT_TPU_TESTS=1 on a TPU host",
)
def test_tpu_smoke_bwd_kernel():
    """Mosaic-compile + run the fused backward at the production
    EdgeTransition shape on the real backend (interpret mode never
    exercises Mosaic lowering or the VMEM budget). Subprocess: the test
    conftest pins this process to CPU."""
    import pathlib
    import subprocess
    import sys as _sys

    script = (
        pathlib.Path(__file__).parent.parent.parent
        / "scripts" / "tpu_smoke_bwd.py"
    )
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    proc = subprocess.run(
        [_sys.executable, str(script)],
        capture_output=True, text=True, timeout=900, env=env,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "PASS" in proc.stdout
