"""Pallas kernel correctness vs the XLA formulation (interpret mode on CPU)."""
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
            pair, i_term, j_term, jnp.asarray(mask),
            w0, b0, w1, b1, wf, bf, lns, lnb,
            tile_i=8, tile_j=16,
        )
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), atol=1e-5)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
