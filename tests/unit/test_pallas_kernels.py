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
    et = EdgeTransition(node_embed_size=Cs, edge_embed_out=Ce)
    params = et.init(jax.random.PRNGKey(0), node, edge)
    params = jax.tree_util.tree_map(
        lambda x: x
        + 0.05 * np.random.default_rng(1).normal(size=x.shape).astype(np.float32),
        params,
    )
    out_xla = et.apply(params, node, edge)
    et_pallas = EdgeTransition(
        node_embed_size=Cs, edge_embed_out=Ce, use_pallas=True
    )
    with pltpu.force_tpu_interpret_mode():
        out_pallas = et_pallas.apply(params, node, edge)
    np.testing.assert_allclose(
        np.asarray(out_xla), np.asarray(out_pallas), atol=1e-5
    )


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
