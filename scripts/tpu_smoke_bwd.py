"""Real-TPU smoke for the fused pair-MLP backward kernel.

Interpret-mode tests validate the math but never exercise Mosaic
compilation (dynamic-offset accumulate stores, per-batch full-column f32
accumulator blocks) or the VMEM budget at the production EdgeTransition
shape. This script compiles and runs the kernel on the real backend at
N=512 / h=384 / bf16 (the published config's edge transition) and checks
the gradients are finite and close to the XLA twin's VJP.

Run: python scripts/tpu_smoke_bwd.py [N] [tile_i] [tile_j]
Exit 0 on PASS. Gated into pytest via FRAMEDIPT_TPU_TESTS=1
(tests/unit/test_pallas_kernels.py::test_tpu_smoke_bwd_kernel).
"""
from __future__ import annotations

import sys

import numpy as np

import jax
import jax.numpy as jnp


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    tile_i = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    tile_j = int(sys.argv[3]) if len(sys.argv) > 3 else 128

    from framedipt_tpu.model.pallas.pair_mlp import (
        _xla_pair_mlp,
        fused_pair_mlp_bwd,
    )

    platform = next(iter(jnp.zeros(()).devices())).platform
    print(f"backend platform: {platform}")

    rng = np.random.default_rng(3)
    B, c_in, h, c_out = 1, 128, 384, 128
    bf16 = jnp.bfloat16

    def arr(*shape, scale=1.0):
        return jnp.asarray(rng.normal(size=shape) * scale, dtype=bf16)

    pair = arr(B, n, n, c_in)
    # Pre-folded biases: the b0 fold is a bf16 reassociation that can flip
    # relu masks within 1 ulp of zero (see test_pallas_kernels bf16 note).
    i_term = arr(B, n, h)
    j_term = arr(B, n, h)
    mask = jnp.ones((B, n), jnp.float32)
    w0 = arr(c_in, h, scale=0.3)
    b0 = jnp.zeros((h,), bf16)
    w1 = arr(h, h, scale=0.3)
    b1 = arr(h, scale=0.3)
    wf = arr(h, c_out, scale=0.3)
    bf = jnp.zeros((c_out,), bf16)
    lns = jnp.ones((c_out,), jnp.float32)
    lnb = jnp.zeros((c_out,), jnp.float32)
    fi = arr(B, n, c_out)
    fj = arr(B, n, c_out)
    wfe = arr(c_in, c_out, scale=0.3)
    g = arr(B, n, n, c_out)
    args = (pair, i_term, j_term, mask, mask,
            w0, b0, w1, b1, wf, bf, lns, lnb, fi, fj, wfe)

    got = fused_pair_mlp_bwd(g, *args, tile_i=tile_i, tile_j=tile_j)
    got = jax.block_until_ready(got)
    print("compiled + ran on", platform)

    _, vjp = jax.vjp(_xla_pair_mlp, *args)
    want = jax.block_until_ready(vjp(g))

    worst = 0.0
    for idx, (a, b) in enumerate(zip(want, got)):
        if a is None:
            continue
        a32 = np.asarray(a, np.float32)
        b32 = np.asarray(b, np.float32)
        if not np.isfinite(b32).all():
            print(f"FAIL: non-finite grad at arg {idx}")
            return 1
        rel = np.abs(a32 - b32).max() / max(1.0, np.abs(a32).max())
        worst = max(worst, float(rel))
    print(f"worst relative grad diff vs XLA twin: {worst:.4f}")
    if worst > 0.08:
        print("FAIL: grads diverge from the XLA twin beyond bf16 tolerance")
        return 1
    print("pair-MLP backward PASS")
    return smoke_embedder_bwd(n, rng)


def smoke_embedder_bwd(n: int, rng) -> int:
    """Mosaic-compile + run the fused edge-embedder backward at the
    published embedder shape (cp=128 CP factors, C=128, 22 distogram
    bins) and check grads vs the XLA twin (b0 pre-folded, bf16)."""
    from framedipt_tpu.model.pallas.edge_embedder import (
        _xla_edge_embedder,
        fused_edge_embedder_bwd,
    )

    B, cp, c, n_bins = 1, 128, 128, 22
    bf16 = jnp.bfloat16

    def arr(*shape, scale=1.0):
        return jnp.asarray(rng.normal(size=shape) * scale, dtype=bf16)

    lower = np.linspace(1e-3, 20.0, n_bins)
    upper = np.concatenate([lower[1:], [1e8]])
    lower_t = tuple(float(x) for x in lower)
    upper_t = tuple(float(x) for x in upper)
    pos = jnp.asarray(rng.normal(size=(B, n, 3)).astype(np.float32) * 8)
    args = (
        arr(B, n, cp), arr(B, n, cp), pos, pos,
        arr(B, n, c), arr(B, n, c),
        jnp.ones((B, n), bf16), jnp.ones((B, n), bf16),
        arr(cp, c, scale=0.3), arr(n_bins, c, scale=0.3),
        jnp.zeros((c,), bf16),  # b0 pre-folded (bf16 relu-flip note)
        arr(c, c, scale=0.3), arr(c, scale=0.3),
        arr(c, c, scale=0.3), arr(c, scale=0.3),
        jnp.ones((c,), jnp.float32), jnp.zeros((c,), jnp.float32),
    )
    cot = arr(B, n, n, c)

    got = fused_edge_embedder_bwd(
        cot, *args, bins_lower=lower_t, bins_upper=upper_t
    )
    got = jax.block_until_ready(got)
    print("embedder backward compiled + ran")

    _, vjp = jax.vjp(
        lambda *a: _xla_edge_embedder(*a, lower_t, upper_t), *args
    )
    want = jax.block_until_ready(vjp(cot))
    worst = 0.0
    for idx, (a, b) in enumerate(zip(want, got)):
        if idx in (2, 3):  # pos grads: kernel returns exact zeros
            if np.asarray(b).any():
                print(f"FAIL: nonzero pos grad at arg {idx}")
                return 1
            continue
        b32 = np.asarray(b, np.float32)
        if not np.isfinite(b32).all():
            print(f"FAIL: non-finite embedder grad at arg {idx}")
            return 1
        a32 = np.asarray(a, np.float32)
        rel = np.abs(a32 - b32).max() / max(1.0, np.abs(a32).max())
        worst = max(worst, float(rel))
    print(f"embedder worst relative grad diff vs XLA twin: {worst:.4f}")
    if worst > 0.08:
        print("FAIL: embedder grads diverge beyond bf16 tolerance")
        return 1
    print("PASS")
    return 0


if __name__ == "__main__":
    sys.exit(main())
