"""Fused Invariant-Point-Attention Pallas TPU kernel.

The XLA IPA path (model/ipa.py, contract of ref
framedipt/model/ipa_pytorch.py:105-329) reads the pair rep z TWICE per block
(pair-bias projection + down_z) and round-trips the [N^2, 32] down-projected
pair rep and the [H, N, N] logits through HBM: ~190 MB of traffic per call at
N=512 against ~5 GFLOP — fully HBM-bound (measured 0.26 ms/call, 25% of the
sampler step). This kernel computes the whole attention — scalar qk + pair
bias + point-distance logits, softmax, and the scalar/point/pair outputs —
with ONE pass over z and no [N, N] intermediate in HBM.

Design notes (TPU/Mosaic):
- **Grid (B, rows, heads), full key rows in VMEM.** The head is a grid
  dimension (innermost, so the z row-block is loaded once per row tile and
  revisited across heads): per-head k/v/point blocks are [N, C]-sized and
  head "slicing" is just BlockSpec indexing — no lane-offset slices. With
  all keys resident, softmax is a plain row softmax — no online-softmax
  accumulators. (A first version put all heads in one program: 19 MB of
  VMEM stack at N=512, over the 16 MB budget.)
- **Point logits as one augmented matmul.** The reference's point term
  -0.5 * w_h * |q_i - k_j|^2 is folded into a single per-head MXU matmul by
  pre-scaling the global-frame points with sqrt(0.5 * w_h) and augmenting
  two lanes: qhat = [2*q', -|q'|^2, -1, 0...], khat = [k', 1, |k'|^2, 0...]
  so qhat . khat = 2 q'k' - |q'|^2 - |k'|^2 exactly (f32, like the XLA
  path's point logits).
- **Pair bias / pair value: ONE projection pass per z tile.** Both pair
  projections (all-head bias z @ Wb and pair value z @ Wdz) are
  head-independent, so they run once at head 0 into VMEM scratch that
  persists across the sequential innermost head iterations; each head then
  selects its bias lane with a VPU one-hot reduce. (The round-2 version
  projected inside every head step — 16 MXU passes over the z tile per
  row tile, 8 of them matvecs at 8/128 lane utilization — which is why it
  lost to XLA.) The attention-weighted pair output
  o_pair[i, d] = sum_j p[i, j] pz[i, j, d] is a per-row contraction
  (both operands depend on i); Mosaic cannot lower it as a batched
  dot_general (rank-1 per batch), so it is phrased as ONE block-diagonal
  matmul: p tiled TI times along lanes, masked to the block-diagonal band,
  then [TI, TI*N] @ [TI*N, dz] on the MXU.
- All matmuls accumulate f32 on the MXU; softmax is f32; the p used for the
  scalar/pair outputs is cast to the compute dtype, matching the XLA
  formulation's einsum dtypes.

Status (round-3 closure, PERF.md): flag-gated REFERENCE implementation,
off by default. The single-projection rewrite recovered part of the
round-2 deficit (full-sampler interleaved A/B: -37% at len-512 vs -41%
before; -0.8% at len-1024 vs +0.9%) but cannot win: in context XLA already
multi-output-fuses both pair projections with z's producer (one HBM sweep)
and runs the N^2 pair path at ~89% of v5e HBM speed-of-light, so the
custom-call fusion boundary costs more than the <=11% theoretical headroom.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32
PT_PAD = 128  # per-head lane padding of the augmented point vectors


def _ipa_attention_kernel(
    inf: float,
    q_ref,  # [1, TI, C]       (pre-scaled by sqrt(1/(3C)))
    k_ref,  # [1, N,  C]
    v_ref,  # [1, N,  C]
    qpt_ref,  # [1, TI, PT_PAD] f32 augmented points (see module doc)
    kpt_ref,  # [1, N,  PT_PAD] f32
    vpt_ref,  # [1, N,  PT_PAD] f32 (3*Pv useful lanes)
    z_ref,  # [1, TI, N, c_z]
    rmask_ref,  # [1, TI, 1]
    cmask_ref,  # [1, 1, N]
    wb_ref,  # [c_z, H] (sqrt(1/3)-scaled)
    wdz_ref,  # [c_z, dz]
    o_ref,  # [1, TI, C] f32
    opt_ref,  # [1, TI, PT_PAD] f32
    opair_ref,  # [1, TI, dz] f32
    zb_ref,  # scratch [TI*N, H] f32: all-head pair-bias logits
    pz_ref,  # scratch [TI*N, dz] compute dtype: down-projected pair rep
):
    _, ti, _ = q_ref.shape
    n = k_ref.shape[1]
    c_z = z_ref.shape[3]
    n_heads = zb_ref.shape[1]
    dtype = q_ref.dtype

    dn = (((1,), (1,)), ((), ()))  # contract lane dims, no batch

    # Both pair projections are head-independent per z element, so they run
    # ONCE per z row-tile — at head 0, into scratch that persists across
    # the (sequential, innermost) head grid iterations. The earlier
    # formulation projected inside every head step: 16 MXU passes over the
    # z tile per row tile (8 bias matvecs at 8/128 lane utilization + the
    # same down_z product 8 times) vs 2 now — this was the measured reason
    # the kernel lost to XLA (PERF.md round-2 negative result).
    h = pl.program_id(2)

    @pl.when(h == 0)
    def _project_pair():
        z_flat = z_ref[0].reshape(ti * n, c_z)
        zb_ref[...] = jax.lax.dot_general(
            z_flat, wb_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=F32,
        )  # [TI*N, H]
        pz_ref[...] = jnp.dot(
            z_flat, wdz_ref[:], preferred_element_type=F32
        ).astype(dtype)  # [TI*N, dz]

    logits = jax.lax.dot_general(
        q_ref[0], k_ref[0], dn, preferred_element_type=F32
    )  # [TI, N]
    logits = logits + jax.lax.dot_general(
        qpt_ref[0], kpt_ref[0], dn, preferred_element_type=F32
    )
    # This head's bias: VPU one-hot lane reduce of the precomputed all-head
    # bias (a width-1 lane slice at a dynamic offset is not supported, and
    # a per-head matvec would be another full MXU pass over the tile).
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (1, n_heads), 1) == h
    ).astype(F32)
    zb = jnp.sum(zb_ref[...] * onehot, axis=1, keepdims=True)  # [TI*N, 1]
    # Mask term: -inf outside valid (i, j) pairs (reference semantics).
    maskterm = inf * (
        rmask_ref[0].astype(F32) * cmask_ref[0].astype(F32) - 1.0
    )
    logits = logits + zb.reshape(ti, n) + maskterm

    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)  # [TI, N] f32

    # Fully-masked rows get an exactly-zero output (the XLA path leaves
    # uniform-softmax garbage there; both are node-masked downstream).
    rm = rmask_ref[0].astype(F32)  # [TI, 1]
    p_c = p.astype(dtype)
    o_ref[0] = jnp.dot(p_c, v_ref[0], preferred_element_type=F32) * rm
    # Point output stays f32 end to end, as in the XLA path.
    opt_ref[0] = (
        jnp.dot(p, vpt_ref[0].astype(F32), preferred_element_type=F32) * rm
    )

    # Attention-weighted pair output via the block-diagonal matmul.
    band = (
        jax.lax.broadcasted_iota(jnp.int32, (ti, ti * n), 1) // n
        == jax.lax.broadcasted_iota(jnp.int32, (ti, ti * n), 0)
    ).astype(dtype)
    p_band = jnp.concatenate([p_c] * ti, axis=1) * band  # [TI, TI*N]
    opair_ref[0] = jnp.dot(
        p_band, pz_ref[...], preferred_element_type=F32
    ) * rm


@functools.partial(
    jax.jit,
    static_argnames=("no_heads", "c_hidden", "tile_i", "inf", "interpret"),
)
def fused_ipa_attention(
    q: jnp.ndarray,  # [B, N, H*C] compute dtype, pre-scaled
    k: jnp.ndarray,  # [B, N, H*C]
    v: jnp.ndarray,  # [B, N, H*C]
    q_pts_aug: jnp.ndarray,  # [B, N, H*PT_PAD] f32
    k_pts_aug: jnp.ndarray,  # [B, N, H*PT_PAD] f32
    v_pts_pad: jnp.ndarray,  # [B, N, H*PT_PAD] f32
    z: jnp.ndarray,  # [B, N, N, c_z] compute dtype
    node_mask: jnp.ndarray,  # [B, N]
    wb: jnp.ndarray,  # [c_z, H] (pre-scaled by sqrt(1/3))
    wdz: jnp.ndarray,  # [c_z, dz]
    *,
    no_heads: int,
    c_hidden: int,
    tile_i: int = 16,
    inf: float = 1e5,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (o [B,N,H*C] f32, o_pt [B,N,H*PT_PAD] f32 global-frame,
    o_pair [B,N,H*dz] f32). The o_pair lanes are computed 128-padded
    per head in-kernel and stripped here."""
    H, C = no_heads, c_hidden
    B, N, _ = q.shape
    c_z = z.shape[-1]
    dz = wdz.shape[-1]
    dtype = q.dtype

    # Lane-pad the down-projection so the per-head o_pair output block is a
    # full 128-lane tile; the wrapper strips the zero lanes at the end.
    dz_pad = (-dz) % 128
    if dz_pad:
        wdz = jnp.pad(wdz, ((0, 0), (0, dz_pad)))
    dzp = dz + dz_pad

    # Keys/cols pad to the f32 lane quantum; rows to the tile.
    pad_n = (-N) % 128
    tile_i = min(tile_i, max(8, -(-N // 8) * 8))
    pad_i = (-N) % tile_i
    if pad_n:
        k = jnp.pad(k, ((0, 0), (0, pad_n), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad_n), (0, 0)))
        k_pts_aug = jnp.pad(k_pts_aug, ((0, 0), (0, pad_n), (0, 0)))
        v_pts_pad = jnp.pad(v_pts_pad, ((0, 0), (0, pad_n), (0, 0)))
    if pad_i:
        q = jnp.pad(q, ((0, 0), (0, pad_i), (0, 0)))
        q_pts_aug = jnp.pad(q_pts_aug, ((0, 0), (0, pad_i), (0, 0)))
    if pad_i or pad_n:
        z = jnp.pad(z, ((0, 0), (0, pad_i), (0, pad_n), (0, 0)))
    rmask = jnp.pad(node_mask, ((0, 0), (0, pad_i))) if pad_i else node_mask
    cmask = jnp.pad(node_mask, ((0, 0), (0, pad_n))) if pad_n else node_mask
    n_rows, n_cols = q.shape[1], k.shape[1]

    # The head axis is a grid dimension: per-head blocks of the flat
    # [B, N, H*width] arrays are (1, ., width) at lane-block index h. It is
    # the INNERMOST, sequential ("arbitrary") dimension so the z row-tile
    # block and the pair-projection scratch computed at h == 0 stay
    # resident across the head iterations.
    grid = (B, n_rows // tile_i, H)

    def rowspec(w):
        return pl.BlockSpec(
            (1, tile_i, w), lambda b, i, h: (b, i, h), memory_space=pltpu.VMEM
        )

    def colspec(w):
        return pl.BlockSpec(
            (1, n_cols, w), lambda b, i, h: (b, 0, h), memory_space=pltpu.VMEM
        )

    in_specs = [
        rowspec(C),
        colspec(C),
        colspec(C),
        rowspec(PT_PAD),
        colspec(PT_PAD),
        colspec(PT_PAD),
        pl.BlockSpec(
            (1, tile_i, n_cols, c_z),
            lambda b, i, h: (b, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, tile_i, 1), lambda b, i, h: (b, i, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, 1, n_cols), lambda b, i, h: (b, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (c_z, H), lambda b, i, h: (0, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (c_z, dzp), lambda b, i, h: (0, 0), memory_space=pltpu.VMEM
        ),
    ]
    scratch_shapes = [
        pltpu.VMEM((tile_i * n_cols, H), F32),
        pltpu.VMEM((tile_i * n_cols, dzp), dtype),
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((B, n_rows, H * C), F32),
        jax.ShapeDtypeStruct((B, n_rows, H * PT_PAD), F32),
        jax.ShapeDtypeStruct((B, n_rows, H * dzp), F32),
    ]
    out_specs = [rowspec(C), rowspec(PT_PAD), rowspec(dzp)]

    flops = 2 * B * n_rows * n_cols * H * (C + PT_PAD + C + tile_i * dz) + (
        2 * B * n_rows * n_cols * c_z * (H + dz)  # single pair projection
    )
    o, opt, opair = pl.pallas_call(
        functools.partial(_ipa_attention_kernel, inf),
        out_shape=out_shapes,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=B
            * n_rows
            * n_cols
            * c_z
            * np.dtype(dtype).itemsize,
            transcendentals=B * n_rows * n_cols * H,
        ),
        interpret=interpret,
    )(
        q, k.astype(dtype), v.astype(dtype),
        q_pts_aug.astype(F32), k_pts_aug.astype(F32), v_pts_pad.astype(F32),
        z, rmask.astype(F32)[:, :, None], cmask.astype(F32)[:, None, :],
        wb.astype(dtype), wdz.astype(dtype),
    )
    if pad_i:
        o, opt, opair = o[:, :N], opt[:, :N], opair[:, :N]
    if dz_pad:
        opair = opair.reshape(B, N, H, dzp)[..., :dz].reshape(B, N, H * dz)
    return o, opt, opair


def build_point_inputs(
    q_pts: jnp.ndarray,  # [B, N, H, Pq, 3] global-frame query points
    k_pts: jnp.ndarray,  # [B, N, H, Pq, 3]
    v_pts: jnp.ndarray,  # [B, N, H, Pv, 3]
    pt_weights: jnp.ndarray,  # [H] softplus'd head weights * sqrt(1/(3*(Pq*9/2)))
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Pre-scale and augment the point tensors so the kernel's per-head
    point-logit matmul computes -0.5 * w_h * |q - k|^2 exactly:

        q' = sqrt(0.5 w_h) q,  k' = sqrt(0.5 w_h) k
        qhat = [2 q', -|q'|^2, -1, 0.pad],  khat = [k', 1, |k'|^2, 0.pad]
        qhat . khat = 2 q'k' - |q'|^2 - |k'|^2 = -0.5 w_h |q - k|^2
    """
    B, N, H, Pq, _ = q_pts.shape
    Pv = v_pts.shape[3]
    s = jnp.sqrt(0.5 * pt_weights).astype(F32)[None, None, :, None, None]
    qs = (q_pts.astype(F32) * s).reshape(B, N, H, Pq * 3)
    ks = (k_pts.astype(F32) * s).reshape(B, N, H, Pq * 3)
    sq_q = jnp.sum(qs * qs, axis=-1, keepdims=True)
    sq_k = jnp.sum(ks * ks, axis=-1, keepdims=True)
    ones = jnp.ones_like(sq_q)
    qhat = jnp.concatenate([2.0 * qs, -sq_q, -ones], axis=-1)
    khat = jnp.concatenate([ks, ones, sq_k], axis=-1)
    qhat = jnp.pad(qhat, ((0, 0), (0, 0), (0, 0), (0, PT_PAD - Pq * 3 - 2)))
    khat = jnp.pad(khat, ((0, 0), (0, 0), (0, 0), (0, PT_PAD - Pq * 3 - 2)))
    vpad = jnp.pad(
        v_pts.astype(F32).reshape(B, N, H, Pv * 3),
        ((0, 0), (0, 0), (0, 0), (0, PT_PAD - Pv * 3)),
    )
    return (
        qhat.reshape(B, N, H * PT_PAD),
        khat.reshape(B, N, H * PT_PAD),
        vpad.reshape(B, N, H * PT_PAD),
    )
