"""Fully-fused edge-embedder Pallas TPU kernel: pairwise features synthesized
in VMEM from O(N) inputs.

The Embedder's edge branch (ref framedipt/model/score_network.py:114-127,
176-195) feeds concat([node_i, node_j, rel_offset_embedding, distogram]) to a
3-layer MLP over the N x N grid. A kernel that fuses only the MLP loses: the
[N^2, 54] pairwise-feature producers (rel-offset sinusoids + self-conditioning
CA distogram) then materialize to HBM, where XLA had fused them into the first
matmul (PERF.md round-2 "what didn't"). This kernel goes one level deeper and
synthesizes BOTH producers inside the kernel, so its HBM traffic is O(N) reads
plus one [N, N, C] output write:

- **Rel-offset embedding via angle addition.** The sinusoidal embedding of
  (i - j) obeys sin((i-j)x) = sin(ix)cos(jx) - cos(ix)sin(jx) (and the cosine
  analogue), so the [N, N, 32] embedding is a rank-64 CP product of per-row /
  per-column factors G, H in [N, 64] (``rel_cp_factors``). In-kernel the tile
  contribution is (G_i * H_j) @ W'_rel with the first-layer kernel rows
  duplicated to match (``expand_w_rel``) — exact in real arithmetic, and in
  bf16 no worse than the XLA path's bf16 cast of the materialized embedding
  (products are accumulated in f32 on the MXU either way).
- **Distogram via in-kernel distances.** Pairwise CA distance from the
  f32 row/col coordinate refs (direct difference, so the diagonal is exactly
  0, matching calc_distogram's all-zero diagonal one-hot), one lane-aligned
  broadcast compare against the 128-padded bin-edge refs, then a padded
  [n_bins, C] matmul. (A per-bin compare loop + stack relayouts every slice
  and measured 23% SLOWER than no kernel at all; the aligned one-hot build
  is what makes this kernel win.)

The MLP chain + LayerNorm + edge-mask epilogue follow exactly as in
model/pallas/pair_mlp.py (same lessons: everything XLA would fuse around the
custom call must live inside it; fully parallel grid).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32


def rel_cp_factors(
    seq_idx: jnp.ndarray, embed_size: int, max_len: int = 2056
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """CP factors G, H in [..., 2*embed_size] whose elementwise product sums
    to the rel-offset sinusoid embedding: for every frequency x_k,

        sin((i-j)x_k) = s_i c_j + c_i (-s_j)
        cos((i-j)x_k) = c_i c_j + s_i s_j

    Layout: G = [s, c, c, s], H = [c, -s, c, s] (each block of K=embed_size/2
    frequencies), matching :func:`expand_w_rel`'s row duplication.
    """
    k = jnp.arange(embed_size // 2, dtype=jnp.float32)
    x = np.pi / max_len ** (2.0 * k / embed_size)
    ang = seq_idx.astype(jnp.float32)[..., None] * x
    s, c = jnp.sin(ang), jnp.cos(ang)
    g = jnp.concatenate([s, c, c, s], axis=-1)
    h = jnp.concatenate([c, -s, c, s], axis=-1)
    return g, h


def expand_w_rel(w_rel: jnp.ndarray) -> jnp.ndarray:
    """Duplicate the rel-embedding kernel rows [2K, C] -> [4K, C] so that
    (G * H) @ expand_w_rel(W) == rel_embed(i - j) @ W (sin rows first, then
    cos rows, as produced by get_index_embedding)."""
    K = w_rel.shape[0] // 2
    ws, wc = w_rel[:K], w_rel[K:]
    return jnp.concatenate([ws, ws, wc, wc], axis=0)


def _edge_embedder_kernel(
    g_ref, h_ref,  # [1, TI, 4K] / [1, TJ, 4K]
    xr_ref, yr_ref, zr_ref,  # [1, TI, 1] f32 row coordinates
    xc_ref, yc_ref, zc_ref,  # [1, 1, TJ] f32 col coordinates
    i0_ref, j0_ref,  # [1, TI, C] / [1, TJ, C] first-layer node terms
    rmask_ref, cmask_ref,  # [1, TI, 1] / [1, 1, TJ]
    wrel_ref,  # [4K, C]
    wdist_ref,  # [n_bins, C]
    lower_ref, upper_ref,  # [1, n_bins] f32 distance-bin edges
    b0_ref, w1_ref, b1_ref, w2_ref, b2_ref,  # MLP params
    lns_ref, lnb_ref,  # LayerNorm params (f32)
    out_ref,  # [1, TI, TJ, C]
):
    _, ti, cp = g_ref.shape
    tj = h_ref.shape[1]
    c = wrel_ref.shape[1]
    n_bins = wdist_ref.shape[0]
    dtype = g_ref.dtype

    # Rel-offset embedding contribution: (G_i * H_j) @ W'_rel.
    m = g_ref[0][:, None, :] * h_ref[0][None, :, :]  # [TI, TJ, 4K]
    x = jnp.dot(
        m.reshape(ti * tj, cp), wrel_ref[:], preferred_element_type=F32
    ).astype(dtype)

    # Distogram contribution: in-kernel pairwise CA distance (exact-zero
    # diagonal via direct difference) -> one-hot -> [n_bins, C] matmul.
    # The bin axis is pre-padded to a lane multiple (wdist rows zeroed, pad
    # edges empty) so the one-hot is built by ONE broadcasted compare into an
    # aligned [TI, TJ, n_bins] tile — a per-bin stack relayouts every slice.
    dx = xr_ref[0].astype(F32) - xc_ref[0].astype(F32)  # [TI, TJ]
    dy = yr_ref[0].astype(F32) - yc_ref[0].astype(F32)
    dz = zr_ref[0].astype(F32) - zc_ref[0].astype(F32)
    d = jnp.sqrt(dx * dx + dy * dy + dz * dz)  # [TI, TJ] f32
    lower = lower_ref[:].reshape(1, 1, n_bins)
    upper = upper_ref[:].reshape(1, 1, n_bins)
    d3 = d[:, :, None]  # f32 minor-dim insert (Mosaic: 32-bit only)
    onehot = ((d3 > lower) & (d3 < upper)).astype(dtype)
    x = x + jnp.dot(
        onehot.reshape(ti * tj, n_bins), wdist_ref[:],
        preferred_element_type=F32,
    ).astype(dtype)

    # 3-layer MLP (first layer completed by the node terms), as in pair_mlp.
    x = x.reshape(ti, tj, c) + i0_ref[0][:, None, :] + j0_ref[0][None, :, :]
    x = jax.nn.relu(x + b0_ref[:].reshape(1, 1, c))
    x = jnp.dot(
        x.reshape(ti * tj, c), w1_ref[:], preferred_element_type=F32
    ).astype(dtype)
    x = jax.nn.relu(x + b1_ref[:].reshape(1, c))
    x = jnp.dot(x, w2_ref[:], preferred_element_type=F32).astype(dtype)
    x = x.reshape(ti, tj, c) + b2_ref[:].reshape(1, 1, c)

    # Fused LayerNorm (f32 statistics, eps=1e-6) + edge-mask epilogue.
    x = x.astype(F32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    centered = x - mean
    var = jnp.mean(centered * centered, axis=-1, keepdims=True)
    normed = centered * jax.lax.rsqrt(var + 1e-6)
    normed = normed * lns_ref[:].reshape(1, 1, c).astype(F32)
    normed = normed + lnb_ref[:].reshape(1, 1, c).astype(F32)
    mask = rmask_ref[0].astype(F32) * cmask_ref[0].astype(F32)  # [TI, TJ]
    out_ref[0] = (normed * mask[:, :, None]).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "bins_lower", "bins_upper", "tile_i", "tile_j", "interpret"
    ),
)
def fused_edge_embedder(
    g: jnp.ndarray,  # [B, Nr, 4K] rel CP row factor
    h: jnp.ndarray,  # [B, Nc, 4K] rel CP col factor
    pos_rows: jnp.ndarray,  # [B, Nr, 3] f32 self-conditioning CA (row side)
    pos_cols: jnp.ndarray,  # [B, Nc, 3] f32 self-conditioning CA (col side)
    i_term: jnp.ndarray,  # [B, Nr, C] first-layer row node term
    j_term: jnp.ndarray,  # [B, Nc, C] first-layer col node term
    row_mask: jnp.ndarray,  # [B, Nr]
    col_mask: jnp.ndarray,  # [B, Nc]
    w_rel: jnp.ndarray,  # [4K, C] (pre-expanded, see expand_w_rel)
    w_dist: jnp.ndarray,  # [n_bins, C]
    b0: jnp.ndarray,  # [C]
    w1: jnp.ndarray,  # [C, C]
    b1: jnp.ndarray,  # [C]
    w2: jnp.ndarray,  # [C, C]
    b2: jnp.ndarray,  # [C]
    ln_scale: jnp.ndarray,  # [C]
    ln_bias: jnp.ndarray,  # [C]
    *,
    bins_lower: tuple[float, ...],
    bins_upper: tuple[float, ...],
    tile_i: int = 16,
    tile_j: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Masked-LayerNorm embedder edge output, [B, Nr, Nc, C].

    Rows and columns are independent inputs (Nr may differ from Nc) so a
    sequence-parallel caller can run the kernel on its local row shard
    against the full column set (rows local, columns full — the same
    shard_map pattern as the pair-MLP kernel in model/ipa.py)."""
    B, N_r, cp = g.shape
    N_c = h.shape[1]
    c = w_rel.shape[1]
    n_bins = w_dist.shape[0]
    dtype = g.dtype

    # Mosaic needs the CP-factor lane dim at a 128 multiple for the
    # [TI, 1, cp] x [1, TJ, cp] broadcast product; zero rank-padding is exact.
    pad_cp = (-cp) % 128
    if pad_cp:
        g = jnp.pad(g, ((0, 0), (0, 0), (0, pad_cp)))
        h = jnp.pad(h, ((0, 0), (0, 0), (0, pad_cp)))
        w_rel = jnp.pad(w_rel, ((0, pad_cp), (0, 0)))
        cp += pad_cp

    # Pad the distogram bin axis to a lane multiple with always-false edges
    # (lower=+inf, upper=-inf) and zeroed w_dist rows, so the in-kernel
    # one-hot is a single lane-aligned broadcast compare.
    pad_bins = (-n_bins) % 128
    if pad_bins:
        bins_lower = tuple(bins_lower) + (1e30,) * pad_bins
        bins_upper = tuple(bins_upper) + (-1e30,) * pad_bins
        w_dist = jnp.pad(w_dist, ((0, pad_bins), (0, 0)))
        n_bins += pad_bins

    # f32 inputs double the VMEM stack footprint (same rule as pair_mlp):
    # shrink to <=2048 elements without touching already-small tiles.
    if jnp.dtype(dtype).itemsize >= 4:
        while tile_i * tile_j > 2048 and tile_j > 128:
            tile_j //= 2
        while tile_i * tile_j > 2048 and tile_i > 8:
            tile_i //= 2
    tile_j = min(tile_j, max(128, -(-N_c // 128) * 128))
    tile_i = min(tile_i, max(8, -(-N_r // 8) * 8))
    pad_i = (-N_r) % tile_i
    pad_j = (-N_c) % tile_j
    if pad_i:
        g = jnp.pad(g, ((0, 0), (0, pad_i), (0, 0)))
        i_term = jnp.pad(i_term, ((0, 0), (0, pad_i), (0, 0)))
    if pad_j:
        h = jnp.pad(h, ((0, 0), (0, pad_j), (0, 0)))
        j_term = jnp.pad(j_term, ((0, 0), (0, pad_j), (0, 0)))
    # Padded coordinates go far away (1e6) rather than 0 so padded pairs do
    # not alias real short-range bins. NOTE: the last distogram bin's upper
    # edge is 1e8, so padded pairs still land in that final bin — that is
    # fine ONLY because every output element depends on its own (i, j) pair
    # alone and the padded rows/cols are sliced off below; nothing may rely
    # on padded pairs being bin-free.
    pos_r = jnp.pad(
        pos_rows.astype(F32), ((0, 0), (0, pad_i), (0, 0)),
        constant_values=1e6,
    )
    pos_c = jnp.pad(
        pos_cols.astype(F32), ((0, 0), (0, pad_j), (0, 0)),
        constant_values=1e6,
    )
    rmask = jnp.pad(row_mask, ((0, 0), (0, pad_i))) if pad_i else row_mask
    cmask = jnp.pad(col_mask, ((0, 0), (0, pad_j))) if pad_j else col_mask
    n_rows, n_cols = g.shape[1], h.shape[1]

    grid = (B, n_rows // tile_i, n_cols // tile_j)

    def row_spec(c_):
        return pl.BlockSpec(
            (1, tile_i, c_), lambda b, i, j: (b, i, 0),
            memory_space=pltpu.VMEM,
        )

    def col_spec(c_):
        return pl.BlockSpec(
            (1, tile_j, c_), lambda b, i, j: (b, j, 0),
            memory_space=pltpu.VMEM,
        )

    def colT_spec():
        return pl.BlockSpec(
            (1, 1, tile_j), lambda b, i, j: (b, 0, j),
            memory_space=pltpu.VMEM,
        )

    def rowmask_spec():
        return pl.BlockSpec(
            (1, tile_i, 1), lambda b, i, j: (b, i, 0),
            memory_space=pltpu.VMEM,
        )

    def full_spec(*shape):
        return pl.BlockSpec(
            shape, lambda b, i, j: tuple(0 for _ in shape),
            memory_space=pltpu.VMEM,
        )

    in_specs = [
        row_spec(cp), col_spec(cp),
        rowmask_spec(), rowmask_spec(), rowmask_spec(),  # xr, yr, zr
        colT_spec(), colT_spec(), colT_spec(),  # xc, yc, zc
        row_spec(c), col_spec(c),  # i_term, j_term
        rowmask_spec(), colT_spec(),  # masks
        full_spec(cp, c), full_spec(n_bins, c),
        full_spec(1, n_bins), full_spec(1, n_bins),
        full_spec(1, c), full_spec(c, c), full_spec(1, c),
        full_spec(c, c), full_spec(1, c),
        full_spec(1, c), full_spec(1, c),
    ]
    args = [
        g, h.astype(dtype),
        pos_r[..., 0:1], pos_r[..., 1:2], pos_r[..., 2:3],
        jnp.swapaxes(pos_c[..., 0:1], 1, 2),
        jnp.swapaxes(pos_c[..., 1:2], 1, 2),
        jnp.swapaxes(pos_c[..., 2:3], 1, 2),
        i_term.astype(dtype), j_term.astype(dtype),
        rmask.astype(dtype)[:, :, None],
        cmask.astype(dtype)[:, None, :],
        w_rel.astype(dtype), w_dist.astype(dtype),
        jnp.asarray(bins_lower, F32).reshape(1, -1),
        jnp.asarray(bins_upper, F32).reshape(1, -1),
        b0.reshape(1, -1).astype(dtype),
        w1.astype(dtype), b1.reshape(1, -1).astype(dtype),
        w2.astype(dtype), b2.reshape(1, -1).astype(dtype),
        ln_scale.reshape(1, -1).astype(F32),
        ln_bias.reshape(1, -1).astype(F32),
    ]

    flops_per_elem = 2 * (cp * c + n_bins * c + c * c + c * c)
    out = pl.pallas_call(
        _edge_embedder_kernel,
        out_shape=jax.ShapeDtypeStruct((B, n_rows, n_cols, c), dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, tile_i, tile_j, c),
            lambda b, i, j: (b, i, j, 0),
            memory_space=pltpu.VMEM,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=B * n_rows * n_cols * flops_per_elem,
            bytes_accessed=B * n_rows * n_cols * c * np.dtype(dtype).itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
    if pad_i or pad_j:
        out = out[:, :N_r, :N_c, :]
    return out


def _xla_edge_embedder(
    g, h, pos_rows, pos_cols, i_term, j_term, row_mask, col_mask,
    w_rel, w_dist, b0, w1, b1, w2, b2, ln_scale, ln_bias,
    bins_lower, bins_upper,
):
    """XLA twin of the fused kernel (same CP/one-hot math), used as the
    rematerialized backward of :func:`fused_edge_embedder_trainable` and as
    the consistency oracle in tests."""
    dtype = g.dtype
    m = g[:, :, None, :] * h[:, None, :, :]
    x = jnp.einsum("bijk,kc->bijc", m, w_rel.astype(dtype),
                   preferred_element_type=dtype)
    diff = (
        pos_rows.astype(F32)[:, :, None, :]
        - pos_cols.astype(F32)[:, None, :, :]
    )
    d = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
    lower = jnp.asarray(bins_lower, F32)
    upper = jnp.asarray(bins_upper, F32)
    onehot = (
        (d[..., None] > lower) & (d[..., None] < upper)
    ).astype(dtype)
    x = x + jnp.einsum("bijn,nc->bijc", onehot, w_dist.astype(dtype),
                       preferred_element_type=dtype)
    x = x + i_term[:, :, None, :] + j_term[:, None, :, :]
    x = jax.nn.relu(x + b0)
    x = jax.nn.relu(
        jnp.einsum("bijc,ck->bijk", x, w1, preferred_element_type=dtype) + b1
    )
    x = jnp.einsum("bijc,ck->bijk", x, w2, preferred_element_type=dtype) + b2
    x32 = x.astype(F32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    centered = x32 - mean
    var = jnp.mean(centered * centered, axis=-1, keepdims=True)
    normed = centered * jax.lax.rsqrt(var + 1e-6) * ln_scale + ln_bias
    emask = row_mask[:, :, None] * col_mask[:, None, :]
    return (normed * emask[..., None].astype(F32)).astype(dtype)


def _edge_embedder_bwd_kernel(
    g_ref, h_ref,  # [1, TI, 4K] / [1, TJ, 4K]
    xr_ref, yr_ref, zr_ref,  # [1, TI, 1] f32 row coordinates
    xc_ref, yc_ref, zc_ref,  # [1, 1, TJ] f32 col coordinates
    i0_ref, j0_ref,  # [1, TI, C] / [1, TJ, C] first-layer node terms
    rmask_ref, cmask_ref,  # [1, TI, 1] / [1, 1, TJ]
    wrel_ref, wdist_ref,  # [4K, C] / [n_bins, C]
    lower_ref, upper_ref,  # [1, n_bins] f32
    b0_ref, w1_ref, b1_ref, w2_ref, b2_ref,  # MLP params
    lns_ref, lnb_ref,  # LayerNorm params (f32)
    grad_ref,  # [1, TI, TJ, C] cotangent
    # ---- outputs (grid-reduced f32 accumulators; no N^2 output at all) --
    dg_ref, dh_ref,  # [1, TI, 4K] row acc / [1, Nc, 4K] batch col acc
    di0_ref, dj0_ref,  # [1, TI, C] / [1, Nc, C]
    drm_ref, dcm_ref,  # [1, TI, 1] / [1, 1, Nc]
    dwrel_ref, dwdist_ref,  # [4K, C] / [n_bins, C]
    dw1_ref, db1_ref, dw2_ref, db2_ref,  # [C, C] / [1, C] x2
    dlns_ref, dlnb_ref,  # [1, C]
):
    """Fused backward of the edge embedder: recompute the forward
    tile-resident (identical math to ``_edge_embedder_kernel``), then
    back-propagate through LayerNorm, the MLP, the distogram matmul and
    the CP product inside the same tile. Because the N^2 pairwise input is
    *synthesized* in-kernel, there is no d_pair output — the cotangent
    read is the only N^2 HBM traffic of the whole backward. Same Mosaic
    lowering rules as the pair-MLP backward: reductions that would emit a
    rank-1 vector run as MXU dots against ones columns; relu/one-hot
    compares in f32 (v5e rejects bf16 vector cmpf). Coordinate grads are
    NOT produced: the distogram one-hot is a step function (zero a.e.) and
    the wrapper returns exact zeros for them."""
    b_id, i_id, j_id = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    _, ti, cp = g_ref.shape
    tj = h_ref.shape[1]
    c = wrel_ref.shape[1]
    n_bins = wdist_ref.shape[0]
    dtype = g_ref.dtype
    mm = ti * tj
    col_off = j_id * tj

    first_tile = jnp.logical_and(i_id == 0, j_id == 0)

    @pl.when(jnp.logical_and(b_id == 0, first_tile))
    def _init_weight_accs():
        dwrel_ref[...] = jnp.zeros_like(dwrel_ref)
        dwdist_ref[...] = jnp.zeros_like(dwdist_ref)
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)
        dlns_ref[...] = jnp.zeros_like(dlns_ref)
        dlnb_ref[...] = jnp.zeros_like(dlnb_ref)

    @pl.when(first_tile)
    def _init_batch_accs():
        dh_ref[...] = jnp.zeros_like(dh_ref)
        dj0_ref[...] = jnp.zeros_like(dj0_ref)
        dcm_ref[...] = jnp.zeros_like(dcm_ref)

    @pl.when(j_id == 0)
    def _init_row_accs():
        dg_ref[...] = jnp.zeros_like(dg_ref)
        di0_ref[...] = jnp.zeros_like(di0_ref)
        drm_ref[...] = jnp.zeros_like(drm_ref)

    # ---- forward recompute (identical math to _edge_embedder_kernel) ---
    m3 = g_ref[0][:, None, :] * h_ref[0][None, :, :]  # [TI, TJ, 4K]
    mflat = m3.reshape(mm, cp)
    x = jnp.dot(mflat, wrel_ref[:], preferred_element_type=F32).astype(dtype)
    dxp = xr_ref[0].astype(F32) - xc_ref[0].astype(F32)  # [TI, TJ]
    dyp = yr_ref[0].astype(F32) - yc_ref[0].astype(F32)
    dzp = zr_ref[0].astype(F32) - zc_ref[0].astype(F32)
    d = jnp.sqrt(dxp * dxp + dyp * dyp + dzp * dzp)
    lower = lower_ref[:].reshape(1, 1, n_bins)
    upper = upper_ref[:].reshape(1, 1, n_bins)
    d3 = d[:, :, None]
    onehot = ((d3 > lower) & (d3 < upper)).astype(dtype)
    oflat = onehot.reshape(mm, n_bins)
    x = x + jnp.dot(
        oflat, wdist_ref[:], preferred_element_type=F32
    ).astype(dtype)
    # Same addition order as the forward kernel — b0 added AFTER i0 + j0,
    # so the recomputed relu mask is bit-identical to the actual forward's
    # even in bf16 (ADVICE r4: folding b0 into i0 reassociates the sum and
    # can flip a relu mask within 1 ulp of zero).
    x = x.reshape(ti, tj, c) + i0_ref[0][:, None, :] + j0_ref[0][None, :, :]
    y0 = jax.nn.relu(x + b0_ref[:].reshape(1, 1, c)).reshape(mm, c)
    y1 = jnp.dot(y0, w1_ref[:], preferred_element_type=F32).astype(dtype)
    y1 = jax.nn.relu(y1 + b1_ref[:].reshape(1, c))
    x2 = jnp.dot(y1, w2_ref[:], preferred_element_type=F32).astype(dtype)
    x2 = x2 + b2_ref[:].reshape(1, c)
    x2f = x2.reshape(ti, tj, c).astype(F32)
    mean = jnp.mean(x2f, axis=-1, keepdims=True)
    centered = x2f - mean
    var = jnp.mean(centered * centered, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + 1e-6)
    xhat = centered * inv
    s = lns_ref[:].reshape(1, 1, c).astype(F32)
    yln = xhat * s + lnb_ref[:].reshape(1, 1, c).astype(F32)
    rmask = rmask_ref[0].astype(F32)  # [TI, 1]
    cmask = cmask_ref[0].astype(F32)  # [1, TJ]
    emask = rmask * cmask

    # ---- backward -------------------------------------------------------
    gf = grad_ref[0].astype(F32)  # [TI, TJ, C]
    gm = gf * emask[:, :, None]

    ones_m = jnp.ones((mm, 1), F32)
    ones_ti = jnp.ones((ti, 1), F32)
    ones_tj = jnp.ones((tj, 1), F32)

    def _t_dot(a, b):  # [m, p] x [m, q] -> [p, q], f32 accumulation
        return jax.lax.dot_general(
            a, b, (((0,), (0,)), ((), ())), preferred_element_type=F32
        )

    def _nt_dot(a, w):  # [m, p] x [q, p] -> [m, q] (i.e. a @ w.T)
        return jax.lax.dot_general(
            a, w, (((1,), (1,)), ((), ())), preferred_element_type=F32
        )

    def _colsum(v):  # [m, c] -> [1, c]: sublane sum via the MXU
        return _t_dot(ones_m, v)

    # mask grads (through out = yln * emask)
    dem = jnp.sum(yln * gf, axis=-1)  # [TI, TJ]
    drm_ref[0] += jax.lax.dot_general(
        dem * cmask, ones_tj, (((1,), (0,)), ((), ())),
        preferred_element_type=F32,
    )
    dcm_ref[0, :, pl.ds(col_off, tj)] += _t_dot(ones_ti, dem * rmask)

    # LayerNorm backward
    dlns_ref[...] += _colsum((gm * xhat).reshape(mm, c))
    dlnb_ref[...] += _colsum(gm.reshape(mm, c))
    dxhat = gm * s
    mu1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    mu2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx2 = (dxhat - mu1 - xhat * mu2) * inv  # [TI, TJ, C] f32
    dx2d = dx2.astype(dtype).reshape(mm, c)

    # third layer
    dw2_ref[...] += _t_dot(y1, dx2d)
    db2_ref[...] += _colsum(dx2.reshape(mm, c))

    # second layer (relu compare in f32 — v5e rejects bf16 vector cmpf)
    dy1 = _nt_dot(dx2d, w2_ref[:]).astype(dtype)
    dy1 = dy1 * (y1.astype(F32) > 0).astype(dtype)
    dw1_ref[...] += _t_dot(y0, dy1)
    db1_ref[...] += _colsum(dy1.astype(F32))

    # first layer
    dy0 = _nt_dot(dy1, w1_ref[:]).astype(dtype)
    dy0 = dy0 * (y0.astype(F32) > 0).astype(dtype)  # [mm, C]
    dy03 = dy0.reshape(ti, tj, c).astype(F32)
    di0_ref[0] += jnp.sum(dy03, axis=1)  # [TI, C]
    dj0_ref[0, pl.ds(col_off, tj), :] += jnp.sum(dy03, axis=0)

    # pairwise-feature producers
    dwrel_ref[...] += _t_dot(mflat, dy0)
    dwdist_ref[...] += _t_dot(oflat, dy0)
    dm3 = _nt_dot(dy0, wrel_ref[:]).reshape(ti, tj, cp)  # f32
    dg_ref[0] += jnp.sum(dm3 * h_ref[0][None, :, :].astype(F32), axis=1)
    dh_ref[0, pl.ds(col_off, tj), :] += jnp.sum(
        dm3 * g_ref[0][:, None, :].astype(F32), axis=0
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "bins_lower", "bins_upper", "tile_i", "tile_j", "interpret"
    ),
)
def fused_edge_embedder_bwd(
    grad,
    g, h, pos_rows, pos_cols, i_term, j_term, row_mask, col_mask,
    w_rel, w_dist, b0, w1, b1, w2, b2, ln_scale, ln_bias,
    *,
    bins_lower: tuple[float, ...],
    bins_upper: tuple[float, ...],
    tile_i: int = 16,
    tile_j: int = 128,
    interpret: bool = False,
):
    """Fused Pallas backward of the edge embedder. One kernel recomputes
    the forward per tile and produces every input gradient; since the
    pairwise features are synthesized in-kernel there is NO d_pair output
    — the [B, Nr, Nc, C] cotangent read is the backward's only N^2 HBM
    traffic (the XLA remat twin materializes the CP product, one-hot and
    MLP intermediates again). Returns grads in the same order as
    ``jax.vjp(_xla_edge_embedder, ...)`` over the 17 array args, with
    EXACT ZEROS for pos_rows/pos_cols (the one-hot distogram is a step
    function — zero gradient a.e.; the XLA twin propagates 0 * d(sqrt)
    which is NaN on the d=0 diagonal, so zeros are strictly better)."""
    B, N_r, cp = g.shape
    N_c = h.shape[1]
    c = w_rel.shape[1]
    n_bins = w_dist.shape[0]
    dtype = g.dtype

    # Same lane paddings as the forward wrapper (exact zero rank-padding
    # for the CP factors; empty bins with zeroed w_dist rows).
    pad_cp = (-cp) % 128
    if pad_cp:
        g = jnp.pad(g, ((0, 0), (0, 0), (0, pad_cp)))
        h = jnp.pad(h, ((0, 0), (0, 0), (0, pad_cp)))
        w_rel = jnp.pad(w_rel, ((0, pad_cp), (0, 0)))
        cp += pad_cp
    pad_bins = (-n_bins) % 128
    if pad_bins:
        bins_lower = tuple(bins_lower) + (1e30,) * pad_bins
        bins_upper = tuple(bins_upper) + (-1e30,) * pad_bins
        w_dist = jnp.pad(w_dist, ((0, pad_bins), (0, 0)))
        n_bins += pad_bins

    # b0 rides as its own kernel ref (added after i0 + j0 in the recompute,
    # the forward's exact addition order); its gradient is recovered from
    # d_i0 below since d/d_i0 == d/d_b0 elementwise before the row sum.
    i0 = i_term.astype(dtype)
    j0 = j_term.astype(dtype)

    # The backward holds ~2x the forward's live tiles.
    if jnp.dtype(dtype).itemsize >= 4:
        while tile_i * tile_j > 1024 and tile_j > 128:
            tile_j //= 2
        while tile_i * tile_j > 1024 and tile_i > 8:
            tile_i //= 2
    tile_j = min(tile_j, max(128, -(-N_c // 128) * 128))
    tile_i = min(tile_i, max(8, -(-N_r // 8) * 8))
    pad_i = (-N_r) % tile_i
    pad_j = (-N_c) % tile_j
    if pad_i:
        g = jnp.pad(g, ((0, 0), (0, pad_i), (0, 0)))
        i0 = jnp.pad(i0, ((0, 0), (0, pad_i), (0, 0)))
    if pad_j:
        h = jnp.pad(h, ((0, 0), (0, pad_j), (0, 0)))
        j0 = jnp.pad(j0, ((0, 0), (0, pad_j), (0, 0)))
    if pad_i or pad_j:
        # Zero-padded cotangent + zero-padded masks => every gradient
        # contribution from padded elements is exactly zero.
        grad = jnp.pad(grad, ((0, 0), (0, pad_i), (0, pad_j), (0, 0)))
    pos_r = jnp.pad(
        pos_rows.astype(F32), ((0, 0), (0, pad_i), (0, 0)),
        constant_values=1e6,
    )
    pos_c = jnp.pad(
        pos_cols.astype(F32), ((0, 0), (0, pad_j), (0, 0)),
        constant_values=1e6,
    )
    rmask = jnp.pad(row_mask, ((0, 0), (0, pad_i))) if pad_i else row_mask
    cmask = jnp.pad(col_mask, ((0, 0), (0, pad_j))) if pad_j else col_mask
    n_rows, n_cols = g.shape[1], h.shape[1]
    grid = (B, n_rows // tile_i, n_cols // tile_j)

    def row_spec(c_):
        return pl.BlockSpec(
            (1, tile_i, c_), lambda b, i, j: (b, i, 0),
            memory_space=pltpu.VMEM,
        )

    def col_spec(c_):
        return pl.BlockSpec(
            (1, tile_j, c_), lambda b, i, j: (b, j, 0),
            memory_space=pltpu.VMEM,
        )

    def colT_spec():
        return pl.BlockSpec(
            (1, 1, tile_j), lambda b, i, j: (b, 0, j),
            memory_space=pltpu.VMEM,
        )

    def rowmask_spec():
        return pl.BlockSpec(
            (1, tile_i, 1), lambda b, i, j: (b, i, 0),
            memory_space=pltpu.VMEM,
        )

    def full_spec(*shape):
        return pl.BlockSpec(
            shape, lambda b, i, j: tuple(0 for _ in shape),
            memory_space=pltpu.VMEM,
        )

    def batch_full(*shape):
        return pl.BlockSpec(
            (1,) + shape, lambda b, i, j: (b,) + tuple(0 for _ in shape),
            memory_space=pltpu.VMEM,
        )

    in_specs = [
        row_spec(cp), col_spec(cp),
        rowmask_spec(), rowmask_spec(), rowmask_spec(),  # xr, yr, zr
        colT_spec(), colT_spec(), colT_spec(),  # xc, yc, zc
        row_spec(c), col_spec(c),  # i0, j0
        rowmask_spec(), colT_spec(),  # masks
        full_spec(cp, c), full_spec(n_bins, c),
        full_spec(1, n_bins), full_spec(1, n_bins),
        full_spec(1, c),  # b0
        full_spec(c, c), full_spec(1, c),
        full_spec(c, c), full_spec(1, c),
        full_spec(1, c), full_spec(1, c),
        pl.BlockSpec(
            (1, tile_i, tile_j, c), lambda b, i, j: (b, i, j, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    args = [
        g, h.astype(dtype),
        pos_r[..., 0:1], pos_r[..., 1:2], pos_r[..., 2:3],
        jnp.swapaxes(pos_c[..., 0:1], 1, 2),
        jnp.swapaxes(pos_c[..., 1:2], 1, 2),
        jnp.swapaxes(pos_c[..., 2:3], 1, 2),
        i0, j0,
        rmask.astype(dtype)[:, :, None],
        cmask.astype(dtype)[:, None, :],
        w_rel.astype(dtype), w_dist.astype(dtype),
        jnp.asarray(bins_lower, F32).reshape(1, -1),
        jnp.asarray(bins_upper, F32).reshape(1, -1),
        b0.reshape(1, -1).astype(dtype),
        w1.astype(dtype), b1.reshape(1, -1).astype(dtype),
        w2.astype(dtype), b2.reshape(1, -1).astype(dtype),
        ln_scale.reshape(1, -1).astype(F32),
        ln_bias.reshape(1, -1).astype(F32),
        grad.astype(dtype),
    ]

    out_shapes = [
        jax.ShapeDtypeStruct((B, n_rows, cp), F32),  # d_g
        jax.ShapeDtypeStruct((B, n_cols, cp), F32),  # d_h
        jax.ShapeDtypeStruct((B, n_rows, c), F32),  # d_i0
        jax.ShapeDtypeStruct((B, n_cols, c), F32),  # d_j0
        jax.ShapeDtypeStruct((B, n_rows, 1), F32),  # d_rmask
        jax.ShapeDtypeStruct((B, 1, n_cols), F32),  # d_cmask
        jax.ShapeDtypeStruct((cp, c), F32),  # d_w_rel
        jax.ShapeDtypeStruct((n_bins, c), F32),  # d_w_dist
        jax.ShapeDtypeStruct((c, c), F32),  # d_w1
        jax.ShapeDtypeStruct((1, c), F32),  # d_b1
        jax.ShapeDtypeStruct((c, c), F32),  # d_w2
        jax.ShapeDtypeStruct((1, c), F32),  # d_b2
        jax.ShapeDtypeStruct((1, c), F32),  # d_ln_scale
        jax.ShapeDtypeStruct((1, c), F32),  # d_ln_bias
    ]
    out_specs = [
        row_spec(cp),
        batch_full(n_cols, cp),
        row_spec(c),
        batch_full(n_cols, c),
        rowmask_spec(),
        batch_full(1, n_cols),
        full_spec(cp, c),
        full_spec(n_bins, c),
        full_spec(c, c),
        full_spec(1, c),
        full_spec(c, c),
        full_spec(1, c),
        full_spec(1, c),
        full_spec(1, c),
    ]

    flops_per_elem = 3 * 2 * (cp * c + n_bins * c + 2 * c * c)
    outs = pl.pallas_call(
        _edge_embedder_bwd_kernel,
        out_shape=tuple(out_shapes),
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        compiler_params=pltpu.CompilerParams(
            # Sequential grid: grid-reduced outputs accumulate in their
            # VMEM-resident blocks across revisiting iterations.
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            # Same scoped-vmem headroom as the pair-MLP backward.
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=B * n_rows * n_cols * flops_per_elem,
            bytes_accessed=B * n_rows * n_cols * c
            * np.dtype(dtype).itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)

    (
        d_g, d_h, d_i0, d_j0, d_rm, d_cm,
        d_wrel, d_wdist, d_w1, d_b1, d_w2, d_b2, d_lns, d_lnb,
    ) = outs

    if pad_i or pad_j:
        d_g = d_g[:, :N_r]
        d_h = d_h[:, :N_c]
        d_i0 = d_i0[:, :N_r]
        d_j0 = d_j0[:, :N_c]
        d_rm = d_rm[:, :N_r]
        d_cm = d_cm[:, :, :N_c]
    if pad_cp:
        d_g = d_g[..., : cp - pad_cp]
        d_h = d_h[..., : cp - pad_cp]
        d_wrel = d_wrel[: cp - pad_cp]
    if pad_bins:
        d_wdist = d_wdist[: n_bins - pad_bins]

    # The relu input is base + i0 + j0 + b0, so d/d_b0 equals d/d_i0
    # elementwise; summing the per-row accumulator over (batch, rows)
    # yields the bias gradient without a separate kernel output.
    d_b0 = jnp.sum(d_i0, axis=(0, 1))
    cast = lambda v, ref: v.astype(ref.dtype)  # noqa: E731
    return (
        cast(d_g, g),
        cast(d_h, h),
        jnp.zeros_like(pos_rows),
        jnp.zeros_like(pos_cols),
        cast(d_i0, i_term),
        cast(d_j0, j_term),
        cast(d_rm[..., 0], row_mask),
        cast(d_cm[:, 0, :], col_mask),
        cast(d_wrel, w_rel),
        cast(d_wdist, w_dist),
        cast(d_b0, b0),
        cast(d_w1, w1),
        cast(d_b1[0], b1),
        cast(d_w2, w2),
        cast(d_b2[0], b2),
        cast(d_lns[0], ln_scale),
        cast(d_lnb[0], ln_bias),
    )


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5)
)
def fused_edge_embedder_trainable(
    bins_lower, bins_upper, tile_i, tile_j, interpret, bwd_impl,
    g, h, pos_rows, pos_cols, i_term, j_term, row_mask, col_mask,
    w_rel, w_dist, b0, w1, b1, w2, b2, ln_scale, ln_bias,
):
    """Differentiable fused edge embedder: Pallas forward; the backward is
    selected by ``bwd_impl`` — "xla" runs the VJP of the numerically
    identical XLA twin rematerialized from the O(N) inputs, "pallas" runs
    the fused backward kernel (:func:`fused_edge_embedder_bwd`, cotangent
    read is the only N^2 HBM traffic)."""
    return fused_edge_embedder(
        g, h, pos_rows, pos_cols, i_term, j_term, row_mask, col_mask,
        w_rel, w_dist, b0, w1, b1, w2, b2, ln_scale, ln_bias,
        bins_lower=bins_lower, bins_upper=bins_upper,
        tile_i=tile_i, tile_j=tile_j, interpret=interpret,
    )


def _trainable_fwd(bins_lower, bins_upper, tile_i, tile_j, interpret,
                   bwd_impl, *args):
    out = fused_edge_embedder_trainable(
        bins_lower, bins_upper, tile_i, tile_j, interpret, bwd_impl, *args
    )
    return out, args


def _trainable_bwd(bins_lower, bins_upper, tile_i, tile_j, interpret,
                   bwd_impl, residuals, grad):
    if bwd_impl == "pallas":
        return fused_edge_embedder_bwd(
            grad, *residuals,
            bins_lower=bins_lower, bins_upper=bins_upper,
            tile_i=tile_i, tile_j=tile_j, interpret=interpret,
        )
    if bwd_impl != "xla":
        raise ValueError(
            f"bwd_impl must be 'xla' or 'pallas', got {bwd_impl!r}"
        )
    _, vjp = jax.vjp(
        lambda *a: _xla_edge_embedder(*a, bins_lower, bins_upper), *residuals
    )
    return vjp(grad)


fused_edge_embedder_trainable.defvjp(_trainable_fwd, _trainable_bwd)
