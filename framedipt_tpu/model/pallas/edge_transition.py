"""Fused EdgeTransition MLP as a Pallas TPU kernel.

The edge transition dominates the score network's cost and is HBM-bandwidth
bound under XLA: the [B, N, N, hidden] intermediates (hidden = 384 at
reference size) are written/read between each matmul — ~6 tensor passes per
transition. This kernel tiles the N x N edge grid into [TI, TJ] blocks and
keeps the whole chain

    y0 = relu(edge @ W0_e + i_term_i + j_term_j + b0)
    y1 = relu(y0 @ W1 + b1)
    out = (y1 + y0_residual-free) ...  (see module math below)
    out = y1 @ Wf_y + edge @ Wf_e + fi_i + fj_j + bf

in VMEM: HBM traffic becomes one read of the 128-wide edge input and one
write of the 128-wide output per element (plus O(N) row/column terms),
~6x less than the XLA schedule. All matmuls accumulate in float32 on the
MXU.

Matches framedipt_tpu.model.ipa.EdgeTransition's decomposed math exactly
(which itself is bit-compatible with the reference's concat formulation,
ipa_pytorch.py:61-102). Forward-only: inference path (config
model.ipa.use_pallas_kernel); training uses the XLA formulation.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32


def _edge_transition_kernel(
    edge_ref,  # [1, TI, TJ, C_e]
    i_term_ref,  # [1, TI, H]
    j_term_ref,  # [1, TJ, H]
    fi_ref,  # [1, TI, C_out]
    fj_ref,  # [1, TJ, C_out]
    w0e_ref,  # [C_e, H]
    b0_ref,  # [1, H]
    w1_ref,  # [H, H]
    b1_ref,  # [1, H]
    wfy_ref,  # [H, C_out]
    wfe_ref,  # [C_e, C_out]
    bf_ref,  # [1, C_out]
    ln_scale_ref,  # [1, C_out]
    ln_bias_ref,  # [1, C_out]
    out_ref,  # [1, TI, TJ, C_out]
):
    _, ti, tj, c_e = edge_ref.shape
    h = w0e_ref.shape[1]
    dtype = edge_ref.dtype
    edge = edge_ref[0].reshape(ti * tj, c_e)

    # y0 = relu(edge @ W0_e + i_term + j_term + b0); stored in the compute
    # dtype — VMEM is the scarce resource here (f32 intermediates OOM the
    # 16MB scoped budget at useful tile sizes).
    y0 = jnp.dot(edge, w0e_ref[:], preferred_element_type=F32)
    y0 = y0.reshape(ti, tj, h)
    y0 = y0 + i_term_ref[0][:, None, :] + j_term_ref[0][None, :, :]
    y0 = jax.nn.relu(y0 + b0_ref[:].reshape(1, 1, h)).astype(dtype)

    # y1 = relu(y0 @ W1 + b1)
    y1 = jnp.dot(
        y0.reshape(ti * tj, h), w1_ref[:], preferred_element_type=F32
    )
    y1 = jax.nn.relu(y1 + b1_ref[:].reshape(1, h)).astype(dtype)

    # out = y1 @ Wf_y + edge @ Wf_e + fi + fj + bf
    out = jnp.dot(y1, wfy_ref[:], preferred_element_type=F32)
    out = out + jnp.dot(edge, wfe_ref[:], preferred_element_type=F32)
    c_out = out.shape[-1]
    out = out.reshape(ti, tj, c_out)
    out = out + fi_ref[0][:, None, :] + fj_ref[0][None, :, :]
    out = out + bf_ref[:].reshape(1, 1, c_out)
    # Fused LayerNorm (float32 statistics) — absorbing it here removes the
    # extra HBM pass XLA would otherwise schedule outside the custom call.
    mean = jnp.mean(out, axis=-1, keepdims=True)
    centered = out - mean
    var = jnp.mean(centered * centered, axis=-1, keepdims=True)
    normed = centered * jax.lax.rsqrt(var + 1e-6)
    normed = normed * ln_scale_ref[:].reshape(1, 1, c_out).astype(F32)
    normed = normed + ln_bias_ref[:].reshape(1, 1, c_out).astype(F32)
    out_ref[0] = normed.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile_i", "tile_j"))
def fused_edge_transition(
    edge: jnp.ndarray,  # [B, N, N, C_e]
    i_term: jnp.ndarray,  # [B, N, H]   (node_bias @ W0_i)
    j_term: jnp.ndarray,  # [B, N, H]   (node_bias @ W0_j)
    fi: jnp.ndarray,  # [B, N, C_out] (node_bias @ Wf_i)
    fj: jnp.ndarray,  # [B, N, C_out] (node_bias @ Wf_j)
    w0e: jnp.ndarray,  # [C_e, H]
    b0: jnp.ndarray,  # [H]
    w1: jnp.ndarray,  # [H, H]
    b1: jnp.ndarray,  # [H]
    wfy: jnp.ndarray,  # [H, C_out]
    wfe: jnp.ndarray,  # [C_e, C_out]
    bf: jnp.ndarray,  # [C_out]
    ln_scale: jnp.ndarray,  # [C_out]
    ln_bias: jnp.ndarray,  # [C_out]
    tile_i: int = 32,
    tile_j: int = 128,
) -> jnp.ndarray:
    """Returns the LayerNorm'd edge-transition output [B, N, N, C_out]."""
    B, N, _, c_e = edge.shape
    h = w0e.shape[1]
    c_out = wfy.shape[1]
    dtype = edge.dtype

    if N % tile_i or N % tile_j:
        # Pad rows/cols up to their tile multiples; padded output is sliced
        # away below (and padded inputs are zeros, so no NaN propagation).
        pad_i = (-N) % tile_i
        pad_j = (-N) % tile_j
        edge = jnp.pad(edge, ((0, 0), (0, pad_i), (0, pad_j), (0, 0)))
        i_term = jnp.pad(i_term, ((0, 0), (0, pad_i), (0, 0)))
        j_term = jnp.pad(j_term, ((0, 0), (0, pad_j), (0, 0)))
        fi = jnp.pad(fi, ((0, 0), (0, pad_i), (0, 0)))
        fj = jnp.pad(fj, ((0, 0), (0, pad_j), (0, 0)))
    n_rows = edge.shape[1]
    n_cols = edge.shape[2]

    grid = (B, n_rows // tile_i, n_cols // tile_j)
    out = pl.pallas_call(
        _edge_transition_kernel,
        out_shape=jax.ShapeDtypeStruct((B, n_rows, n_cols, c_out), dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, tile_i, tile_j, c_e),
                lambda b, i, j: (b, i, j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, tile_i, h), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, tile_j, h), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, tile_i, c_out), lambda b, i, j: (b, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, tile_j, c_out), lambda b, i, j: (b, j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((c_e, h), lambda b, i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda b, i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, h), lambda b, i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda b, i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, c_out), lambda b, i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c_e, c_out), lambda b, i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_out), lambda b, i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_out), lambda b, i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_out), lambda b, i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_i, tile_j, c_out),
            lambda b, i, j: (b, i, j, 0),
            memory_space=pltpu.VMEM,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * n_rows * n_cols
            * (c_e * h + h * h + h * c_out + c_e * c_out),
            bytes_accessed=B * n_rows * n_cols * (c_e + c_out) * edge.dtype.itemsize,
            transcendentals=0,
        ),
    )(
        edge,
        i_term.astype(dtype),
        j_term.astype(dtype),
        fi.astype(dtype),
        fj.astype(dtype),
        w0e.astype(dtype),
        b0.reshape(1, -1).astype(dtype),
        w1.astype(dtype),
        b1.reshape(1, -1).astype(dtype),
        wfy.astype(dtype),
        wfe.astype(dtype),
        bf.reshape(1, -1).astype(dtype),
        ln_scale.reshape(1, -1).astype(dtype),
        ln_bias.reshape(1, -1).astype(dtype),
    )
    return out[:, :N, :N, :]
