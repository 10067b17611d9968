"""Input featurization: timestep/positional embeddings, self-conditioning
distogram, node/edge embedders.

Behavioral contract mirrors framedipt/model/score_network.py:17-197:
- sinusoidal positional embedding over residue indices (:17-38),
- DDPM-style timestep embedding (:41-64),
- fixed-mask channel, optional one-hot aatype with an epsilon timestep for
  fixed residues (:159-173),
- pairwise features: cross-concat of node features, relative-offset
  embedding, self-conditioning CA distogram (22 bins, :185-192).

TPU note: edge features are built directly at [B, N, N, C] and fed to one
fused MLP — the N^2 x C tensor stays in HBM once, no reshape churn.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from framedipt_tpu.model.layers import Linear, MLP, trunc_normal_initializer
from framedipt_tpu.parallel import sp
from framedipt_tpu.tools.config import ModelConfig

# First edge layer uses the zoo's "default" (LeCun trunc-normal) init.
_EDGE_W0_INIT = trunc_normal_initializer(1.0)


def get_index_embedding(
    indices: jnp.ndarray, embed_size: int, max_len: int = 2056
) -> jnp.ndarray:
    """Sine/cosine positional embedding of integer indices -> [..., E]."""
    k = jnp.arange(embed_size // 2, dtype=jnp.float32)
    angle = indices[..., None] * np.pi / (max_len ** (2.0 * k / embed_size))
    return jnp.concatenate([jnp.sin(angle), jnp.cos(angle)], axis=-1)


def get_timestep_embedding(
    timesteps: jnp.ndarray, embedding_dim: int, max_positions: int = 10000
) -> jnp.ndarray:
    """DDPM timestep embedding; timesteps in [0, 1], shape [B] -> [B, E]."""
    timesteps = timesteps * max_positions
    half_dim = embedding_dim // 2
    emb_factor = np.log(max_positions) / (half_dim - 1)
    freq = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -emb_factor)
    emb = timesteps.astype(jnp.float32)[:, None] * freq[None, :]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def calc_distogram(
    pos: jnp.ndarray, min_bin: float, max_bin: float, num_bins: int
) -> jnp.ndarray:
    """One-hot distance histogram of pairwise CA distances
    (ref framedipt/data/utils.py:541-551). pos: [B, N, 3] -> [B, N, N, bins]."""
    d = jnp.linalg.norm(
        pos[:, :, None, :] - pos[:, None, :, :], axis=-1, keepdims=True
    )
    lower = jnp.linspace(min_bin, max_bin, num_bins)
    upper = jnp.concatenate([lower[1:], jnp.asarray([1e8])])
    return ((d > lower) & (d < upper)).astype(pos.dtype)


class Embedder(nn.Module):
    """Node + edge input embedder.

    With ``use_pallas`` the N^2-wide edge MLP (first layer + 2 Linears +
    LayerNorm + edge-mask epilogue) runs as one fused VMEM-resident kernel
    (model/pallas/pair_mlp.py, residual=False variant); ``node_mask`` must
    then be provided and the caller must NOT re-mask the edge output.
    """

    conf: ModelConfig
    inpainting: bool = False
    dtype: jnp.dtype | None = None
    use_pallas: bool = False

    @nn.compact
    def __call__(
        self,
        *,
        seq_idx: jnp.ndarray,  # [B, N] int
        t: jnp.ndarray,  # [B] float
        fixed_mask: jnp.ndarray,  # [B, N]
        self_conditioning_ca: jnp.ndarray,  # [B, N, 3]
        aatype: jnp.ndarray | None,  # [B, N] int or None
        node_mask: jnp.ndarray | None = None,  # [B, N] (pallas path)
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        embed_conf = self.conf.embed
        num_batch, num_res = seq_idx.shape
        fixed_mask_c = fixed_mask[..., None]  # [B, N, 1]

        t_embed = jnp.tile(
            get_timestep_embedding(t, embed_conf.index_embed_size)[:, None, :],
            (1, num_res, 1),
        )

        if aatype is not None:
            aatype_oh = jax.nn.one_hot(aatype, 21, dtype=jnp.float32)
            # Fixed residues are "clean": embed them at t = 1e-5 (ref :159-173).
            eps_embed = jnp.tile(
                get_timestep_embedding(
                    jnp.full_like(t, 1e-5), embed_conf.index_embed_size
                )[:, None, :],
                (1, num_res, 1),
            )
            t_embed = jnp.where(fixed_mask_c > 0.5, eps_embed, t_embed)
            prot_t_embed = jnp.concatenate([aatype_oh, t_embed, fixed_mask_c], axis=-1)
        else:
            prot_t_embed = jnp.concatenate([t_embed, fixed_mask_c], axis=-1)

        node_feats = [prot_t_embed]
        node_feats.append(get_index_embedding(seq_idx, embed_conf.index_embed_size))
        rel_offset = seq_idx[:, :, None] - seq_idx[:, None, :]
        rel_embed = get_index_embedding(rel_offset, embed_conf.index_embed_size)

        pairwise_feats = [rel_embed]
        if embed_conf.embed_self_conditioning:
            pairwise_feats.append(
                calc_distogram(
                    self_conditioning_ca,
                    embed_conf.min_bin,
                    embed_conf.max_bin,
                    embed_conf.num_bins,
                )
            )

        node_embed = MLP(
            (self.conf.node_embed_size,) * 3,
            final_layer_norm=True,
            dtype=self.dtype,
            name="node_embedder",
        )(jnp.concatenate(node_feats, axis=-1))

        # Edge MLP with a concat-free first layer. The reference feeds
        # concat([node_i, node_j, rel_embed, (distogram)]) [B, N, N, .] to
        # its first Linear (score_network.py:114-127, 176-195). Kernel rows
        # are sliced so the cross-concat contributions become O(N) matmuls
        # broadcast over rows/columns; the genuinely pairwise features
        # (rel offsets, distogram) keep their N^2 matmul. Weight-import
        # compatible (row slices of the same kernel).
        c_t = prot_t_embed.shape[-1]
        pair_rest = jnp.concatenate(pairwise_feats, axis=-1)
        c_rest = pair_rest.shape[-1]
        hidden = self.conf.edge_embed_size
        w0 = self.param(
            "edge_embedder_w0",
            _EDGE_W0_INIT,
            (2 * c_t + c_rest, hidden),
        )
        b0 = self.param(
            "edge_embedder_b0", nn.initializers.zeros_init(), (hidden,)
        )
        # Inner edge layers as raw params so the whole chain can run inside
        # the fused Pallas kernel (Linear/LayerNorm modules cannot expose
        # their kernels for in-kernel use).
        w1 = self.param(
            "edge_linear_1_kernel", trunc_normal_initializer(1.0), (hidden, hidden)
        )
        b1 = self.param("edge_linear_1_bias", nn.initializers.zeros_init(), (hidden,))
        w2 = self.param(
            "edge_linear_2_kernel", trunc_normal_initializer(1.0), (hidden, hidden)
        )
        b2 = self.param("edge_linear_2_bias", nn.initializers.zeros_init(), (hidden,))
        ln_scale = self.param(
            "edge_ln_scale", nn.initializers.ones_init(), (hidden,)
        )
        ln_bias = self.param(
            "edge_ln_bias", nn.initializers.zeros_init(), (hidden,)
        )

        dtype = self.dtype or jnp.float32
        w0 = w0.astype(dtype)
        prot_c = prot_t_embed.astype(dtype)
        i_term = prot_c @ w0[:c_t]
        j_term = prot_c @ w0[c_t : 2 * c_t]

        use_kernel = self.use_pallas and embed_conf.embed_self_conditioning
        sp_ctx = sp.active()
        if use_kernel and sp_ctx is not None:
            mesh_, axis_ = sp_ctx
            if seq_idx.shape[1] % mesh_.shape[axis_]:
                # shard_map needs equal row shards; ragged lengths fall back
                # to the GSPMD XLA formulation below (same policy as the
                # edge-transition kernel in model/ipa.py).
                use_kernel = False
        if use_kernel:
            # Fully-fused kernel: rel-offset sinusoids synthesized in-kernel
            # from rank-64 CP factors (angle addition) and the distogram from
            # in-kernel pairwise distances, so the [N, N, 54] pairwise
            # features never touch HBM (model/pallas/edge_embedder.py). The
            # round-2 MLP-only fusion lost precisely because those producers
            # materialized at the custom-call boundary (PERF.md).
            from framedipt_tpu.model.pallas.edge_embedder import (
                expand_w_rel,
                fused_edge_embedder_trainable,
                rel_cp_factors,
            )

            mask = (
                node_mask
                if node_mask is not None
                else jnp.ones(seq_idx.shape, dtype)
            )
            g, h = rel_cp_factors(seq_idx, embed_conf.index_embed_size)
            n_rel = embed_conf.index_embed_size  # rel_embed width (sin+cos)
            w_rel = expand_w_rel(w0[2 * c_t : 2 * c_t + n_rel])
            w_dist = w0[2 * c_t + n_rel :]
            lower = np.linspace(
                embed_conf.min_bin, embed_conf.max_bin, embed_conf.num_bins
            )
            upper = np.concatenate([lower[1:], [1e8]])
            statics = (
                tuple(float(x) for x in lower),
                tuple(float(x) for x in upper),
                self.conf.ipa.pallas_emb_tile_i,
                self.conf.ipa.pallas_emb_tile_j,
                bool(getattr(self.conf.ipa, "pallas_interpret", False)),
                getattr(self.conf.ipa, "pallas_emb_bwd_impl", "xla"),
            )
            kernel_args = (
                g.astype(dtype),
                h.astype(dtype),
                self_conditioning_ca,  # row-side coordinates
                self_conditioning_ca,  # col-side coordinates
                i_term,
                j_term,
                mask.astype(dtype),  # row mask
                mask.astype(dtype),  # col mask
                w_rel,
                w_dist,
                b0.astype(dtype),
                w1.astype(dtype),
                b1.astype(dtype),
                w2.astype(dtype),
                b2.astype(dtype),
                ln_scale,
                ln_bias,
            )
            if sp_ctx is None:
                edge_embed = fused_edge_embedder_trainable(
                    *statics, *kernel_args
                )
                return node_embed, edge_embed
            # Sequence parallelism: every kernel input is O(N), so the row-
            # indexed ones (CP row factor, row coordinates/node term/mask)
            # ride the local shard while the column-indexed ones stay full,
            # and each device computes its own [B, N/sp, N, C] row block —
            # the same rows-local/columns-full shard_map pattern as the
            # pair-MLP kernel (model/ipa.py; VERDICT r3 #6).
            mesh, axis = sp_ctx
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            row3 = P(sp.DP_AXIS, axis, None)
            col3 = P(sp.DP_AXIS, None, None)
            rep = P()
            in_specs = (
                row3, col3,                 # g rows local, h cols full
                row3, col3,                 # row / col coordinates
                row3, col3,                 # i_term local, j_term full
                P(sp.DP_AXIS, axis),        # row mask: local shard
                P(sp.DP_AXIS, None),        # col mask: full
                rep, rep, rep, rep, rep, rep, rep, rep, rep,  # weights
            )
            edge_embed = shard_map(
                lambda *a: fused_edge_embedder_trainable(*statics, *a),
                mesh=mesh,
                in_specs=in_specs,
                out_specs=P(sp.DP_AXIS, axis, None, None),
                check_vma=False,
            )(*kernel_args)
            return node_embed, edge_embed

        # Under sequence parallelism the pairwise features are row-sharded
        # at the source, so the whole N^2 chain below is born distributed.
        pair_rest = sp.constrain_edge(pair_rest)
        rest_term = jnp.einsum(
            "bijf,fh->bijh",
            pair_rest.astype(dtype),
            w0[2 * c_t :],
            preferred_element_type=dtype,
        )
        x = (
            rest_term
            + i_term[:, :, None, :]
            + j_term[:, None, :, :]
            + b0.astype(dtype)
        )
        x = jax.nn.relu(x)
        x = jax.nn.relu(x @ w1.astype(dtype) + b1.astype(dtype))
        x = x @ w2.astype(dtype) + b2.astype(dtype)
        # Manual LayerNorm (f32 statistics; nn.LayerNorm semantics).
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        centered = x32 - mean
        var = jnp.mean(centered * centered, axis=-1, keepdims=True)
        edge_embed = sp.constrain_edge(
            (centered * jax.lax.rsqrt(var + 1e-6) * ln_scale + ln_bias).astype(
                dtype
            )
        )
        if self.use_pallas and node_mask is not None:
            # Caller contract: with use_pallas the edge-mask epilogue is the
            # embedder's job (normally fused in-kernel). Honor it on this XLA
            # fallback (reached when embed_self_conditioning is off).
            emask = node_mask[:, :, None] * node_mask[:, None, :]
            edge_embed = edge_embed * emask[..., None].astype(edge_embed.dtype)
        return node_embed, edge_embed
