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

from framedipt_tpu.model.layers import MLP
from framedipt_tpu.tools.config import ModelConfig


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
    """Node + edge input embedder."""

    conf: ModelConfig
    inpainting: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(
        self,
        *,
        seq_idx: jnp.ndarray,  # [B, N] int
        t: jnp.ndarray,  # [B] float
        fixed_mask: jnp.ndarray,  # [B, N]
        self_conditioning_ca: jnp.ndarray,  # [B, N, 3]
        aatype: jnp.ndarray | None,  # [B, N] int or None
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
        # Cross-concat: [B, N, N, 2*C] pair features from node features.
        pair_feats = [
            jnp.concatenate(
                [
                    jnp.tile(prot_t_embed[:, :, None, :], (1, 1, num_res, 1)),
                    jnp.tile(prot_t_embed[:, None, :, :], (1, num_res, 1, 1)),
                ],
                axis=-1,
            )
        ]

        node_feats.append(get_index_embedding(seq_idx, embed_conf.index_embed_size))
        rel_offset = seq_idx[:, :, None] - seq_idx[:, None, :]
        pair_feats.append(
            get_index_embedding(rel_offset, embed_conf.index_embed_size)
        )

        if embed_conf.embed_self_conditioning:
            pair_feats.append(
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
        edge_embed = MLP(
            (self.conf.edge_embed_size,) * 3,
            final_layer_norm=True,
            dtype=self.dtype,
            name="edge_embedder",
        )(jnp.concatenate(pair_feats, axis=-1))
        return node_embed, edge_embed
