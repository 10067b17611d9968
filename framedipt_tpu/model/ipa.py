"""Invariant Point Attention trunk (flax.linen), designed for the TPU MXU.

Behavioral contract mirrors the reference trunk
(framedipt/model/ipa_pytorch.py): InvariantPointAttention with pair bias and
down-projected pair output (:105-329), StructureModuleTransition (:36),
EdgeTransition (:61), 2-layer post-norm sequence transformer (:433-443),
BackboneUpdate (:386), TorsionAngles psi head (:332), and the per-block
masked frame update via compose_q_update_vec gated by diffuse_mask
(:542-547).

TPU-first redesign of the hot op: the reference materializes the point
displacement tensor [B, N, N, H, P, 3] (ipa_pytorch.py:258-273). Here the
squared point distance is expanded as |q|^2 + |k|^2 - 2 q.k so the cross
term is a batched [B*H, N, P*3] x [B*H, P*3, N] matmul on the MXU and the
N^2 x H x P x 3 tensor never exists. Attention-weighted point outputs are
likewise batched matmuls. All contractions accumulate in float32.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from framedipt_tpu.geometry.rigid import Rigid
from framedipt_tpu.model.layers import IPA_POINT_WEIGHTS_INIT, Linear
from framedipt_tpu.parallel import sp
from framedipt_tpu.tools.config import IPAConfig, ModelConfig

F32 = jnp.float32

# Kernel init for the decomposed EdgeTransition trunk_0 (matches Linear's
# "relu" trunc-normal fan-in init; fan_in = first shape dim).
from framedipt_tpu.model.layers import trunc_normal_initializer  # noqa: E402

_KERNEL_INIT_RELU = trunc_normal_initializer(2.0)


def _apply_frames(mats: jnp.ndarray, trans: jnp.ndarray, pts: jnp.ndarray):
    """Apply per-residue frames [B,N,3,3]/[B,N,3] to points [B,N,P,3]."""
    return (
        jnp.einsum("bnij,bnpj->bnpi", mats, pts, preferred_element_type=F32)
        + trans[:, :, None, :]
    )


def _invert_apply_frames(mats: jnp.ndarray, trans: jnp.ndarray, pts: jnp.ndarray):
    """Apply inverse frames to points [B,N,P,3] (R^T (x - t))."""
    return jnp.einsum(
        "bnji,bnpj->bnpi", mats, pts - trans[:, :, None, :],
        preferred_element_type=F32,
    )


def _points_from_linear(x: jnp.ndarray) -> jnp.ndarray:
    """[.., 3*P] -> [.., P, 3] with the reference's coordinate-major layout
    (split into x/y/z thirds then stacked; ipa_pytorch.py:218-219)."""
    return jnp.stack(jnp.split(x, 3, axis=-1), axis=-1)


class InvariantPointAttention(nn.Module):
    conf: IPAConfig
    inf: float = 1e5
    eps: float = 1e-8
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(
        self,
        s: jnp.ndarray,  # [B, N, C_s]
        z: jnp.ndarray,  # [B, N, N, C_z]
        rigids: Rigid,  # [B, N] (translations in scaled units)
        mask: jnp.ndarray,  # [B, N]
    ) -> jnp.ndarray:
        c = self.conf
        H, C, Pq, Pv = c.no_heads, c.c_hidden, c.no_qk_points, c.no_v_points
        B, N, _ = s.shape

        mats = rigids.rot_mats()
        trans = rigids.trans

        # Scalar q/k/v (compute dtype: bf16-capable, f32 accumulation).
        q = Linear(H * C, dtype=self.dtype, name="linear_q")(s).reshape(B, N, H, C)
        kv = Linear(2 * H * C, dtype=self.dtype, name="linear_kv")(s).reshape(
            B, N, H, 2 * C
        )
        k, v = jnp.split(kv, 2, axis=-1)

        # Point q/k/v: geometry stays float32 regardless of compute dtype.
        s32 = s.astype(F32)
        q_pts = _points_from_linear(Linear(H * Pq * 3, name="linear_q_points")(s32))
        q_pts = _apply_frames(mats, trans, q_pts).reshape(B, N, H, Pq, 3)
        kv_pts = _points_from_linear(
            Linear(H * (Pq + Pv) * 3, name="linear_kv_points")(s32)
        )
        kv_pts = _apply_frames(mats, trans, kv_pts).reshape(B, N, H, Pq + Pv, 3)
        k_pts, v_pts = jnp.split(kv_pts, [Pq], axis=-2)

        head_weights = jax.nn.softplus(
            self.param(
                "head_weights",
                lambda _, shape: jnp.full(shape, IPA_POINT_WEIGHTS_INIT),
                (H,),
            )
        )
        pt_scale = head_weights * np.sqrt(1.0 / (3 * (Pq * 9.0 / 2)))  # [H]

        # The fused kernel holds all keys in VMEM per row tile, so it is
        # gated to lengths whose k/v/point tensors fit (~16 MB/core).
        if self.use_pallas and N <= 640:
            from framedipt_tpu.model.pallas.ipa_attention import (
                build_point_inputs,
                fused_ipa_attention,
                PT_PAD,
            )

            # Raw projection weights, importer-compatible param tree. The
            # pair-bias bias shifts every logit in a row equally, so it
            # cancels in the softmax and is omitted; the down_z bias adds
            # b_dz to o_pair exactly (attention rows sum to 1).
            wb, _ = Linear(H, dtype=self.dtype, name="linear_b")(
                z, return_weights=True
            )
            wdz, bdz = Linear(c.c_z // 4, dtype=self.dtype, name="down_z")(
                z, return_weights=True
            )
            qhat, khat, vpad = build_point_inputs(
                q_pts, k_pts, v_pts, pt_scale
            )
            q_flat = (q * np.sqrt(1.0 / (3 * C))).reshape(B, N, H * C)
            o, opt_f, opair_f = fused_ipa_attention(
                q_flat.astype(self.dtype),
                k.reshape(B, N, H * C).astype(self.dtype),
                v.reshape(B, N, H * C).astype(self.dtype),
                qhat,
                khat,
                vpad,
                z.astype(self.dtype),
                mask,
                wb * np.sqrt(1.0 / 3),
                wdz,
                no_heads=H,
                c_hidden=C,
                inf=self.inf,
            )
            o_pt_global = (
                opt_f.reshape(B, N, H, PT_PAD)[..., : Pv * 3]
                .reshape(B, N, H * Pv, 3)
            )
            o_pair = (
                opair_f.reshape(B, N, H, -1) + bdz.astype(F32)
            ).reshape(B, N, -1)
        else:
            # Pair bias. Two separate Linears over z are NOT two HBM sweeps:
            # XLA multi-output-fuses both projections with z's producer, so
            # manually concatenating the kernels into one [C_z, H+dz]
            # projection changes nothing (interleaved A/B: -0.1% at len-512,
            # -1.7% at len-256, inside the run spread — PERF.md round-3
            # closure note).
            b = Linear(H, dtype=self.dtype, name="linear_b")(z)  # [B,N,N,H]

            # Scalar logits: [B, H, N, N] (f32 accumulation).
            a = jnp.einsum("bihc,bjhc->bhij", q, k, preferred_element_type=F32)
            a = a * np.sqrt(1.0 / (3 * C))
            a = a + np.sqrt(1.0 / 3) * jnp.moveaxis(b.astype(F32), -1, 1)

            # Point logits via squared-distance expansion (MXU matmul form).
            sq_q = jnp.sum(q_pts**2, axis=(-1, -2))  # [B, N, H]
            sq_k = jnp.sum(k_pts**2, axis=(-1, -2))  # [B, N, H]
            qk_pts = jnp.einsum(
                "bihpc,bjhpc->bhij", q_pts, k_pts, preferred_element_type=F32
            )
            sq_dist = (
                jnp.moveaxis(sq_q, -1, 1)[..., :, None]
                + jnp.moveaxis(sq_k, -1, 1)[..., None, :]
                - 2.0 * qk_pts
            )  # [B, H, N, N]
            a = a + (-0.5) * pt_scale[None, :, None, None] * sq_dist

            # Mask + softmax over keys. Under sequence parallelism the
            # logits are sharded by query rows (softmax stays local).
            square_mask = self.inf * (mask[:, :, None] * mask[:, None, :] - 1.0)
            a = a + square_mask[:, None, :, :]
            a = sp.constrain_attn(a)
            a = jax.nn.softmax(a, axis=-1)

            # Scalar output (attention weights cast to the compute dtype so
            # the big matmul rides the MXU; accumulation stays f32).
            o = jnp.einsum(
                "bhij,bjhc->bihc", a.astype(self.dtype), v,
                preferred_element_type=F32,
            ).reshape(B, N, H * C)

            # Point output: attention-weighted global points.
            o_pt_global = jnp.einsum(
                "bhij,bjhpc->bihpc", a, v_pts, preferred_element_type=F32
            ).reshape(B, N, H * Pv, 3)

            # Pair output through the down-projected pair rep.
            pair_z = sp.constrain_edge(
                Linear(c.c_z // 4, dtype=self.dtype, name="down_z")(z)
            )
            o_pair = jnp.einsum(
                "bhij,bijd->bihd", a.astype(self.dtype), pair_z,
                preferred_element_type=F32,
            ).reshape(B, N, -1)

        # Shared tail: global points -> local frames, norms, concat. Order
        # matches the reference for weight-import parity:
        # [o, o_pt.x, o_pt.y, o_pt.z, o_pt_norm, o_pair] (ipa_pytorch.py:324).
        o_pt = _invert_apply_frames(mats, trans, o_pt_global)
        o_pt_norm = jnp.sqrt(jnp.sum(o_pt**2, axis=-1) + self.eps)
        o_feats = jnp.concatenate(
            [o, o_pt[..., 0], o_pt[..., 1], o_pt[..., 2], o_pt_norm, o_pair],
            axis=-1,
        )
        return Linear(
            c.c_s, w_init="final", dtype=self.dtype, name="linear_out"
        )(o_feats)


class StructureModuleTransition(nn.Module):
    c: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, s: jnp.ndarray) -> jnp.ndarray:
        s_init = s
        s = Linear(self.c, w_init="relu", dtype=self.dtype, name="linear_1")(s)
        s = jax.nn.relu(s)
        s = Linear(self.c, w_init="relu", dtype=self.dtype, name="linear_2")(s)
        s = jax.nn.relu(s)
        s = Linear(self.c, w_init="final", dtype=self.dtype, name="linear_3")(s)
        return nn.LayerNorm(dtype=self.dtype, name="ln")(s + s_init)


class EdgeTransition(nn.Module):
    node_embed_size: int
    edge_embed_out: int
    num_layers: int = 2
    node_dilation: int = 2
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    tile_i: int = 32
    tile_j: int = 128
    interpret: bool = False  # Pallas interpret mode (CPU-mesh tests)
    # Backward implementation for the fused kernel: "xla" remats through
    # the identical-math XLA twin; "pallas" runs the fused backward kernel
    # (model/pallas/pair_mlp.py:fused_pair_mlp_bwd).
    bwd_impl: str = "xla"

    @nn.compact
    def __call__(
        self,
        node_embed: jnp.ndarray,
        edge_embed: jnp.ndarray,
        node_mask: jnp.ndarray | None = None,
    ):
        """TPU optimization: the reference concatenates
        [edge | node_i | node_j] into an [B, N, N, C_e + 2*C_b] tensor before
        its MLP (ipa_pytorch.py:84-102). Here the first and residual matmuls
        are decomposed by kernel rows — the node_i/node_j contributions are
        [B, N, hidden] matmuls broadcast-added over rows/columns — so the
        N^2-wide concat never exists and ~2/3 of the first matmul's N^2
        FLOPs become O(N). Bit-compatible with imported reference weights
        (kernels are sliced, not reshaped). With ``use_pallas`` the whole
        MLP chain (+ LayerNorm + edge-mask epilogue when ``node_mask`` is
        given) runs as one fused VMEM-resident kernel
        (model/pallas/pair_mlp.py) — inference only."""
        if self.num_layers != 2:
            # The decomposed matmuls, the fused kernel, and the
            # importer-compatible trunk_0/trunk_1 param layout all assume
            # the reference's default 2-layer trunk (config/base.yaml) —
            # fail loudly rather than silently building 2 layers.
            raise NotImplementedError(
                f"EdgeTransition supports num_layers=2 only, got "
                f"{self.num_layers}"
            )
        bias_size = self.node_embed_size // self.node_dilation
        node_bias = Linear(
            bias_size, w_init="relu", dtype=self.dtype, name="initial_embed"
        )(node_embed)
        B, N, _ = node_bias.shape
        c_e = edge_embed.shape[-1]
        hidden = c_e + 2 * bias_size

        w0 = self.param(
            "trunk_0_kernel", _KERNEL_INIT_RELU, (hidden, hidden)
        ).astype(self.dtype)
        b0 = self.param(
            "trunk_0_bias", nn.initializers.zeros_init(), (hidden,)
        ).astype(self.dtype)
        w1 = self.param(
            "trunk_1_kernel", _KERNEL_INIT_RELU, (hidden, hidden)
        ).astype(self.dtype)
        b1 = self.param(
            "trunk_1_bias", nn.initializers.zeros_init(), (hidden,)
        ).astype(self.dtype)
        wf = self.param(
            "final_kernel", nn.initializers.zeros_init(), (hidden, self.edge_embed_out)
        ).astype(self.dtype)
        bf = self.param(
            "final_bias", nn.initializers.zeros_init(), (self.edge_embed_out,)
        ).astype(self.dtype)
        ln_scale = self.param(
            "ln_scale", nn.initializers.ones_init(), (self.edge_embed_out,)
        )
        ln_bias = self.param(
            "ln_bias", nn.initializers.zeros_init(), (self.edge_embed_out,)
        )

        # O(N) row/column terms shared by both execution paths.
        i_term = node_bias @ w0[c_e : c_e + bias_size]
        j_term = node_bias @ w0[c_e + bias_size :]
        fi = node_bias @ wf[c_e : c_e + bias_size]
        fj = node_bias @ wf[c_e + bias_size :]

        use_kernel = self.use_pallas
        sp_ctx = sp.active()
        if use_kernel and sp_ctx is not None:
            mesh_, axis_ = sp_ctx
            if edge_embed.shape[1] % mesh_.shape[axis_]:
                # shard_map needs equal row shards; for lengths not divisible
                # by sp the GSPMD XLA formulation below handles the ragged
                # sharding (real complexes have arbitrary N — crashing here
                # would break exactly the long-complex runs sp targets).
                use_kernel = False
        if use_kernel:
            from framedipt_tpu.model.pallas.pair_mlp import (
                fused_pair_mlp_trainable,
            )

            mask = (
                node_mask
                if node_mask is not None
                else jnp.ones(node_bias.shape[:2], edge_embed.dtype)
            )
            # LayerNorm + edge-mask epilogue are fused inside the kernel.
            # Differentiable; the backward is selected by self.bwd_impl
            # ("xla" remat twin or the fused Pallas backward kernel).
            kernel_args = (
                edge_embed, i_term.astype(self.dtype),
                j_term.astype(self.dtype), mask, mask,
                w0[:c_e], b0, w1, b1, wf, bf, ln_scale, ln_bias,
                fi.astype(self.dtype), fj.astype(self.dtype), wf[:c_e],
            )
            if sp_ctx is None:
                return fused_pair_mlp_trainable(
                    self.tile_i, self.tile_j, self.interpret, self.bwd_impl,
                    *kernel_args,
                )
            # Sequence parallelism: a Pallas custom call is a single-chip op
            # under GSPMD, but the kernel operates on independent row tiles,
            # so shard_map runs one per-shard call on each device's local
            # [B, N/sp, N, C] row block (rows local, columns full). This
            # keeps the fused-kernel win for exactly the long-complex
            # lengths sp is meant for (VERDICT r2 item 5).
            mesh, axis = sp_ctx
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            row3 = P(sp.DP_AXIS, axis, None)
            col3 = P(sp.DP_AXIS, None, None)
            rep = P()
            in_specs = (
                P(sp.DP_AXIS, axis, None, None),  # edge: rows sharded
                row3, col3,                        # i_term local, j_term full
                P(sp.DP_AXIS, axis),               # row mask: local shard
                P(sp.DP_AXIS, None),               # col mask: full
                rep, rep, rep, rep, rep, rep, rep, rep,  # weights replicated
                row3, col3, rep,                   # fi local, fj full, wfe
            )
            tile_i, tile_j, interp = self.tile_i, self.tile_j, self.interpret
            bwd_impl = self.bwd_impl
            return shard_map(
                lambda *a: fused_pair_mlp_trainable(
                    tile_i, tile_j, interp, bwd_impl, *a
                ),
                mesh=mesh,
                in_specs=in_specs,
                out_specs=P(sp.DP_AXIS, axis, None, None),
                check_vma=False,
            )(*kernel_args)
        else:
            # trunk_0 decomposed: concat([e, bi, bj]) @ W0
            #   = e @ W0[:c_e] + bi @ W0[c_e:c_e+b] + bj @ W0[c_e+b:].
            e_term = jnp.einsum(
                "bije,eh->bijh", edge_embed, w0[:c_e],
                preferred_element_type=self.dtype,
            )
            y = jax.nn.relu(
                e_term + i_term[:, :, None, :] + j_term[:, None, :, :] + b0
            )
            y = jax.nn.relu(
                jnp.einsum("bijh,hk->bijk", y, w1, preferred_element_type=self.dtype)
                + b1
            )
            out = (
                jnp.einsum("bijh,ho->bijo", y, wf, preferred_element_type=self.dtype)
                + jnp.einsum(
                    "bije,eo->bijo", edge_embed, wf[:c_e],
                    preferred_element_type=self.dtype,
                )
                + fi[:, :, None, :]
                + fj[:, None, :, :]
                + bf
            )
        # Manual LayerNorm with the shared raw params (f32 statistics),
        # matching nn.LayerNorm semantics.
        out32 = out.astype(jnp.float32)
        mean = jnp.mean(out32, axis=-1, keepdims=True)
        centered = out32 - mean
        var = jnp.mean(centered * centered, axis=-1, keepdims=True)
        normed = centered * jax.lax.rsqrt(var + 1e-6) * ln_scale + ln_bias
        normed = normed.astype(self.dtype)
        if node_mask is not None:
            # Same edge-mask epilogue the kernel fuses: the module applies
            # it on EVERY path so the trunk's masking cannot diverge from
            # the execution path actually taken (e.g. the sp-indivisible-N
            # fallback above, where the config flag still says "kernel").
            em = node_mask[:, :, None] * node_mask[:, None, :]
            normed = normed * em[..., None].astype(self.dtype)
        return sp.constrain_edge(normed)


class SeqTransformerLayer(nn.Module):
    """Post-norm transformer encoder layer (torch TransformerEncoderLayer
    semantics with norm_first=False, ReLU, no dropout — the reference's
    sequence transformer, ipa_pytorch.py:433-443)."""

    d_model: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, pad_mask: jnp.ndarray) -> jnp.ndarray:
        B, N, D = x.shape
        Hd = D // self.num_heads
        qkv = Linear(3 * D, w_init="glorot", dtype=self.dtype, name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, N, self.num_heads, Hd)
        k = k.reshape(B, N, self.num_heads, Hd)
        v = v.reshape(B, N, self.num_heads, Hd)
        logits = jnp.einsum(
            "bihd,bjhd->bhij", q, k, preferred_element_type=F32
        ) / np.sqrt(Hd)
        logits = logits + (pad_mask[:, None, None, :] - 1.0) * 1e9
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum(
            "bhij,bjhd->bihd", attn.astype(self.dtype), v,
            preferred_element_type=F32,
        ).reshape(B, N, D)
        out = Linear(D, dtype=self.dtype, name="out_proj")(out)
        x = nn.LayerNorm(dtype=self.dtype, name="norm1")(x + out)
        ff = Linear(D, dtype=self.dtype, name="ff_linear1")(x)
        ff = jax.nn.relu(ff)
        ff = Linear(D, dtype=self.dtype, name="ff_linear2")(ff)
        return nn.LayerNorm(dtype=self.dtype, name="norm2")(x + ff)


class TorsionAngles(nn.Module):
    c: int
    num_torsions: int = 1
    eps: float = 1e-8

    @nn.compact
    def __call__(self, s: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        s_init = s
        s = Linear(self.c, w_init="relu", name="linear_1")(s)
        s = jax.nn.relu(s)
        s = Linear(self.c, w_init="relu", name="linear_2")(s)
        s = s + s_init
        unnormalized = Linear(
            self.num_torsions * 2, w_init="final", name="linear_final"
        )(s)
        norm = jnp.sqrt(
            jnp.maximum(
                jnp.sum(unnormalized**2, axis=-1, keepdims=True), self.eps
            )
        )
        return unnormalized, unnormalized / norm


class IpaTrunk(nn.Module):
    """The 4-block IPA trunk. Returns final (scaled) rigids, psi prediction,
    and node embeddings. Score computation lives in ScoreNetwork where the
    diffuser is in scope (cleaner separation than the reference, which
    threads the diffuser into the trunk, ipa_pytorch.py:416-422)."""

    conf: ModelConfig

    @nn.compact
    def __call__(
        self,
        init_node_embed: jnp.ndarray,  # [B, N, C_s]
        edge_embed: jnp.ndarray,  # [B, N, N, C_z]
        rigids_t7: jnp.ndarray,  # [B, N, 7] (translations in Angstroms)
        node_mask: jnp.ndarray,  # [B, N]
        diffuse_mask: jnp.ndarray,  # [B, N]
    ) -> dict[str, jnp.ndarray]:
        ipa_conf = self.conf.ipa
        dtype = (
            jnp.bfloat16 if self.conf.compute_dtype == "bfloat16" else jnp.float32
        )
        curr = Rigid.from_tensor7(rigids_t7).scale_trans(ipa_conf.coordinate_scaling)
        init_node_embed = (init_node_embed * node_mask[..., None]).astype(dtype)
        edge_embed = sp.constrain_edge(edge_embed.astype(dtype))
        node_embed = init_node_embed

        for b in range(ipa_conf.num_blocks):
            ipa_embed = InvariantPointAttention(
                ipa_conf,
                dtype=dtype,
                use_pallas=bool(ipa_conf.use_pallas_ipa),
                name=f"ipa_{b}",
            )(node_embed, edge_embed, curr, node_mask)
            ipa_embed = ipa_embed * node_mask[..., None].astype(dtype)
            node_embed = nn.LayerNorm(dtype=dtype, name=f"ipa_ln_{b}")(
                node_embed + ipa_embed
            )

            skip = Linear(
                ipa_conf.c_skip, w_init="final", dtype=dtype, name=f"skip_embed_{b}"
            )(init_node_embed)
            tfmr_in = jnp.concatenate([node_embed, skip], axis=-1)
            tfmr_out = tfmr_in
            for layer in range(ipa_conf.seq_tfmr_num_layers):
                tfmr_out = SeqTransformerLayer(
                    d_model=ipa_conf.c_s + ipa_conf.c_skip,
                    num_heads=ipa_conf.seq_tfmr_num_heads,
                    dtype=dtype,
                    name=f"seq_tfmr_{b}_layer_{layer}",
                )(tfmr_out, node_mask)
            node_embed = node_embed + Linear(
                ipa_conf.c_s, w_init="final", dtype=dtype, name=f"post_tfmr_{b}"
            )(tfmr_out)
            node_embed = StructureModuleTransition(
                c=ipa_conf.c_s, dtype=dtype, name=f"node_transition_{b}"
            )(node_embed)
            node_embed = node_embed * node_mask[..., None].astype(dtype)

            # Frame updates always in float32.
            rigid_update = Linear(6, w_init="final", name=f"bb_update_{b}")(
                (node_embed * diffuse_mask[..., None].astype(dtype)).astype(F32)
            )
            curr = curr.compose_q_update_vec(
                rigid_update, update_mask=diffuse_mask[..., None]
            )

            if b < ipa_conf.num_blocks - 1:
                edge_embed = EdgeTransition(
                    node_embed_size=ipa_conf.c_s,
                    edge_embed_out=self.conf.edge_embed_size,
                    dtype=dtype,
                    use_pallas=bool(ipa_conf.use_pallas_kernel),
                    tile_i=ipa_conf.pallas_tile_i,
                    tile_j=ipa_conf.pallas_tile_j,
                    interpret=bool(getattr(ipa_conf, "pallas_interpret", False)),
                    bwd_impl=getattr(ipa_conf, "pallas_bwd_impl", "xla"),
                    name=f"edge_transition_{b}",
                )(node_embed, edge_embed, node_mask=node_mask.astype(dtype))
                # Edge-mask epilogue is applied inside EdgeTransition on
                # every path (fused in the kernel; explicit on XLA).

        _, psi_pred = TorsionAngles(ipa_conf.c_s, 1, name="torsion_pred")(
            node_embed.astype(F32)
        )
        return {
            "final_rigids_scaled_t7": curr.to_tensor7(),
            "psi": psi_pred,
            "node_embed": node_embed.astype(F32),
        }
