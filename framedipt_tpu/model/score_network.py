"""ScoreNetwork: embedder + IPA trunk + score/psi/backbone heads.

Behavioral contract mirrors framedipt/model/score_network.py:200-275:
aatype preprocessing (UNK substitution in the diffused region), masked
embeddings, trunk, psi blending with ground truth on fixed residues, rot
score from the quaternion delta between input and predicted frames, trans
score from the translation residual, and atom37/atom14 backbone
reconstruction.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from framedipt_tpu.diffusion.se3_diffuser import SE3Diffuser
from framedipt_tpu.geometry import frames
from framedipt_tpu.geometry.rigid import Rigid
from framedipt_tpu.model.embed import Embedder
from framedipt_tpu.model.ipa import IpaTrunk
from framedipt_tpu.tools.config import ModelConfig


def preprocess_aatype(
    aatype: jnp.ndarray | None,
    fixed_mask: jnp.ndarray,
    inpainting: bool,
    input_aatype: bool,
) -> jnp.ndarray | None:
    """Replace diffused-region residue types with UNK (20) unless the model
    is configured to see them (ref framedipt/data/utils.py:565-611)."""
    if aatype is None or (not inpainting and not input_aatype):
        return None
    aatype = aatype.astype(jnp.int32)
    if not input_aatype:
        aatype = jnp.where(fixed_mask > 0.5, aatype, jnp.full_like(aatype, 20))
    return aatype


class ScoreNetwork(nn.Module):
    conf: ModelConfig
    diffuser: SE3Diffuser
    inpainting: bool = False

    @nn.compact
    def __call__(self, input_feats: dict[str, jnp.ndarray]) -> dict[str, jnp.ndarray]:
        """input_feats keys (shapes as in the reference sampler):
        res_mask [B,N], fixed_mask [B,N], seq_idx [B,N], t [B],
        sc_ca_t [B,N,3], rigids_t [B,N,7], torsion_angles_sin_cos [B,N,7,2],
        optional aatype [B,N].
        """
        bb_mask = input_feats["res_mask"].astype(jnp.float32)
        fixed_mask = input_feats["fixed_mask"].astype(jnp.float32)
        edge_mask = bb_mask[..., None] * bb_mask[..., None, :]

        aatype = preprocess_aatype(
            input_feats.get("aatype"),
            fixed_mask,
            self.inpainting,
            self.conf.input_aatype,
        )

        compute_dtype = (
            jnp.bfloat16
            if self.conf.compute_dtype == "bfloat16"
            else jnp.float32
        )
        use_pallas = bool(self.conf.ipa.use_pallas_embedder)
        node_embed, edge_embed = Embedder(
            self.conf,
            inpainting=self.inpainting,
            dtype=compute_dtype,
            use_pallas=use_pallas,
            name="embedding_layer",
        )(
            seq_idx=input_feats["seq_idx"],
            t=input_feats["t"],
            fixed_mask=fixed_mask,
            self_conditioning_ca=input_feats["sc_ca_t"],
            aatype=aatype,
            node_mask=bb_mask,
        )
        node_embed = node_embed * bb_mask[..., None].astype(node_embed.dtype)
        if not use_pallas:
            # The pallas edge MLP fuses the edge-mask epilogue in-kernel.
            edge_embed = edge_embed * edge_mask[..., None].astype(edge_embed.dtype)

        diffuse_mask = (1.0 - fixed_mask) * bb_mask
        rigids_t7 = input_feats["rigids_t"].astype(jnp.float32)
        trunk_out = IpaTrunk(self.conf, name="score_model")(
            node_embed, edge_embed, rigids_t7, bb_mask, diffuse_mask
        )

        # Scores from the predicted frames (ref ipa_pytorch.py:552-564).
        init_rigids = Rigid.from_tensor7(rigids_t7)
        curr_scaled = Rigid.from_tensor7(trunk_out["final_rigids_scaled_t7"])
        rot_score = self.diffuser.calc_rot_score(
            init_rigids.qs, curr_scaled.qs, input_feats["t"]
        )
        rot_score = rot_score * bb_mask[..., None]

        curr = curr_scaled.scale_trans(1.0 / self.conf.ipa.coordinate_scaling)
        trans_score = self.diffuser.calc_trans_score(
            init_rigids.trans,
            curr.trans,
            input_feats["t"][:, None, None],
            scale=True,
        )
        trans_score = trans_score * bb_mask[..., None]

        # Psi blending: fixed residues keep their ground-truth psi
        # (ref score_network.py:259-260).
        gt_psi = input_feats["torsion_angles_sin_cos"][..., 2, :]
        psi_pred = trunk_out["psi"]
        blend = 1.0 - fixed_mask[..., None]
        psi_pred = blend * psi_pred + (1.0 - blend) * gt_psi

        atom37, atom37_mask, out_aatype, atom14 = frames.compute_backbone(
            curr, psi_pred, aatype=aatype
        )
        return {
            "psi": psi_pred,
            "rot_score": rot_score,
            "trans_score": trans_score,
            "rigids": curr.to_tensor7(),
            "atom37": atom37 * atom37_mask[..., None],
            "atom14": atom14,
        }
