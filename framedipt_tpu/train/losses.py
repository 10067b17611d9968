"""Denoising score-matching losses for SE(3) diffusion training.

The reference repo ships no train.py (SURVEY.md intro); the loss structure
is reconstructed from its config contract
(/root/reference/config/base.yaml:119-136 — trans/rot score losses with
score-scaling normalization, separate rotation axis/angle penalties with a
t-threshold on the angle term, x0-parameterized translation loss below
trans_x0_threshold, and auxiliary backbone-atom + pairwise-distance losses
gated at small t) and the FrameDiff lineage it forks. Deviations, if any,
are confined to this module and documented inline.

All losses are masked means over the *diffused* region (res_mask *
(1 - fixed_mask)) and stay pure-jnp for use inside the pjit'd train step.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from framedipt_tpu.geometry.quat import safe_norm
from framedipt_tpu.tools.config import ExperimentConfig


def _masked_mean(x: jnp.ndarray, mask: jnp.ndarray, axis=None) -> jnp.ndarray:
    return jnp.sum(x * mask, axis=axis) / (jnp.sum(mask, axis=axis) + 1e-10)


def score_matching_losses(
    pred: dict[str, jnp.ndarray],
    batch: dict[str, jnp.ndarray],
    exp_conf: ExperimentConfig,
    diffuse_rot: bool = True,
    diffuse_trans: bool = True,
) -> tuple[jnp.ndarray, dict[str, jnp.ndarray]]:
    """Total loss + per-term dict.

    Expects in ``batch``: trans_score, rot_score [B,N,3], trans_score_scaling,
    rot_score_scaling [B], t [B], res_mask, fixed_mask [B,N],
    rigids_0 [B,N,7], atom14_gt [B,N,14,3] (idealized backbone from clean
    frames). ``pred``: trans_score, rot_score, rigids, atom14.
    """
    t = batch["t"]  # [B]
    res_mask = batch["res_mask"].astype(jnp.float32)
    loss_mask = res_mask * (1.0 - batch["fixed_mask"].astype(jnp.float32))
    batch_size = res_mask.shape[0]

    # ---------------- translation ----------------
    trans_scale = batch["trans_score_scaling"][:, None, None]  # [B,1,1]
    gt_ts, pred_ts = batch["trans_score"], pred["trans_score"]
    trans_score_mse = jnp.sum(
        ((gt_ts - pred_ts) / trans_scale) ** 2, axis=-1
    )  # [B,N]
    trans_score_loss = _masked_mean(trans_score_mse, loss_mask, axis=-1)  # [B]

    # x0-parameterized loss in scaled coordinates.
    coord_scale = exp_conf.coordinate_scaling
    gt_trans_x0 = batch["rigids_0"][..., 4:] * coord_scale
    pred_trans_x0 = pred["rigids"][..., 4:] * coord_scale
    trans_x0_mse = jnp.sum((gt_trans_x0 - pred_trans_x0) ** 2, axis=-1)
    trans_x0_loss = _masked_mean(trans_x0_mse, loss_mask, axis=-1)

    use_x0 = (t < exp_conf.trans_x0_threshold).astype(jnp.float32)
    trans_loss = (
        trans_x0_loss * use_x0 + trans_score_loss * (1.0 - use_x0)
    ) * exp_conf.trans_loss_weight
    trans_loss = trans_loss * float(diffuse_trans)

    # ---------------- rotation ----------------
    gt_rs, pred_rs = batch["rot_score"], pred["rot_score"]
    rot_scale = batch["rot_score_scaling"][:, None, None]
    if exp_conf.separate_rot_loss:
        gt_angle = safe_norm(gt_rs, keepdims=True)
        pred_angle = safe_norm(pred_rs, keepdims=True)
        gt_axis = gt_rs / (gt_angle + 1e-6)
        pred_axis = pred_rs / (pred_angle + 1e-6)
        axis_loss = _masked_mean(
            jnp.sum((gt_axis - pred_axis) ** 2, axis=-1), loss_mask, axis=-1
        )
        angle_mse = jnp.sum(
            ((gt_angle - pred_angle) / rot_scale) ** 2, axis=-1
        )
        angle_loss = (
            _masked_mean(angle_mse, loss_mask, axis=-1)
            * exp_conf.rot_loss_weight
        )
        # Angle term only where t > rot_loss_t_threshold (config :127-129).
        angle_loss = angle_loss * (
            t > exp_conf.rot_loss_t_threshold
        ).astype(jnp.float32)
        rot_loss = axis_loss + angle_loss
    else:
        rot_mse = jnp.sum(((gt_rs - pred_rs) / rot_scale) ** 2, axis=-1)
        rot_loss = (
            _masked_mean(rot_mse, loss_mask, axis=-1) * exp_conf.rot_loss_weight
        )
    rot_loss = rot_loss * float(diffuse_rot)

    # ---------------- auxiliary: backbone atoms ----------------
    # atom14 slots 0-4 = N, CA, C, O, CB.
    gt_bb = batch["atom14_gt"][..., :5, :]
    pred_bb = pred["atom14"][..., :5, :]
    bb_mse = jnp.sum((gt_bb - pred_bb) ** 2, axis=(-1, -2))  # [B,N]
    bb_atom_loss = (
        _masked_mean(bb_mse, loss_mask, axis=-1) * exp_conf.bb_atom_loss_weight
    )
    bb_atom_loss = bb_atom_loss * (
        t < exp_conf.bb_atom_loss_t_filter
    ).astype(jnp.float32)

    # ---------------- auxiliary: pairwise distances ----------------
    num_res = res_mask.shape[1]
    gt_flat = gt_bb.reshape(batch_size, num_res * 5, 3)
    pred_flat = pred_bb.reshape(batch_size, num_res * 5, 3)
    atom_mask = jnp.repeat(loss_mask, 5, axis=-1)  # [B, N*5]
    # safe_norm keeps the self-distance diagonal's gradient finite.
    gt_d = safe_norm(gt_flat[:, :, None] - gt_flat[:, None, :], eps=1e-10)
    pred_d = safe_norm(pred_flat[:, :, None] - pred_flat[:, None, :], eps=1e-10)
    pair_mask = atom_mask[:, :, None] * atom_mask[:, None, :]
    pair_mask = pair_mask * (
        1.0 - jnp.eye(num_res * 5, dtype=pair_mask.dtype)[None]
    )
    # Only local structure matters for the auxiliary loss: restrict to
    # gt pairs < 6A like the FrameDiff lineage. The restriction must be in
    # the MASK (numerator and denominator): normalizing by all valid pairs
    # shrinks the loss by the local/total pair ratio (~O(1/N)), silently
    # disabling the auxiliary for long proteins.
    pair_mask = pair_mask * (gt_d < 6.0) * (gt_d > 0)
    dist_mse = (gt_d - pred_d) ** 2
    dist_mat_loss = jnp.sum(dist_mse * pair_mask, axis=(-1, -2)) / (
        jnp.sum(pair_mask, axis=(-1, -2)) + 1e-10
    )
    dist_mat_loss = dist_mat_loss * exp_conf.dist_mat_loss_weight
    dist_mat_loss = dist_mat_loss * (
        t < exp_conf.dist_mat_loss_t_filter
    ).astype(jnp.float32)

    aux_loss = (bb_atom_loss + dist_mat_loss) * exp_conf.aux_loss_weight

    per_example = trans_loss + rot_loss + aux_loss  # [B]
    total = jnp.mean(per_example)
    terms = {
        "total_loss": total,
        "trans_loss": jnp.mean(trans_loss),
        "rot_loss": jnp.mean(rot_loss),
        "bb_atom_loss": jnp.mean(bb_atom_loss),
        "dist_mat_loss": jnp.mean(dist_mat_loss),
        "per_example_loss": per_example,
    }
    return total, terms


def t_stratified_metrics(
    per_example_loss: jnp.ndarray, t: jnp.ndarray, num_bins: int = 4
) -> dict[str, Any]:
    """Loss binned by timestep for observability
    (ref experiments/utils.py:115-163). Pure host-side helper."""
    import numpy as np

    losses = np.asarray(per_example_loss)
    ts = np.asarray(t)
    bins = np.linspace(0.0, 1.0 + 1e-3, num_bins + 1)
    out = {}
    idx = np.digitize(ts, bins) - 1
    for b in range(num_bins):
        sel = idx == b
        if sel.any():
            out[f"loss t=[{bins[b]:.2f},{bins[b+1]:.2f})"] = float(
                losses[sel].mean()
            )
    return out
