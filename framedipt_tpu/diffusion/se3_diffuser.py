"""SE(3) diffusion: composition of IGSO(3) rotation + VP-SDE translation
diffusion over rigid frames, with inpainting masks.

Mirrors the behavioral contract of framedipt/diffusion/se3_diffuser.py
(forward_marginal :198-262, reverse :346-401, sample_ref with imputation
:455-529, calc_rot_score via quaternion delta :281-292), but operates on the
framework's Rigid pytree directly — rotations never round-trip through
host scipy; the rotvec <-> quaternion conversions happen on-device so the
whole reverse step lives inside `lax.scan`.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from framedipt_tpu.diffusion.r3_diffuser import R3Diffuser
from framedipt_tpu.diffusion.so3_diffuser import SO3Diffuser
from framedipt_tpu.geometry import quat as quat_ops
from framedipt_tpu.geometry.rigid import Rigid
from framedipt_tpu.tools.config import DiffuserConfig


def _apply_mask(x_diff, x_fixed, mask):
    return mask * x_diff + (1.0 - mask) * x_fixed


def extract_trans_rotvec(r: Rigid) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Rigid -> (translations [..., 3], rotation vectors [..., 3])."""
    return r.trans, quat_ops.to_rotvec(r.qs)


def assemble_rigid(rotvec: jnp.ndarray, trans: jnp.ndarray) -> Rigid:
    return Rigid(quat_ops.from_rotvec(rotvec), trans)


class MarginalSample(NamedTuple):
    rigids_t: Rigid
    trans_score: jnp.ndarray
    rot_score: jnp.ndarray
    trans_score_scaling: jnp.ndarray
    rot_score_scaling: jnp.ndarray


class SE3Diffuser:
    def __init__(self, conf: DiffuserConfig) -> None:
        self.conf = conf
        self.diffuse_rot = bool(conf.diffuse_rot)
        self.diffuse_trans = bool(conf.diffuse_trans)
        self.so3 = SO3Diffuser(conf.so3)
        self.r3 = R3Diffuser(conf.r3)

    # -- score scalings -------------------------------------------------------

    def score_scaling(self, t: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        return self.so3.score_scaling(t), self.r3.score_scaling(t)

    # -- scores -----------------------------------------------------------------

    def calc_trans_score(
        self,
        trans_t: jnp.ndarray,
        trans_0: jnp.ndarray,
        t: jnp.ndarray,
        scale: bool = True,
    ) -> jnp.ndarray:
        return self.r3.score(trans_t, trans_0, t, scale=scale)

    def calc_trans_0(
        self, trans_score: jnp.ndarray, trans_t: jnp.ndarray, t: jnp.ndarray
    ) -> jnp.ndarray:
        return self.r3.calc_trans_0(trans_score, trans_t, t)

    def calc_rot_score(
        self, rots_t_quats: jnp.ndarray, rots_0_quats: jnp.ndarray, t: jnp.ndarray
    ) -> jnp.ndarray:
        """Score of the rotation marginal from the quaternion delta
        q_{0->t} = q_0^{-1} q_t (ref se3_diffuser.py:281-292)."""
        quats_0_inv = quat_ops.invert(rots_0_quats)
        quats_0t = quat_ops.multiply(quats_0_inv, rots_t_quats)
        rotvec_0t = quat_ops.to_rotvec(quats_0t)
        return self.so3.score(rotvec_0t, t)

    # -- forward ---------------------------------------------------------------

    def forward_marginal(
        self,
        key: jax.Array,
        rigids_0: Rigid,
        t: jnp.ndarray,
        diffuse_mask: jnp.ndarray | None = None,
    ) -> MarginalSample:
        """Noise clean frames to time t; returns frames + scores + scalings."""
        k_rot, k_trans = jax.random.split(key)
        trans_0, rot_0 = extract_trans_rotvec(rigids_0)

        if self.diffuse_rot:
            rot_t, rot_score = self.so3.forward_marginal(k_rot, rot_0, t)
            rot_score_scaling = self.so3.score_scaling(t)
        else:
            rot_t = rot_0
            rot_score = jnp.zeros_like(rot_0)
            rot_score_scaling = jnp.ones_like(jnp.asarray(t, jnp.float32))

        if self.diffuse_trans:
            trans_t, trans_score = self.r3.forward_marginal(
                k_trans, trans_0, t, diffuse_mask=diffuse_mask
            )
            trans_score_scaling = self.r3.score_scaling(t)
        else:
            trans_t = trans_0
            trans_score = jnp.zeros_like(trans_0)
            trans_score_scaling = jnp.ones_like(jnp.asarray(t, jnp.float32))

        if diffuse_mask is not None:
            m = diffuse_mask[..., None]
            rot_t = _apply_mask(rot_t, rot_0, m)
            rot_score = _apply_mask(rot_score, jnp.zeros_like(rot_score), m)

        return MarginalSample(
            rigids_t=assemble_rigid(rot_t, trans_t),
            trans_score=trans_score,
            rot_score=rot_score,
            trans_score_scaling=trans_score_scaling,
            rot_score_scaling=rot_score_scaling,
        )

    def forward(
        self,
        key: jax.Array,
        rigids_t_1: Rigid,
        t_1: jnp.ndarray,
        dt: float,
        diffuse_mask: jnp.ndarray | None = None,
    ) -> Rigid:
        """One-step forward noising of frames (ref se3_diffuser.py:50-95)."""
        k_rot, k_trans = jax.random.split(key)
        trans_t_1, rot_t_1 = extract_trans_rotvec(rigids_t_1)
        trans_t = self.r3.forward(
            k_trans, trans_t_1, t_1, dt, diffuse_mask=diffuse_mask, center=False
        )
        rot_t = self.so3.forward(k_rot, rot_t_1, t_1, dt, diffuse_mask=diffuse_mask)
        if diffuse_mask is not None:
            m = diffuse_mask[..., None]
            rot_t = _apply_mask(rot_t, rot_t_1, m)
            trans_t = _apply_mask(trans_t, trans_t_1, m)
        return assemble_rigid(rot_t, trans_t)

    # -- reverse ----------------------------------------------------------------

    def reverse(
        self,
        key: jax.Array,
        rigid_t: Rigid,
        rot_score: jnp.ndarray,
        trans_score: jnp.ndarray,
        t: jnp.ndarray,
        dt: float,
        diffuse_mask: jnp.ndarray | None = None,
        center: bool = True,
        noise_scale: float = 1.0,
    ) -> Rigid:
        """One reverse-SDE step on frames (ref se3_diffuser.py:346-401)."""
        k_rot, k_trans = jax.random.split(key)
        trans_t, rot_t = extract_trans_rotvec(rigid_t)

        if self.diffuse_rot:
            rot_t_1 = self.so3.reverse(
                k_rot, rot_t, rot_score, t, dt, noise_scale=noise_scale
            )
        else:
            rot_t_1 = rot_t

        if self.diffuse_trans:
            trans_t_1 = self.r3.reverse(
                k_trans,
                trans_t,
                trans_score,
                t,
                dt,
                diffuse_mask=diffuse_mask,
                center=center,
                noise_scale=noise_scale,
            )
        else:
            trans_t_1 = trans_t

        if diffuse_mask is not None:
            m = diffuse_mask[..., None]
            trans_t_1 = _apply_mask(trans_t_1, trans_t, m)
            rot_t_1 = _apply_mask(rot_t_1, rot_t, m)
        return assemble_rigid(rot_t_1, trans_t_1)

    # -- reference sampling --------------------------------------------------------

    def sample_ref(
        self,
        key: jax.Array,
        n_samples: int,
        impute: Rigid | None = None,
        diffuse_mask: jnp.ndarray | None = None,
    ) -> Rigid:
        """Sample frames from the stationary distribution, imputing the fixed
        region from ``impute`` where diffuse_mask == 0 (ref :455-529)."""
        k_rot, k_trans = jax.random.split(key)
        if impute is None:
            if not (self.diffuse_rot and self.diffuse_trans):
                raise ValueError(
                    "impute frames required when not diffusing rot or trans"
                )
            if diffuse_mask is not None:
                raise ValueError("impute frames required for masked diffusion")
            impute = Rigid.identity((n_samples,))
        trans_impute, rot_impute = extract_trans_rotvec(impute)

        if self.diffuse_rot:
            rot_ref = self.so3.sample_ref(k_rot, n_samples).reshape(rot_impute.shape)
        else:
            rot_ref = rot_impute

        if self.diffuse_trans:
            trans_ref = self.r3.sample_stationary(
                k_trans, trans_impute, diffuse_mask=diffuse_mask
            )
        else:
            trans_ref = trans_impute

        if diffuse_mask is not None:
            rot_ref = _apply_mask(rot_ref, rot_impute, diffuse_mask[..., None])
        return assemble_rigid(rot_ref, trans_ref)

    # -- log probs (EigenFold confidence) --------------------------------------------

    def log_prob_forward(
        self,
        rigids_t: Rigid,
        rigids_t_1: Rigid,
        t_1: jnp.ndarray,
        dt: float,
        diffuse_mask: jnp.ndarray | None = None,
    ) -> jnp.ndarray:
        trans_t, rot_t = extract_trans_rotvec(rigids_t)
        trans_t_1, rot_t_1 = extract_trans_rotvec(rigids_t_1)
        return self.r3.log_prob_forward(
            trans_t, trans_t_1, t_1, dt, diffuse_mask
        ) + self.so3.log_prob_forward(rot_t, rot_t_1, t_1, dt, diffuse_mask)

    def log_prob_backward(
        self,
        rigids_t: Rigid,
        rigids_t_1: Rigid,
        trans_score_t: jnp.ndarray,
        rot_score_t: jnp.ndarray,
        t: jnp.ndarray,
        dt: float,
        diffuse_mask: jnp.ndarray | None = None,
    ) -> jnp.ndarray:
        trans_t, rot_t = extract_trans_rotvec(rigids_t)
        trans_t_1, rot_t_1 = extract_trans_rotvec(rigids_t_1)
        return self.r3.log_prob_backward(
            trans_t, trans_t_1, trans_score_t, t, dt, diffuse_mask
        ) + self.so3.log_prob_backward(
            rot_t, rot_t_1, rot_score_t, t, dt, diffuse_mask
        )
