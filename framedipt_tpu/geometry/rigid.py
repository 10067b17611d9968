"""Rigid-frame transforms as a JAX pytree.

TPU-first redesign of the reference's Rigid/Rotation classes
(openfold/utils/rigid_utils.py:289-1448). The canonical state is
``(quaternion [..., 4], translation [..., 3])`` — identical to the tensor_7
layout the reference threads through its sampler — and rotation matrices are
materialized only where frames are applied to points. All ops are pure
functions of arrays, so a Rigid can be carried through ``lax.scan``, vmapped,
and sharded like any other pytree.

Key behavioral parity points with the reference fork:
- ``compose_q_update_vec`` threads an ``update_mask`` so fixed (inpainting)
  residues keep their frames bit-exactly (rigid_utils.py:587-617, 1039-1064).
- ``from_3_points`` uses the same Gram-Schmidt construction
  (rigid_utils.py:1233).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from framedipt_tpu.geometry import quat as quat_ops


class Rigid(NamedTuple):
    """Batch of rigid transforms: unit quaternions (w,x,y,z) + translations."""

    qs: jnp.ndarray  # [..., 4]
    trans: jnp.ndarray  # [..., 3]

    @property
    def shape(self) -> tuple[int, ...]:
        return self.trans.shape[:-1]

    # -- constructors -------------------------------------------------------

    @staticmethod
    def identity(shape: tuple[int, ...], dtype=jnp.float32) -> "Rigid":
        qs = jnp.zeros(shape + (4,), dtype).at[..., 0].set(1.0)
        return Rigid(qs, jnp.zeros(shape + (3,), dtype))

    @staticmethod
    def from_tensor7(t: jnp.ndarray, normalize: bool = False) -> "Rigid":
        qs = t[..., :4]
        if normalize:
            qs = quat_ops.normalize(qs)
        return Rigid(qs, t[..., 4:])

    @staticmethod
    def from_rotmat_trans(mats: jnp.ndarray, trans: jnp.ndarray) -> "Rigid":
        return Rigid(quat_ops.from_rotmat(mats), trans)

    @staticmethod
    def from_tensor4x4(t: jnp.ndarray) -> "Rigid":
        return Rigid.from_rotmat_trans(t[..., :3, :3], t[..., :3, 3])

    @staticmethod
    def from_3_points(
        p_neg_x: jnp.ndarray,
        origin: jnp.ndarray,
        p_xy: jnp.ndarray,
        eps: float = 1e-8,
    ) -> "Rigid":
        """Gram-Schmidt frame from three points (AF2 Algorithm 21).

        Called as ``from_3_points(N, CA, C)`` for backbone frames. Matches
        openfold/utils/rigid_utils.py:1233-1276 exactly: e0 = origin - p_neg_x
        (CA - N), e1 = p_xy - origin (C - CA) orthogonalized against e0, and
        the rotation has columns [e0 | e1 | e0 x e1].
        """
        e0 = origin - p_neg_x
        e1 = p_xy - origin
        denom = jnp.sqrt(jnp.sum(e0 * e0, axis=-1, keepdims=True) + eps)
        e0 = e0 / denom
        dot = jnp.sum(e0 * e1, axis=-1, keepdims=True)
        e1 = e1 - e0 * dot
        denom1 = jnp.sqrt(jnp.sum(e1 * e1, axis=-1, keepdims=True) + eps)
        e1 = e1 / denom1
        e2 = jnp.cross(e0, e1)
        mats = jnp.stack([e0, e1, e2], axis=-1)  # columns are the basis
        return Rigid.from_rotmat_trans(mats, origin)

    # -- conversions --------------------------------------------------------

    def rot_mats(self) -> jnp.ndarray:
        return quat_ops.to_rotmat(self.qs)

    def to_tensor7(self) -> jnp.ndarray:
        return jnp.concatenate([self.qs, self.trans], axis=-1)

    def to_tensor4x4(self) -> jnp.ndarray:
        m = self.rot_mats()
        out = jnp.zeros(self.shape + (4, 4), dtype=self.trans.dtype)
        out = out.at[..., :3, :3].set(m)
        out = out.at[..., :3, 3].set(self.trans)
        out = out.at[..., 3, 3].set(1.0)
        return out

    # -- group ops ----------------------------------------------------------

    def apply(self, pts: jnp.ndarray) -> jnp.ndarray:
        """Apply the transform to points [..., 3] (broadcasting over frames)."""
        m = self.rot_mats()
        return jnp.einsum("...ij,...j->...i", m, pts) + self.trans

    def invert_apply(self, pts: jnp.ndarray) -> jnp.ndarray:
        m = self.rot_mats()
        return jnp.einsum("...ji,...j->...i", m, pts - self.trans)

    def compose(self, other: "Rigid") -> "Rigid":
        """self ∘ other (apply ``other`` first in point space: x -> self(other(x)))."""
        new_q = quat_ops.multiply(self.qs, other.qs)
        new_t = self.apply(other.trans)
        return Rigid(quat_ops.normalize(new_q), new_t)

    def invert(self) -> "Rigid":
        inv_q = quat_ops.invert(self.qs)
        inv_rot = quat_ops.to_rotmat(inv_q)
        inv_t = -jnp.einsum("...ij,...j->...i", inv_rot, self.trans)
        return Rigid(inv_q, inv_t)

    def compose_q_update_vec(
        self, update: jnp.ndarray, update_mask: jnp.ndarray | None = None
    ) -> "Rigid":
        """Compose with a 6-dof update [..., 6]: (1, bx, by, bz) quaternion +
        frame-local translation. The fork's ``update_mask`` gates both parts so
        masked frames are *exactly* unchanged (rigid_utils.py:1039-1064)."""
        q_vec, t_vec = update[..., :3], update[..., 3:]
        quat_update = quat_ops.multiply_by_vec(self.qs, q_vec)
        if update_mask is not None:
            quat_update = quat_update * update_mask
        new_qs = quat_ops.normalize(self.qs + quat_update)
        trans_update = jnp.einsum("...ij,...j->...i", self.rot_mats(), t_vec)
        if update_mask is not None:
            trans_update = trans_update * update_mask
        return Rigid(new_qs, self.trans + trans_update)

    # -- misc ---------------------------------------------------------------

    def scale_trans(self, factor) -> "Rigid":
        return Rigid(self.qs, self.trans * factor)

    def __getitem__(self, idx) -> "Rigid":
        if not isinstance(idx, tuple):
            idx = (idx,)
        return Rigid(self.qs[idx + (slice(None),)], self.trans[idx + (slice(None),)])
