"""Frame <-> all-atom conversions (AF2 rigid-group conventions) in pure jnp.

Re-implements the reference's torsion-to-frames/atom pipeline
(framedipt/protein/all_atom.py:19-176, openfold/utils/feats.py:165-267) on
top of the chemical tables. This module works in (rotation-matrix,
translation) pairs locally — torsion frames are natural 3x3 constructions —
and only the inputs/outputs use the framework Rigid (quaternion) type.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from framedipt_tpu.data import constants as rc
from framedipt_tpu.geometry.rigid import Rigid

# Static tables as numpy; jnp conversion happens at trace time (constants).
_DEFAULT_FRAMES = np.asarray(rc.restype_rigid_group_default_frame, np.float32)
_ATOM14_POS = np.asarray(rc.restype_atom14_rigid_group_positions, np.float32)
_ATOM14_MASK = np.asarray(rc.restype_atom14_mask, np.float32)
_ATOM14_GROUP = np.asarray(rc.restype_atom14_to_rigid_group, np.int32)


def _mat_compose(m1, t1, m2, t2):
    """(m1,t1) o (m2,t2): apply m2 first."""
    m = jnp.einsum("...ij,...jk->...ik", m1, m2)
    t = jnp.einsum("...ij,...j->...i", m1, t2) + t1
    return m, t


def torsion_angles_to_frames(
    bb_rigids: Rigid, alpha: jnp.ndarray, aatype: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Backbone frames + 7 torsion sin/cos -> 8 rigid-group frames.

    Args:
        bb_rigids: [..., N] backbone frames.
        alpha: [..., N, 7, 2] torsion (sin, cos).
        aatype: [..., N] residue types (0-20).

    Returns:
        (rot_mats [..., N, 8, 3, 3], trans [..., N, 8, 3]) — all groups in
        global coordinates. Mirrors openfold/utils/feats.py:165-229.
    """
    default_4x4 = jnp.asarray(_DEFAULT_FRAMES)[aatype]  # [..., N, 8, 4, 4]
    default_m = default_4x4[..., :3, :3]
    default_t = default_4x4[..., :3, 3]

    # Prepend the identity backbone "torsion" (sin=0, cos=1).
    bb_rot = jnp.zeros_like(alpha[..., :1, :]).at[..., 1].set(1.0)
    alpha8 = jnp.concatenate([bb_rot, alpha], axis=-2)  # [..., N, 8, 2]
    sin_a, cos_a = alpha8[..., 0], alpha8[..., 1]

    # X-axis rotation from (sin, cos):
    # [[1, 0, 0], [0, c, -s], [0, s, c]]
    zeros = jnp.zeros_like(sin_a)
    ones = jnp.ones_like(sin_a)
    rot_x = jnp.stack(
        [
            ones, zeros, zeros,
            zeros, cos_a, -sin_a,
            zeros, sin_a, cos_a,
        ],
        axis=-1,
    ).reshape(sin_a.shape + (3, 3))

    # Compose: group frame = default o torsion_rotation.
    all_m, all_t = _mat_compose(default_m, default_t, rot_x, jnp.zeros_like(default_t))

    # Chain the chi frames: chi_{k} is defined relative to chi_{k-1}.
    chi1_m, chi1_t = all_m[..., 4, :, :], all_t[..., 4, :]
    chi2_m, chi2_t = _mat_compose(chi1_m, chi1_t, all_m[..., 5, :, :], all_t[..., 5, :])
    chi3_m, chi3_t = _mat_compose(chi2_m, chi2_t, all_m[..., 6, :, :], all_t[..., 6, :])
    chi4_m, chi4_t = _mat_compose(chi3_m, chi3_t, all_m[..., 7, :, :], all_t[..., 7, :])

    to_bb_m = jnp.concatenate(
        [
            all_m[..., :5, :, :],
            chi2_m[..., None, :, :],
            chi3_m[..., None, :, :],
            chi4_m[..., None, :, :],
        ],
        axis=-3,
    )
    to_bb_t = jnp.concatenate(
        [
            all_t[..., :5, :],
            chi2_t[..., None, :],
            chi3_t[..., None, :],
            chi4_t[..., None, :],
        ],
        axis=-2,
    )

    # Lift into global coordinates with the backbone frame.
    bb_m = bb_rigids.rot_mats()[..., None, :, :]
    bb_t = bb_rigids.trans[..., None, :]
    return _mat_compose(bb_m, bb_t, to_bb_m, to_bb_t)


def frames_to_atom14_pos(
    group_m: jnp.ndarray,
    group_t: jnp.ndarray,
    aatype: jnp.ndarray,
) -> jnp.ndarray:
    """Idealized atom14 positions from the 8 group frames
    (ref framedipt/protein/all_atom.py:108-144)."""
    group_idx = jnp.asarray(_ATOM14_GROUP)[aatype]  # [..., N, 14]
    group_onehot = jax.nn.one_hot(group_idx, 8, dtype=group_m.dtype)

    # Select each atom's frame: [..., N, 14, 3, 3] / [..., N, 14, 3].
    m = jnp.einsum("...ngij,...nag->...naij", group_m, group_onehot)
    t = jnp.einsum("...ngi,...nag->...nai", group_t, group_onehot)

    ideal = jnp.asarray(_ATOM14_POS)[aatype]  # [..., N, 14, 3]
    pos = jnp.einsum("...ij,...j->...i", m, ideal) + t
    mask = jnp.asarray(_ATOM14_MASK)[aatype][..., None]
    return pos * mask


def compute_backbone(
    bb_rigids: Rigid,
    psi_torsions: jnp.ndarray,
    aatype: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Backbone frames + psi -> (atom37, atom37_mask, aatype, atom14).

    Matches framedipt/protein/all_atom.py:147-176: psi fills all 7 torsion
    slots, UNK (20) maps to ALA (0) for geometry, atom37 backbone slots are
    N/CA/C/CB/O with the atom14->atom37 CB/O swap.
    """
    shape = bb_rigids.shape
    torsions = jnp.tile(psi_torsions[..., None, :], (1,) * len(shape) + (7, 1))
    if aatype is None:
        aatype = jnp.zeros(shape, jnp.int32)
    aatype = jnp.where(aatype == rc.unk_restype_index, 0, aatype).astype(jnp.int32)

    group_m, group_t = torsion_angles_to_frames(bb_rigids, torsions, aatype)
    atom14 = frames_to_atom14_pos(group_m, group_t, aatype)

    atom37 = jnp.zeros(shape + (37, 3), dtype=atom14.dtype)
    # atom14 order: N, CA, C, O, CB ; atom37 order: N, CA, C, CB, O.
    atom37 = atom37.at[..., :3, :].set(atom14[..., :3, :])
    atom37 = atom37.at[..., 3, :].set(atom14[..., 4, :])
    atom37 = atom37.at[..., 4, :].set(atom14[..., 3, :])
    atom37_mask = jnp.any(atom37 != 0, axis=-1)
    return atom37, atom37_mask, aatype, atom14


def frames_from_3_atoms(
    n_xyz: jnp.ndarray, ca_xyz: jnp.ndarray, c_xyz: jnp.ndarray
) -> Rigid:
    """Backbone frames from N/CA/C coordinates (AF2 Algorithm 21)."""
    return Rigid.from_3_points(n_xyz, ca_xyz, c_xyz)
