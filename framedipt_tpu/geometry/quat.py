"""Quaternion algebra as pure jnp functions.

Quaternions are stored ``(w, x, y, z)`` with the scalar part first, matching
the tensor_7 rigid-frame layout of the reference
(openfold/utils/rigid_utils.py:185-286). Everything here is branchless and
static-shape so it traces cleanly under ``jit``/``scan``/``vmap``.
"""
from __future__ import annotations

import jax.numpy as jnp


def safe_norm(
    x: jnp.ndarray, axis: int = -1, keepdims: bool = False, eps: float = 1e-20
) -> jnp.ndarray:
    """L2 norm with finite gradient at x = 0 (sqrt(sum + eps)).

    jnp.linalg.norm has a NaN gradient at exactly zero; masked regions of the
    score network hit zero vectors constantly, so every norm on a gradient
    path must go through this."""
    return jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=keepdims) + eps)


def normalize(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Normalize quaternions to unit length along the last axis."""
    return q / jnp.maximum(safe_norm(q, keepdims=True), eps)


def multiply(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product q1 * q2 (applies q2's rotation first under the
    row-vector convention used throughout; matches
    openfold/utils/rigid_utils.py:254 `quat_multiply`)."""
    w1, x1, y1, z1 = jnp.moveaxis(q1, -1, 0)
    w2, x2, y2, z2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def multiply_by_vec(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Multiply quaternion ``q`` by the pure-update quaternion ``(0, v)``.

    This is the update primitive of the structure module's backbone update:
    the full update quaternion is ``(1, v)`` and the composed quaternion is
    ``q + q*(0,v)`` (openfold/utils/rigid_utils.py:587-607).
    """
    zero = jnp.zeros_like(v[..., :1])
    return multiply(q, jnp.concatenate([zero, v], axis=-1))


def invert(q: jnp.ndarray) -> jnp.ndarray:
    """Conjugate of a unit quaternion (its inverse)."""
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion -> 3x3 rotation matrix. [..., 4] -> [..., 3, 3]."""
    q = normalize(q)
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def from_rotmat(m: jnp.ndarray) -> jnp.ndarray:
    """3x3 rotation matrix -> unit quaternion (w, x, y, z), branchless.

    Uses the four-candidate construction: each candidate is exact when its
    pivot (1 + m00 +/- m11 +/- m22) is the largest; we compute all four and
    select with ``where`` so the op stays vectorized on the VPU.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    tr = m00 + m11 + m22
    # Candidate pivots (all >= 0 up to rounding; clamp before sqrt).
    pw = 1.0 + tr
    px = 1.0 + m00 - m11 - m22
    py = 1.0 - m00 + m11 - m22
    pz = 1.0 - m00 - m11 + m22

    sw = jnp.sqrt(jnp.maximum(pw, 1e-12)) * 2.0
    qw = jnp.stack(
        [0.25 * sw, (m21 - m12) / sw, (m02 - m20) / sw, (m10 - m01) / sw], axis=-1
    )
    sx = jnp.sqrt(jnp.maximum(px, 1e-12)) * 2.0
    qx = jnp.stack(
        [(m21 - m12) / sx, 0.25 * sx, (m01 + m10) / sx, (m02 + m20) / sx], axis=-1
    )
    sy = jnp.sqrt(jnp.maximum(py, 1e-12)) * 2.0
    qy = jnp.stack(
        [(m02 - m20) / sy, (m01 + m10) / sy, 0.25 * sy, (m12 + m21) / sy], axis=-1
    )
    sz = jnp.sqrt(jnp.maximum(pz, 1e-12)) * 2.0
    qz = jnp.stack(
        [(m10 - m01) / sz, (m02 + m20) / sz, (m12 + m21) / sz, 0.25 * sz], axis=-1
    )

    pivots = jnp.stack([pw, px, py, pz], axis=-1)
    best = jnp.argmax(pivots, axis=-1)[..., None]
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # [..., 4cand, 4]
    q = jnp.take_along_axis(cands, best[..., None], axis=-2)[..., 0, :]
    return normalize(q)


def to_rotvec(q: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Unit quaternion -> axis-angle rotation vector, small-angle safe.

    Matches the reference numerics exactly (framedipt/data/transforms.py:53-69):
    sign-flip so w >= 0 (angle in [0, pi]), then scale = angle/sin(angle/2)
    with the Taylor series ``2 + a^2/12 + 7 a^4/2880`` below 1e-3.
    """
    flip = (q[..., :1] < 0).astype(q.dtype)
    q = -q * flip + (1.0 - flip) * q
    angle = 2.0 * jnp.arctan2(safe_norm(q[..., 1:]), q[..., 0])
    angle2 = angle * angle
    small_scale = 2.0 + angle2 / 12.0 + 7.0 * angle2 * angle2 / 2880.0
    large_scale = angle / jnp.sin(angle / 2.0 + eps)
    small = (angle <= 1e-3).astype(q.dtype)
    scale = small * small_scale + (1.0 - small) * large_scale
    return scale[..., None] * q[..., 1:]


def from_rotvec(v: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle rotation vector -> unit quaternion, small-angle safe."""
    angle = safe_norm(v, keepdims=True)
    half = 0.5 * angle
    # sin(half)/angle with a series for tiny angles: 1/2 - angle^2/48.
    sin_half_over_angle = jnp.where(
        angle < 1e-3,
        0.5 - angle * angle / 48.0,
        jnp.sin(half) / jnp.maximum(angle, 1e-20),
    )
    w = jnp.cos(half)
    xyz = v * sin_half_over_angle
    return jnp.concatenate([w, xyz], axis=-1)
