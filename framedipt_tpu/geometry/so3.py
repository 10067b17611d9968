"""SO(3) Lie-algebra maps as pure jnp functions.

Replaces the reference's scipy.spatial.transform.Rotation round-trips
(framedipt/data/transforms.py:33-50, framedipt/diffusion/so3_utils.py) with
on-device, small-angle-safe exp/log maps so that the entire diffusion reverse
step stays inside one XLA computation.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from framedipt_tpu.geometry import quat


def hat(v: jnp.ndarray) -> jnp.ndarray:
    """Rotation vector [..., 3] -> skew-symmetric matrix [..., 3, 3]."""
    x, y, z = jnp.moveaxis(v, -1, 0)
    zero = jnp.zeros_like(x)
    m = jnp.stack(
        [zero, -z, y, z, zero, -x, -y, x, zero],
        axis=-1,
    )
    return m.reshape(v.shape[:-1] + (3, 3))


def vee(m: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix [..., 3, 3] -> rotation vector [..., 3]."""
    return jnp.stack([m[..., 2, 1], m[..., 0, 2], m[..., 1, 0]], axis=-1)


def omega(mat: jnp.ndarray, eps: float = 1e-4) -> jnp.ndarray:
    """Angle of rotation of a rotation matrix.

    The trace is damped by (1 - eps) before acos to avoid the gradient
    singularity at omega = 0/pi (ref: framedipt/diffusion/so3_utils.py:114).
    """
    tr = jnp.trace(mat, axis1=-2, axis2=-1)
    cos = (tr * (1.0 - eps) - 1.0) / 2.0
    return jnp.arccos(jnp.clip(cos, -1.0, 1.0))


def exp(v: jnp.ndarray) -> jnp.ndarray:
    """Exponential map: rotation vector [..., 3] -> rotation matrix.

    Rodrigues' formula with Taylor fallbacks for sin(a)/a and
    (1-cos(a))/a^2 below 1e-3 so gradients are finite at the identity.
    """
    a2 = jnp.sum(v * v, axis=-1, keepdims=True)[..., None]  # [..., 1, 1]
    small = a2 < 1e-6
    # Double-where: the unsafe branch never sees a2 ~ 0, so its gradient
    # stays finite at the identity.
    safe_a2 = jnp.where(small, jnp.ones_like(a2), a2)
    safe_a = jnp.sqrt(safe_a2)
    sin_a_over_a = jnp.where(small, 1.0 - a2 / 6.0, jnp.sin(safe_a) / safe_a)
    one_minus_cos_over_a2 = jnp.where(
        small, 0.5 - a2 / 24.0, (1.0 - jnp.cos(safe_a)) / safe_a2
    )
    k = hat(v)
    # 3x3 matmul is precision-critical and tiny: force full f32 accumulation
    # (TPU f32 matmuls otherwise round operands to bf16).
    k2 = jnp.matmul(k, k, precision=jax.lax.Precision.HIGHEST)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=v.dtype), k.shape)
    return eye + sin_a_over_a * k + one_minus_cos_over_a2 * k2


def log(mat: jnp.ndarray) -> jnp.ndarray:
    """Logarithm map: rotation matrix [..., 3, 3] -> rotation vector.

    Implemented via the quaternion path (matrix -> quat -> rotvec), which is
    stable at both omega ~ 0 and omega ~ pi — the same route scipy's
    Rotation.as_rotvec takes, and the oracle the reference leans on.
    """
    return quat.to_rotvec(quat.from_rotmat(mat))


def rotvec_to_matrix(v: jnp.ndarray) -> jnp.ndarray:
    """Alias for exp() (scipy.Rotation.from_rotvec().as_matrix() equivalent)."""
    return exp(v)


def matrix_to_rotvec(m: jnp.ndarray) -> jnp.ndarray:
    """Alias for log() (scipy.Rotation.from_matrix().as_rotvec() equivalent)."""
    return log(m)


def compose_rotvec(r1: jnp.ndarray, r2: jnp.ndarray) -> jnp.ndarray:
    """Compose rotation vectors: result = log(exp(r1) @ exp(r2)).

    Right-multiplication convention, matching
    framedipt/data/transforms.py:33-38 (used for IGSO3 geodesic random walk).
    Composition happens in quaternion space (8 mults vs 27 for matmul) —
    cheaper on the VPU and exactly equivalent.
    """
    q1 = quat.from_rotvec(r1)
    q2 = quat.from_rotvec(r2)
    return quat.to_rotvec(quat.multiply(q1, q2))
