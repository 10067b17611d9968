"""Geometry core parity tests against scipy (the reference's oracle)."""
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

import jax
import jax.numpy as jnp

from framedipt_tpu.geometry import quat, so3
from framedipt_tpu.geometry.rigid import Rigid

RNG = np.random.default_rng(0)


def random_rotvecs(n, max_angle=np.pi - 1e-3):
    v = RNG.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    angles = RNG.uniform(1e-8, max_angle, size=(n, 1))
    return (v * angles).astype(np.float32)


class TestQuat:
    def test_rotvec_quat_roundtrip(self):
        v = random_rotvecs(256)
        q = quat.from_rotvec(jnp.asarray(v))
        v2 = quat.to_rotvec(q)
        np.testing.assert_allclose(np.asarray(v2), v, atol=2e-5)

    def test_quat_matches_scipy(self):
        v = random_rotvecs(128)
        q = np.asarray(quat.from_rotvec(jnp.asarray(v)))
        q_sp = Rotation.from_rotvec(v).as_quat()  # xyzw
        q_sp = np.concatenate([q_sp[:, 3:], q_sp[:, :3]], axis=-1)  # -> wxyz
        # Quaternions are sign-ambiguous.
        sign = np.sign(np.sum(q * q_sp, axis=-1, keepdims=True))
        np.testing.assert_allclose(q, q_sp * sign, atol=2e-6)

    def test_to_rotmat_matches_scipy(self):
        v = random_rotvecs(128)
        m = np.asarray(quat.to_rotmat(quat.from_rotvec(jnp.asarray(v))))
        m_sp = Rotation.from_rotvec(v).as_matrix()
        np.testing.assert_allclose(m, m_sp, atol=5e-6)

    def test_from_rotmat_roundtrip(self):
        v = random_rotvecs(256)
        m_sp = Rotation.from_rotvec(v).as_matrix().astype(np.float32)
        q = quat.from_rotmat(jnp.asarray(m_sp))
        m2 = np.asarray(quat.to_rotmat(q))
        np.testing.assert_allclose(m2, m_sp, atol=5e-6)

    def test_from_rotmat_near_pi(self):
        # Rotations with angle near pi exercise the non-trace pivots.
        axes = np.eye(3, dtype=np.float32)
        for ax in axes:
            v = (np.pi - 1e-5) * ax
            m = Rotation.from_rotvec(v[None]).as_matrix().astype(np.float32)
            q = quat.from_rotmat(jnp.asarray(m))
            m2 = np.asarray(quat.to_rotmat(q))
            np.testing.assert_allclose(m2, m, atol=1e-5)

    def test_multiply_matches_matrix_product(self):
        v1, v2 = random_rotvecs(64), random_rotvecs(64)
        q1, q2 = quat.from_rotvec(jnp.asarray(v1)), quat.from_rotvec(jnp.asarray(v2))
        m12 = np.asarray(quat.to_rotmat(quat.multiply(q1, q2)))
        m_sp = Rotation.from_rotvec(v1).as_matrix() @ Rotation.from_rotvec(v2).as_matrix()
        np.testing.assert_allclose(m12, m_sp, atol=1e-5)


class TestSO3:
    def test_exp_matches_scipy(self):
        v = random_rotvecs(128)
        m = np.asarray(so3.exp(jnp.asarray(v)))
        np.testing.assert_allclose(m, Rotation.from_rotvec(v).as_matrix(), atol=5e-6)

    def test_log_roundtrip(self):
        v = random_rotvecs(256)
        v2 = np.asarray(so3.log(so3.exp(jnp.asarray(v))))
        np.testing.assert_allclose(v2, v, atol=5e-5)

    def test_exp_small_angle_grad_finite(self):
        g = jax.grad(lambda v: jnp.sum(so3.exp(v)))(jnp.zeros(3))
        assert np.all(np.isfinite(np.asarray(g)))

    def test_compose_rotvec_matches_reference_semantics(self):
        # Right-multiplication: compose(r1, r2) = log(exp(r1) @ exp(r2))
        # (framedipt/data/transforms.py:33-38).
        r1, r2 = random_rotvecs(64), random_rotvecs(64)
        out = np.asarray(so3.compose_rotvec(jnp.asarray(r1), jnp.asarray(r2)))
        expected = Rotation.from_matrix(
            Rotation.from_rotvec(r1).as_matrix() @ Rotation.from_rotvec(r2).as_matrix()
        ).as_rotvec()
        np.testing.assert_allclose(out, expected, atol=1e-4)


class TestRigid:
    def test_tensor7_roundtrip(self):
        v = random_rotvecs(32)
        t = RNG.normal(size=(32, 3)).astype(np.float32)
        r = Rigid(quat.from_rotvec(jnp.asarray(v)), jnp.asarray(t))
        r2 = Rigid.from_tensor7(r.to_tensor7())
        np.testing.assert_allclose(np.asarray(r2.trans), t, atol=1e-6)
        np.testing.assert_allclose(np.asarray(r2.qs), np.asarray(r.qs), atol=1e-6)

    def test_apply_invert_apply(self):
        v = random_rotvecs(32)
        t = RNG.normal(size=(32, 3)).astype(np.float32)
        pts = RNG.normal(size=(32, 3)).astype(np.float32)
        r = Rigid(quat.from_rotvec(jnp.asarray(v)), jnp.asarray(t))
        out = r.invert_apply(r.apply(jnp.asarray(pts)))
        np.testing.assert_allclose(np.asarray(out), pts, atol=1e-4)

    def test_compose_vs_matrix(self):
        v1, v2 = random_rotvecs(16), random_rotvecs(16)
        t1 = RNG.normal(size=(16, 3)).astype(np.float32)
        t2 = RNG.normal(size=(16, 3)).astype(np.float32)
        ra = Rigid(quat.from_rotvec(jnp.asarray(v1)), jnp.asarray(t1))
        rb = Rigid(quat.from_rotvec(jnp.asarray(v2)), jnp.asarray(t2))
        rc = ra.compose(rb)
        pts = RNG.normal(size=(16, 3)).astype(np.float32)
        out = np.asarray(rc.apply(jnp.asarray(pts)))
        expected = np.asarray(ra.apply(rb.apply(jnp.asarray(pts))))
        np.testing.assert_allclose(out, expected, atol=1e-4)

    def test_from_3_points_orthonormal(self):
        n = RNG.normal(size=(64, 3)).astype(np.float32)
        ca = n + RNG.normal(size=(64, 3)).astype(np.float32)
        c = ca + RNG.normal(size=(64, 3)).astype(np.float32)
        r = Rigid.from_3_points(jnp.asarray(n), jnp.asarray(ca), jnp.asarray(c))
        m = np.asarray(r.rot_mats())
        ident = np.einsum("...ij,...kj->...ik", m, m)
        np.testing.assert_allclose(ident, np.broadcast_to(np.eye(3), ident.shape), atol=1e-4)
        np.testing.assert_allclose(np.linalg.det(m), 1.0, atol=1e-4)
        np.testing.assert_allclose(np.asarray(r.trans), ca, atol=1e-6)
        # e0 (first column) must align with CA - N.
        e0 = (ca - n) / np.linalg.norm(ca - n, axis=-1, keepdims=True)
        np.testing.assert_allclose(m[..., :, 0], e0, atol=1e-4)

    def test_compose_q_update_vec_mask(self):
        v = random_rotvecs(8)
        t = RNG.normal(size=(8, 3)).astype(np.float32)
        r = Rigid(quat.from_rotvec(jnp.asarray(v)), jnp.asarray(t))
        update = jnp.asarray(RNG.normal(size=(8, 6)).astype(np.float32))
        mask = jnp.zeros((8, 1)).at[:4].set(1.0)
        r2 = r.compose_q_update_vec(update, update_mask=mask)
        # Masked-out frames are exactly unchanged (up to quat normalization).
        np.testing.assert_allclose(np.asarray(r2.trans[4:]), t[4:], atol=0)
        np.testing.assert_allclose(
            np.asarray(r2.qs[4:]), np.asarray(quat.normalize(r.qs[4:])), atol=1e-6
        )
        # Unmasked frames move.
        assert np.abs(np.asarray(r2.trans[:4]) - t[:4]).max() > 1e-3

    def test_update_matches_quaternion_formula(self):
        # compose_q_update_vec composes with quaternion (1, bx, by, bz).
        v = random_rotvecs(16)
        r = Rigid(quat.from_rotvec(jnp.asarray(v)), jnp.zeros((16, 3)))
        b = RNG.normal(size=(16, 3)).astype(np.float32) * 0.2
        r2 = r.compose_q_update_vec(jnp.asarray(np.concatenate([b, np.zeros_like(b)], -1)))
        q_update = np.concatenate([np.ones((16, 1), np.float32), b], axis=-1)
        expected = np.asarray(
            quat.normalize(quat.multiply(r.qs, jnp.asarray(q_update)))
        )
        got = np.asarray(r2.qs)
        sign = np.sign(np.sum(got * expected, axis=-1, keepdims=True))
        np.testing.assert_allclose(got, expected * sign, atol=1e-5)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
