"""Diffusion engine tests: schedule numerics, statistical marginal checks
(asserting versions of the reference's check_forward_fn.py /
check_score_and_reverse_fns.py visual scripts), and mask invariants."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from framedipt_tpu.diffusion import igso3
from framedipt_tpu.diffusion.r3_diffuser import R3Diffuser
from framedipt_tpu.diffusion.se3_diffuser import SE3Diffuser, assemble_rigid
from framedipt_tpu.diffusion.so3_diffuser import SO3Diffuser
from framedipt_tpu.geometry.rigid import Rigid
from framedipt_tpu.tools.config import DiffuserConfig, R3Config, SO3Config

# Small grids for fast test-time LUT builds.
SMALL_SO3 = SO3Config(num_omega=200, num_sigma=100, cache_dir=None)


@pytest.fixture(scope="module")
def so3d():
    return SO3Diffuser(SMALL_SO3)


@pytest.fixture(scope="module")
def r3d():
    return R3Diffuser(R3Config())


@pytest.fixture(scope="module")
def se3d():
    return SE3Diffuser(
        DiffuserConfig(r3=R3Config(), so3=SMALL_SO3)
    )


class TestSchedules:
    def test_sigma_formula(self, so3d):
        # sigma(t) = log(t e^max + (1-t) e^min), ref so3_diffuser.py:304.
        for t in [0.0, 0.3, 1.0]:
            expected = np.log(t * np.e**1.5 + (1 - t) * np.e**0.1)
            np.testing.assert_allclose(float(so3d.sigma(t)), expected, rtol=1e-6)

    def test_sigma_monotonic_and_bounds(self, so3d):
        ts = jnp.linspace(0.0, 1.0, 50)
        sig = np.asarray(so3d.sigma(ts))
        assert np.all(np.diff(sig) > 0)
        np.testing.assert_allclose(sig[0], 0.1, rtol=1e-5)
        np.testing.assert_allclose(sig[-1], 1.5, rtol=1e-5)

    def test_r3_beta(self, r3d):
        np.testing.assert_allclose(float(r3d.b_t(0.0)), 0.1)
        np.testing.assert_allclose(float(r3d.b_t(1.0)), 20.0)
        np.testing.assert_allclose(
            float(r3d.marginal_b_t(1.0)), 0.1 + 0.5 * 19.9, rtol=1e-6
        )

    def test_t_to_idx_range(self, so3d):
        idx = np.asarray(so3d.t_to_idx(jnp.asarray([0.001, 0.5, 0.999])))
        assert idx.min() >= 0 and idx.max() < SMALL_SO3.num_sigma


class TestIGSO3Tables:
    def test_pdf_normalizes(self, so3d):
        # Marginal angle density integrates to ~1 over (0, pi].
        integral = np.asarray(so3d._pdf).sum(-1) * np.pi / SMALL_SO3.num_omega
        np.testing.assert_allclose(integral, 1.0, atol=0.02)

    def test_cdf_monotone(self, so3d):
        cdf = np.asarray(so3d._cdf)
        assert np.all(np.diff(cdf, axis=-1) >= -1e-9)

    def test_score_scaling_decreasing(self, so3d):
        # More noise -> smaller expected score magnitude.
        ss = np.asarray(so3d._score_scaling)
        assert ss[0] > ss[-1]

    def test_device_series_matches_host(self, so3d):
        # jnp on-the-fly series == f64 numpy series at f32 tolerance.
        omega = np.linspace(0.1, 3.0, 17)
        sigma = 0.8
        exp_np = igso3.expansion_np(omega, sigma)
        exp_j = np.asarray(
            igso3.expansion(jnp.asarray(omega, jnp.float32), jnp.full((17,), sigma))
        )
        np.testing.assert_allclose(exp_j, exp_np, rtol=2e-3, atol=2e-3)
        sc_np = igso3.score_np(exp_np, omega, sigma)
        sc_j = np.asarray(
            igso3.score_ratio(
                jnp.asarray(exp_np, jnp.float32),
                jnp.asarray(omega, jnp.float32),
                jnp.full((17,), sigma),
            )
        )
        np.testing.assert_allclose(sc_j, sc_np, rtol=5e-3, atol=5e-3)


class TestSO3Statistics:
    def test_sampled_angles_match_pdf(self, so3d):
        # Inverse-CDF samples reproduce the IGSO3 mean angle at t=1.
        key = jax.random.PRNGKey(0)
        angles = np.asarray(so3d.sample_igso3(key, jnp.asarray(1.0), 4000))
        omega_grid = np.asarray(so3d.discrete_omega)
        pdf = np.asarray(so3d._pdf[int(so3d.t_to_idx(jnp.asarray(1.0)))])
        expected_mean = (omega_grid * pdf).sum() / pdf.sum()
        assert abs(angles.mean() - expected_mean) < 0.05

    def test_forward_compose_matches_marginal(self, so3d):
        # Asserting version of check_forward_fn.py: iterating one-step
        # forward noising from identity approximates the closed-form
        # marginal angle distribution at t=1.
        key = jax.random.PRNGKey(1)
        n, steps = 600, 60
        rot = jnp.zeros((n, 3))
        ts = np.linspace(1.0 / steps, 1.0, steps)
        for i, t in enumerate(ts):
            key, sub = jax.random.split(key)
            rot = so3d.forward(sub, rot, jnp.asarray(t), 1.0 / steps)
        composed_angles = np.linalg.norm(np.asarray(rot), axis=-1)
        key_m = jax.random.PRNGKey(2)
        marginal = np.asarray(so3d.sample(key_m, jnp.asarray(1.0), n))
        marginal_angles = np.linalg.norm(marginal, axis=-1)
        # Means within 10% relative.
        assert abs(composed_angles.mean() - marginal_angles.mean()) < 0.1 * max(
            marginal_angles.mean(), 1e-6
        )

    def test_score_points_toward_mode(self, so3d):
        # For small noise the IGSO3 density concentrates at omega=0, so the
        # score must point back toward the identity (negative radial dir).
        vec = jnp.asarray([[0.5, 0.0, 0.0]])
        s = np.asarray(so3d.score(vec, jnp.asarray(0.05)))
        assert s[0, 0] < 0


class TestR3:
    def test_score_is_gradient_of_log_marginal(self, r3d):
        # score = grad_x log N(x; e^{-b/2} x0, (1-e^{-b}) I) in scaled coords.
        x0 = jnp.asarray([[1.0, -2.0, 0.5]])
        xt = jnp.asarray([[0.3, 0.1, -0.4]])
        t = 0.5

        def log_p(x):
            b = r3d.marginal_b_t(t)
            mu = jnp.exp(-0.5 * b) * x0
            var = 1 - jnp.exp(-b)
            return jnp.sum(-0.5 * (x - mu) ** 2 / var)

        expected = np.asarray(jax.grad(log_p)(xt))
        got = np.asarray(r3d.score(xt, x0, t, scale=False))
        np.testing.assert_allclose(got, expected, rtol=1e-4)

    def test_forward_marginal_moments(self, r3d):
        key = jax.random.PRNGKey(3)
        x0 = jnp.zeros((5000, 3))
        x_t, _ = r3d.forward_marginal(key, x0, 1.0)
        x_scaled = np.asarray(r3d.scale(x_t))
        expected_var = 1 - np.exp(-r3d.marginal_b_t(1.0))
        np.testing.assert_allclose(x_scaled.var(), expected_var, rtol=0.05)

    def test_calc_trans_0_inverts_score(self, r3d):
        key = jax.random.PRNGKey(4)
        x0 = jnp.asarray(np.random.default_rng(0).normal(size=(8, 3)) * 10)
        t = 0.7
        x_t, score = r3d.forward_marginal(key, x0, t)
        x0_rec = r3d.calc_trans_0(score, r3d.scale(x_t), t)
        np.testing.assert_allclose(
            np.asarray(r3d.unscale(x0_rec)), np.asarray(x0), rtol=1e-3, atol=1e-3
        )

    def test_reverse_with_true_score_recovers(self, r3d):
        # Asserting version of check_score_and_reverse_fns.py: run the
        # reverse SDE with the *analytic* score; endpoints should land near
        # x_0 (up to the noise floor at min_t).
        rng = np.random.default_rng(5)
        x0 = jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32) * 5)
        num_t, min_t = 100, 0.01
        ts = np.linspace(min_t, 1.0, num_t)[::-1]
        dt = 1.0 / num_t
        key = jax.random.PRNGKey(6)
        key, sub = jax.random.split(key)
        x = r3d.unscale(jax.random.normal(sub, x0.shape))
        for t in ts:
            key, sub = jax.random.split(key)
            score = r3d.score(x, x0, t, scale=True)
            x = r3d.reverse(sub, x, score, t, dt, center=False, noise_scale=1.0)
        err = np.abs(np.asarray(x) - np.asarray(x0)).mean()
        assert err < 1.0, f"reverse SDE did not recover x0, mean abs err {err}"


class TestSE3Masking:
    def test_sample_ref_keeps_fixed_region(self, se3d):
        rng = np.random.default_rng(7)
        n = 16
        impute = assemble_rigid(
            jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32) * 0.5),
            jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32) * 8),
        )
        mask = jnp.zeros((n,)).at[5:10].set(1.0)
        out = se3d.sample_ref(jax.random.PRNGKey(8), n, impute=impute, diffuse_mask=mask)
        fixed = np.asarray(mask) == 0
        np.testing.assert_allclose(
            np.asarray(out.trans)[fixed], np.asarray(impute.trans)[fixed], atol=1e-5
        )
        assert (
            np.abs(np.asarray(out.trans)[~fixed] - np.asarray(impute.trans)[~fixed]).max()
            > 0.5
        )

    def test_sample_ref_nan_safe(self, se3d):
        # NaNs inside the diffused region must not leak into the output.
        n = 8
        trans = np.zeros((n, 3), np.float32)
        trans[2:5] = np.nan
        impute = assemble_rigid(jnp.zeros((n, 3)), jnp.asarray(trans))
        mask = jnp.zeros((n,)).at[2:5].set(1.0)
        out = se3d.sample_ref(jax.random.PRNGKey(9), n, impute=impute, diffuse_mask=mask)
        assert np.isfinite(np.asarray(out.trans)).all()

    def test_forward_marginal_mask(self, se3d):
        rng = np.random.default_rng(10)
        n = 12
        rigids_0 = assemble_rigid(
            jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32) * 0.3),
            jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32) * 5),
        )
        mask = jnp.zeros((n,)).at[:6].set(1.0)
        out = se3d.forward_marginal(jax.random.PRNGKey(11), rigids_0, 0.8, diffuse_mask=mask)
        fixed = np.asarray(mask) == 0
        np.testing.assert_allclose(
            np.asarray(out.rigids_t.trans)[fixed],
            np.asarray(rigids_0.trans)[fixed],
            atol=1e-5,
        )
        np.testing.assert_allclose(np.asarray(out.rot_score)[fixed], 0.0, atol=1e-6)

    def test_reverse_mask_freezes_fixed(self, se3d):
        rng = np.random.default_rng(12)
        n = 12
        rigid_t = assemble_rigid(
            jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32) * 0.3),
            jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32) * 5),
        )
        mask = jnp.zeros((n,)).at[3:9].set(1.0)
        scores = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
        out = se3d.reverse(
            jax.random.PRNGKey(13), rigid_t, scores, scores, 0.5, 0.01,
            diffuse_mask=mask,
        )
        fixed = np.asarray(mask) == 0
        np.testing.assert_allclose(
            np.asarray(out.trans)[fixed], np.asarray(rigid_t.trans)[fixed], atol=1e-6
        )

    def test_reverse_jits_and_scans(self, se3d):
        # The entire reverse step must be traceable: scan 10 steps under jit.
        n = 8
        rigid = assemble_rigid(jnp.zeros((n, 3)), jnp.ones((n, 3)))
        mask = jnp.ones((n,))

        @jax.jit
        def run(rigid_t7, key):
            def body(carry, t):
                t7, k = carry
                k, sub = jax.random.split(k)
                r = Rigid.from_tensor7(t7)
                score = jnp.zeros((n, 3))
                r1 = se3d.reverse(sub, r, score, score, t, 0.01, diffuse_mask=mask)
                return (r1.to_tensor7(), k), ()

            ts = jnp.linspace(1.0, 0.1, 10)
            (t7, _), _ = jax.lax.scan(body, (rigid_t7, key), ts)
            return t7

        out = run(rigid.to_tensor7(), jax.random.PRNGKey(14))
        assert np.isfinite(np.asarray(out)).all()


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


class TestAutogradScore:
    def test_matches_quotient_rule(self):
        # The two formulations agree where the density is well-conditioned;
        # at large omega the quotient rule's +1e-4 denominator regularizer
        # (ref so3_diffuser.py:191) dominates the tiny expansion and the
        # curves intentionally diverge.
        omega = jnp.linspace(0.3, 2.1, 7)
        eps = jnp.full((7,), 0.7)
        exp_vals = igso3.expansion(omega, eps)
        quotient = np.asarray(igso3.score_ratio(exp_vals, omega, eps))
        autograd = np.asarray(igso3.score_autograd(omega, eps))
        np.testing.assert_allclose(autograd, quotient, rtol=2e-3)
