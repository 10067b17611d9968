"""IGSO(3) rotation diffusion as pure on-device operators.

Behavioral contract mirrors framedipt/diffusion/so3_diffuser.py (logarithmic
sigma schedule :299-306, diffusion coefficient :308-319, inverse-CDF
sampling :325-354, geodesic-random-walk reverse :569-602, score scaling
:280-285, right-multiplication composition convention :438-441) — but every
operator is a jittable jnp function with an explicit PRNG key, and the
IGSO3 lookup tables are device-resident arrays gathered inside the
computation instead of host numpy.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from framedipt_tpu.diffusion import igso3
from framedipt_tpu.geometry import so3
from framedipt_tpu.geometry.quat import safe_norm
from framedipt_tpu.tools.config import SO3Config


def gaussian_log_prob(
    mu: jnp.ndarray,
    std: jnp.ndarray,
    x: jnp.ndarray,
    diffuse_mask: jnp.ndarray | None,
) -> jnp.ndarray:
    """Summed Gaussian log-density with optional residue mask
    (ref framedipt/diffusion/r3_utils.py:10-43)."""
    var = std**2
    log_p = -0.5 * ((x - mu) ** 2 / var + jnp.log(2.0 * jnp.pi * var))
    if diffuse_mask is not None:
        log_p = log_p * diffuse_mask[..., None]
    return jnp.sum(log_p)


class SO3Diffuser:
    """Holds the (static) schedule parameters and device-resident LUTs.

    Instances are meant to be closed over by jitted functions: all array
    attributes become compile-time constants; all methods are pure.
    """

    def __init__(self, conf: SO3Config) -> None:
        self.conf = conf
        self.min_sigma = float(conf.min_sigma)
        self.max_sigma = float(conf.max_sigma)
        self.num_sigma = int(conf.num_sigma)
        self.num_omega = int(conf.num_omega)
        self.use_cached_score = bool(conf.use_cached_score)
        if conf.schedule != "logarithmic":
            raise ValueError(f"Unrecognized schedule {conf.schedule}")

        # Discretized grids (float64 on host; cast on device).
        disc_omega = np.linspace(0, np.pi, self.num_omega + 1)[1:]
        disc_sigma = self._sigma_np(np.linspace(0.0, 1.0, self.num_sigma))
        tables = igso3.build_lookup_tables(
            disc_sigma, disc_omega, cache_dir=conf.cache_dir
        )

        self.discrete_omega = jnp.asarray(disc_omega, jnp.float32)
        self.discrete_sigma = jnp.asarray(disc_sigma, jnp.float32)
        self._pdf = jnp.asarray(tables["pdf"], jnp.float32)
        self._cdf = jnp.asarray(tables["cdf"], jnp.float32)
        self._score_norms = jnp.asarray(tables["score_norms"], jnp.float32)
        self._score_scaling = jnp.asarray(tables["score_scaling"], jnp.float32)

    # -- schedule ------------------------------------------------------------

    def _sigma_np(self, t: np.ndarray) -> np.ndarray:
        return np.log(t * np.exp(self.max_sigma) + (1 - t) * np.exp(self.min_sigma))

    def sigma(self, t: jnp.ndarray) -> jnp.ndarray:
        """sigma(t) = log(t e^{max} + (1-t) e^{min}) (ref :304)."""
        return jnp.log(
            t * jnp.exp(self.max_sigma) + (1.0 - t) * jnp.exp(self.min_sigma)
        )

    def diffusion_coef(self, t: jnp.ndarray) -> jnp.ndarray:
        """g(t) = sqrt(2 (e^{max} - e^{min}) sigma(t) / e^{sigma(t)}) (ref :311)."""
        sig = self.sigma(t)
        return jnp.sqrt(
            2.0
            * (jnp.exp(self.max_sigma) - jnp.exp(self.min_sigma))
            * sig
            / jnp.exp(sig)
        )

    def t_to_idx(self, t: jnp.ndarray) -> jnp.ndarray:
        """Bucket of sigma(t) in the discrete sigma grid (np.digitize - 1)."""
        return (
            jnp.searchsorted(self.discrete_sigma, self.sigma(t), side="right") - 1
        )

    # -- sampling --------------------------------------------------------------

    def sample_igso3(self, key: jax.Array, t: jnp.ndarray, n: int) -> jnp.ndarray:
        """Inverse-CDF sample of the rotation angle; [n] angles."""
        x = jax.random.uniform(key, (n,))
        cdf_row = self._cdf[self.t_to_idx(t)]
        return jnp.interp(x, cdf_row, self.discrete_omega)

    def sample(self, key: jax.Array, t: jnp.ndarray, n: int) -> jnp.ndarray:
        """[n, 3] rotation vectors ~ IGSO3(t): uniform axis x sampled angle."""
        k_axis, k_angle = jax.random.split(key)
        axis = jax.random.normal(k_axis, (n, 3))
        axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True)
        return axis * self.sample_igso3(k_angle, t, n)[:, None]

    def sample_ref(self, key: jax.Array, n: int) -> jnp.ndarray:
        return self.sample(key, jnp.asarray(1.0), n)

    # -- score ------------------------------------------------------------------

    def score(
        self, vec: jnp.ndarray, t: jnp.ndarray, eps: float = 1e-6
    ) -> jnp.ndarray:
        """Score of the IGSO3 density as a rotation vector [..., 3].

        ``t`` may be a scalar or broadcast over leading batch dims. Default
        path evaluates the truncated series on-device (the reference default,
        so3_diffuser.py:397-402); the LUT path gathers precomputed norms.
        """
        # safe_norm: finite gradient at vec = 0 (fixed/masked residues have
        # exactly-identity rotation deltas during training).
        omega = safe_norm(vec) + eps
        sigma = self.discrete_sigma[self.t_to_idx(t)]
        # Broadcast a batched t ([B] vs omega [B, N]) over the residue dim.
        while sigma.ndim < omega.ndim:
            sigma = sigma[..., None]
        sigma = jnp.broadcast_to(sigma, omega.shape)
        if self.use_cached_score:
            # Gather the score-norm row for sigma(t), then bucket by omega
            # (torch.bucketize equivalent: searchsorted-right over the grid
            # without its last edge, ref so3_diffuser.py:389-396).
            score_norms_t = self._score_norms[self.t_to_idx(t)]  # [..., num_omega]
            omega_idx = jnp.clip(
                jnp.searchsorted(self.discrete_omega[:-1], omega, side="left"),
                0,
                self.num_omega - 1,
            )
            if score_norms_t.ndim == 1:
                omega_score = score_norms_t[omega_idx]
            else:
                omega_score = jnp.take_along_axis(
                    score_norms_t, omega_idx, axis=-1
                )
        else:
            exp_vals = igso3.expansion(omega, sigma)
            omega_score = igso3.score_ratio(exp_vals, omega, sigma)
        return omega_score[..., None] * vec / omega[..., None]

    def score_scaling(self, t: jnp.ndarray) -> jnp.ndarray:
        """sqrt(E ||score||^2 / 3) at time t (LUT gather)."""
        return self._score_scaling[self.t_to_idx(t)]

    # -- forward / reverse --------------------------------------------------------

    def forward_marginal(
        self, key: jax.Array, rot_0: jnp.ndarray, t: jnp.ndarray
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Sample rot_t ~ p(rot_t | rot_0) and its score. rot_0: [..., 3]."""
        n = int(np.prod(rot_0.shape[:-1]))
        sampled = self.sample(key, t, n)
        rot_score = self.score(sampled, t).reshape(rot_0.shape)
        rot_t = so3.compose_rotvec(
            rot_0.reshape(n, 3), sampled
        ).reshape(rot_0.shape)
        return rot_t, rot_score

    def forward(
        self,
        key: jax.Array,
        x_t_1: jnp.ndarray,
        t_1: jnp.ndarray,
        dt: float,
        diffuse_mask: jnp.ndarray | None = None,
        noise_scale: float = 1.0,
    ) -> jnp.ndarray:
        """One forward (noising) Euler step via geodesic random walk."""
        g_t = self.diffusion_coef(t_1)
        z = noise_scale * jax.random.normal(key, x_t_1.shape)
        perturb = g_t * jnp.sqrt(dt) * z
        if diffuse_mask is not None:
            perturb = perturb * diffuse_mask[..., None]
        return so3.compose_rotvec(x_t_1, perturb)

    def reverse(
        self,
        key: jax.Array,
        rot_t: jnp.ndarray,
        score_t: jnp.ndarray,
        t: jnp.ndarray,
        dt: float,
        diffuse_mask: jnp.ndarray | None = None,
        noise_scale: float = 1.0,
    ) -> jnp.ndarray:
        """One reverse step of the geodesic random walk (ref :569-602)."""
        g_t = self.diffusion_coef(t)
        z = noise_scale * jax.random.normal(key, score_t.shape)
        perturb = (g_t**2) * score_t * dt + g_t * jnp.sqrt(dt) * z
        if diffuse_mask is not None:
            perturb = perturb * diffuse_mask[..., None]
        # Right-multiply composition.
        return so3.compose_rotvec(rot_t, perturb)

    # -- log probs (EigenFold confidence) ------------------------------------------

    def distribution(
        self,
        rot_t: jnp.ndarray,
        score_t: jnp.ndarray,
        t: jnp.ndarray,
        dt: float,
        diffuse_mask: jnp.ndarray | None = None,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        g_t = self.diffusion_coef(t)
        drift = (g_t**2) * score_t * dt
        std = g_t * jnp.sqrt(dt)
        if diffuse_mask is not None:
            drift = drift * diffuse_mask[..., None]
        mu = so3.compose_rotvec(rot_t, drift)
        return mu, std

    def log_prob_forward(
        self,
        rot_t: jnp.ndarray,
        rot_t_1: jnp.ndarray,
        t_1: jnp.ndarray,
        dt: float,
        diffuse_mask: jnp.ndarray | None = None,
    ) -> jnp.ndarray:
        g_t = self.diffusion_coef(t_1)
        std = g_t * jnp.sqrt(dt)
        rot_t_new = align_rotation_vectors(rot_t, rot_t_1)
        return gaussian_log_prob(rot_t_1, std, rot_t_new, diffuse_mask)

    def log_prob_backward(
        self,
        rot_t: jnp.ndarray,
        rot_t_1: jnp.ndarray,
        score_t: jnp.ndarray,
        t: jnp.ndarray,
        dt: float,
        diffuse_mask: jnp.ndarray | None = None,
    ) -> jnp.ndarray:
        mu, std = self.distribution(rot_t, score_t, t, dt, diffuse_mask)
        rot_t_1_new = align_rotation_vectors(rot_t_1, mu)
        return gaussian_log_prob(mu, std, rot_t_1_new, diffuse_mask)


def align_rotation_vectors(inputs: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Flip rotation vectors to the hemisphere of ``targets``
    (ref so3_diffuser.py:99-119): if axis dot < 0, negate the axis and take
    the complementary angle 2 pi - |omega|."""
    in_angle = jnp.linalg.norm(inputs, axis=-1, keepdims=True)
    in_axis = inputs / jnp.maximum(in_angle, 1e-12)
    tgt_axis = targets / jnp.maximum(
        jnp.linalg.norm(targets, axis=-1, keepdims=True), 1e-12
    )
    sign = jnp.sign(jnp.sum(tgt_axis * in_axis, axis=-1, keepdims=True))
    new_axis = in_axis * sign
    new_angle = jnp.where(sign > 0, in_angle, 2.0 * jnp.pi - in_angle)
    return new_axis * new_angle
