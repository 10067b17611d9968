"""VP-SDE translation diffusion as pure on-device operators.

Behavioral contract mirrors framedipt/diffusion/r3_diffuser.py: linear
beta(t) = min_b + t (max_b - min_b) (:48-62), coordinate scaling (:26-46),
closed-form marginal (:262-292), Euler-Maruyama reverse with the reference's
center-of-mass convention (:344-385 — the COM sums *all* residues but divides
by the diffused count), NaN-safe stationary sampling (:294-331), and score /
score-scaling formulas (:333-342, :410-441). All ops are jnp with explicit
keys; ``t`` may be scalar or batched.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from framedipt_tpu.diffusion.so3_diffuser import gaussian_log_prob
from framedipt_tpu.tools.config import R3Config


def _expand(t: jnp.ndarray, ref: jnp.ndarray) -> jnp.ndarray:
    """Right-pad t's shape with singleton dims to broadcast against ref."""
    t = jnp.asarray(t)
    while t.ndim < ref.ndim:
        t = t[..., None]
    return t


class R3Diffuser:
    def __init__(self, conf: R3Config) -> None:
        self.conf = conf
        self.min_b = float(conf.min_b)
        self.max_b = float(conf.max_b)
        self.coordinate_scaling = float(conf.coordinate_scaling)

    # -- scaling ---------------------------------------------------------------

    def scale(self, x: jnp.ndarray) -> jnp.ndarray:
        return x * self.coordinate_scaling

    def unscale(self, x: jnp.ndarray) -> jnp.ndarray:
        return x / self.coordinate_scaling

    # -- schedule ---------------------------------------------------------------

    def b_t(self, t: jnp.ndarray) -> jnp.ndarray:
        return self.min_b + t * (self.max_b - self.min_b)

    def diffusion_coef(self, t: jnp.ndarray) -> jnp.ndarray:
        return jnp.sqrt(self.b_t(t))

    def drift_coef(self, x: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        return -0.5 * self.b_t(t) * x

    def marginal_b_t(self, t: jnp.ndarray) -> jnp.ndarray:
        return t * self.min_b + 0.5 * t**2 * (self.max_b - self.min_b)

    def conditional_var(self, t: jnp.ndarray) -> jnp.ndarray:
        """Var[x_t | x_0] = 1 - exp(-marginal_b_t)."""
        return 1.0 - jnp.exp(-self.marginal_b_t(t))

    def score_scaling(self, t: jnp.ndarray) -> jnp.ndarray:
        return 1.0 / jnp.sqrt(self.conditional_var(t))

    # -- score ------------------------------------------------------------------

    def score(
        self,
        x_t: jnp.ndarray,
        x_0: jnp.ndarray,
        t: jnp.ndarray,
        scale: bool = False,
    ) -> jnp.ndarray:
        if scale:
            x_t, x_0 = self.scale(x_t), self.scale(x_0)
        tb = _expand(t, x_t)
        return -(x_t - jnp.exp(-0.5 * self.marginal_b_t(tb)) * x_0) / (
            self.conditional_var(tb)
        )

    def calc_trans_0(
        self, score_t: jnp.ndarray, x_t: jnp.ndarray, t: jnp.ndarray
    ) -> jnp.ndarray:
        """Recover x_0 from x_t and the score (ref :98-120)."""
        tb = _expand(t, x_t)
        beta_t = self.marginal_b_t(tb)
        cond_var = 1.0 - jnp.exp(-beta_t)
        return (score_t * cond_var + x_t) / jnp.exp(-0.5 * beta_t)

    # -- forward ------------------------------------------------------------------

    def forward_marginal(
        self,
        key: jax.Array,
        x_0: jnp.ndarray,
        t: jnp.ndarray,
        diffuse_mask: jnp.ndarray | None = None,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Sample x_t ~ p(x_t | x_0) in closed form; returns (x_t, score_t).

        x_0 in Angstroms; score is in scaled coordinates (ref :262-292).
        """
        x_0_scaled = self.scale(x_0)
        tb = _expand(t, x_0)
        loc = jnp.exp(-0.5 * self.marginal_b_t(tb)) * x_0_scaled
        std = jnp.sqrt(1.0 - jnp.exp(-self.marginal_b_t(tb)))
        x_t_scaled = loc + std * jax.random.normal(key, x_0.shape)
        score_t = self.score(x_t_scaled, x_0_scaled, t, scale=False)
        x_t = self.unscale(x_t_scaled)
        if diffuse_mask is not None:
            m = diffuse_mask[..., None]
            x_t = m * x_t + (1.0 - m) * x_0
            score_t = m * score_t
        return x_t, score_t

    def forward(
        self,
        key: jax.Array,
        x_t_1: jnp.ndarray,
        t_1: jnp.ndarray,
        dt: float,
        diffuse_mask: jnp.ndarray | None = None,
        center: bool = True,
        noise_scale: float = 1.0,
    ) -> jnp.ndarray:
        """One forward Euler-Maruyama noising step (ref :122-161)."""
        x = self.scale(x_t_1)
        g_t = self.diffusion_coef(t_1)
        f_t = self.drift_coef(x, t_1)
        z = noise_scale * jax.random.normal(key, x.shape)
        perturb = f_t * dt + g_t * jnp.sqrt(dt) * z
        if diffuse_mask is not None:
            perturb = perturb * diffuse_mask[..., None]
            mask = diffuse_mask
        else:
            mask = jnp.ones(x.shape[:-1], x.dtype)
        x_t = x + perturb
        if center:
            com = jnp.sum(x_t, axis=-2) / jnp.sum(mask, axis=-1)[..., None]
            x_t = x_t - com[..., None, :]
        return self.unscale(x_t)

    def sample_stationary(
        self,
        key: jax.Array,
        x_reference: jnp.ndarray,
        diffuse_mask: jnp.ndarray | None,
    ) -> jnp.ndarray:
        """Sample p(x_T) = N(0, I) in the diffused region, keeping the fixed
        region from x_reference. NaN-safe: fixed values are selected with
        ``where`` so NaNs in the (unknown) diffused region never propagate
        (ref :294-331)."""
        if diffuse_mask is None:
            mask = jnp.ones(x_reference.shape[:-1], bool)
        else:
            mask = diffuse_mask.astype(bool)
        noise = jax.random.normal(key, x_reference.shape)
        x_ref_scaled = self.scale(x_reference)
        out_scaled = jnp.where(mask[..., None], noise, x_ref_scaled)
        return self.unscale(out_scaled)

    # -- reverse -----------------------------------------------------------------

    def distribution(
        self,
        x_t: jnp.ndarray,
        score_t: jnp.ndarray,
        t: jnp.ndarray,
        dt: float,
        diffuse_mask: jnp.ndarray | None = None,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        x = self.scale(x_t)
        g_t = self.diffusion_coef(t)
        f_t = self.drift_coef(x, t)
        std = g_t * jnp.sqrt(dt)
        mu = x - (f_t - g_t**2 * score_t) * dt
        if diffuse_mask is not None:
            mu = mu * diffuse_mask[..., None]
        return mu, std

    def reverse(
        self,
        key: jax.Array,
        x_t: jnp.ndarray,
        score_t: jnp.ndarray,
        t: jnp.ndarray,
        dt: float,
        diffuse_mask: jnp.ndarray | None = None,
        center: bool = True,
        noise_scale: float = 1.0,
    ) -> jnp.ndarray:
        """One reverse Euler-Maruyama step (ref :344-385).

        Note the reference's centering convention: COM is the sum over *all*
        residues divided by the number of *diffused* residues; the SE(3)
        wrapper then restores fixed residues via the mask.
        """
        x = self.scale(x_t)
        g_t = self.diffusion_coef(t)
        f_t = self.drift_coef(x, t)
        z = noise_scale * jax.random.normal(key, score_t.shape)
        perturb = (f_t - g_t**2 * score_t) * dt + g_t * jnp.sqrt(dt) * z
        if diffuse_mask is not None:
            perturb = perturb * diffuse_mask[..., None]
            mask = diffuse_mask
        else:
            mask = jnp.ones(x.shape[:-1], x.dtype)
        x_t_1 = x - perturb
        if center:
            com = jnp.sum(x_t_1, axis=-2) / jnp.sum(mask, axis=-1)[..., None]
            x_t_1 = x_t_1 - com[..., None, :]
        return self.unscale(x_t_1)

    # -- log probs ------------------------------------------------------------------

    def log_prob_forward(
        self,
        x_t: jnp.ndarray,
        x_t_1: jnp.ndarray,
        t_1: jnp.ndarray,
        dt: float,
        diffuse_mask: jnp.ndarray | None,
    ) -> jnp.ndarray:
        x_prev = self.scale(x_t_1)
        g_t = self.diffusion_coef(t_1)
        f_t = self.drift_coef(x_prev, t_1)
        std = g_t * jnp.sqrt(dt)
        mu = x_prev + f_t * dt
        if diffuse_mask is not None:
            mu = mu * diffuse_mask[..., None]
        return gaussian_log_prob(mu, std, self.scale(x_t), diffuse_mask)

    def log_prob_backward(
        self,
        x_t: jnp.ndarray,
        x_t_1: jnp.ndarray,
        score_t: jnp.ndarray,
        t: jnp.ndarray,
        dt: float,
        diffuse_mask: jnp.ndarray | None,
    ) -> jnp.ndarray:
        mu, std = self.distribution(x_t, score_t, t, dt, diffuse_mask)
        return gaussian_log_prob(mu, std, self.scale(x_t_1), diffuse_mask)
