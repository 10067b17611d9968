"""IGSO(3) density math: truncated power series, score, lookup-table builder.

Implements the isotropic Gaussian on SO(3) of Leach et al. 2022 ("Denoising
diffusion probabilistic models on SO(3)"), with the sqrt(2) scale
reparameterization used by FrameDiff/FrameDiPT so that IGSO3(eps) agrees with
Brownian motion at t = eps^2 (ref framedipt/diffusion/so3_diffuser.py:18-96).

Two faces:
- ``*_np`` host functions run in float64 numpy to build the lookup tables
  once (cached on disk), matching the reference's precompute numerics.
- ``expansion``/``score_ratio`` device functions run the same truncated
  series in jnp for the on-the-fly score path (the reference default,
  use_cached_score=False, so3_diffuser.py:397-402).
"""
from __future__ import annotations

import hashlib
import os
import pathlib

import jax
import jax.numpy as jnp
import numpy as np

TRUNCATION_LEVEL = 1000


# --------------------------------------------------------------------------
# Device-side (jnp) series — used inside the jitted sampler/train step.
# --------------------------------------------------------------------------


def expansion(
    omega: jnp.ndarray, eps: jnp.ndarray, truncation: int = TRUNCATION_LEVEL
) -> jnp.ndarray:
    """Truncated IGSO(3) characteristic series f(omega; eps).

    omega, eps broadcast against each other over leading dims; the series
    dimension is reduced on-device (a [.., L] elementwise reduce on the VPU).
    """
    levels = jnp.arange(truncation, dtype=omega.dtype)
    o = omega[..., None]
    e = eps[..., None]
    p = (
        (2.0 * levels + 1.0)
        * jnp.exp(-levels * (levels + 1.0) * e**2 / 2.0)
        * jnp.sin(o * (levels + 0.5))
        / jnp.sin(o / 2.0)
    )
    return jnp.sum(p, axis=-1)


def score_ratio(
    exp_vals: jnp.ndarray,
    omega: jnp.ndarray,
    eps: jnp.ndarray,
    truncation: int = TRUNCATION_LEVEL,
) -> jnp.ndarray:
    """d/d omega log f(omega; eps), computed by the quotient rule with the
    reference's +1e-4 regularizer in the denominator
    (so3_diffuser.py:184-191)."""
    levels = jnp.arange(truncation, dtype=omega.dtype)
    o = omega[..., None]
    e = eps[..., None]
    hi = jnp.sin(o * (levels + 0.5))
    dhi = (levels + 0.5) * jnp.cos(o * (levels + 0.5))
    lo = jnp.sin(o / 2.0)
    dlo = 0.5 * jnp.cos(o / 2.0)
    dsigma = (
        (2.0 * levels + 1.0)
        * jnp.exp(-levels * (levels + 1.0) * e**2 / 2.0)
        * (lo * dhi - hi * dlo)
        / lo**2
    )
    dsigma = jnp.sum(dsigma, axis=-1)
    return dsigma / (exp_vals + 1e-4)


def score_autograd(
    omega: jnp.ndarray, eps: jnp.ndarray, truncation: int = TRUNCATION_LEVEL
) -> jnp.ndarray:
    """d/d omega log f(omega; eps) by automatic differentiation.

    The reference carries a second, DiffDock-lineage IGSO3 implementation
    whose score is autograd of the log-density (framedipt/diffusion/
    igso3.py:51). Here that is one jax.grad over the same series —
    numerically interchangeable with the quotient-rule ``score_ratio`` (the
    regularizers differ by the +1e-4 denominator term)."""

    def log_f(o, e):
        return jnp.log(expansion(o, e, truncation) + 1e-12)

    grad_fn = jax.grad(log_f, argnums=0)
    flat_o = omega.reshape(-1)
    flat_e = jnp.broadcast_to(eps, omega.shape).reshape(-1)
    out = jax.vmap(grad_fn)(flat_o, flat_e)
    return out.reshape(omega.shape)


# --------------------------------------------------------------------------
# Host-side (numpy float64) lookup table builder.
# --------------------------------------------------------------------------


def expansion_np(
    omega: np.ndarray, eps: float, truncation: int = TRUNCATION_LEVEL
) -> np.ndarray:
    levels = np.arange(truncation, dtype=np.float64)
    o = np.asarray(omega, np.float64)[..., None]
    p = (
        (2.0 * levels + 1.0)
        * np.exp(-levels * (levels + 1.0) * eps**2 / 2.0)
        * np.sin(o * (levels + 0.5))
        / np.sin(o / 2.0)
    )
    return p.sum(axis=-1)


def score_np(
    exp_vals: np.ndarray,
    omega: np.ndarray,
    eps: float,
    truncation: int = TRUNCATION_LEVEL,
) -> np.ndarray:
    levels = np.arange(truncation, dtype=np.float64)
    o = np.asarray(omega, np.float64)[..., None]
    hi = np.sin(o * (levels + 0.5))
    dhi = (levels + 0.5) * np.cos(o * (levels + 0.5))
    lo = np.sin(o / 2.0)
    dlo = 0.5 * np.cos(o / 2.0)
    dsigma = (
        (2.0 * levels + 1.0)
        * np.exp(-levels * (levels + 1.0) * eps**2 / 2.0)
        * (lo * dhi - hi * dlo)
        / lo**2
    ).sum(axis=-1)
    return dsigma / (exp_vals + 1e-4)


def marginal_density_np(exp_vals: np.ndarray, omega: np.ndarray) -> np.ndarray:
    """Marginal density of the rotation angle over [0, pi]
    (ref so3_diffuser.py:80-96, marginal=True branch)."""
    return exp_vals * (1.0 - np.cos(omega)) / np.pi


def build_lookup_tables(
    discrete_sigma: np.ndarray,
    discrete_omega: np.ndarray,
    cache_dir: str | None = ".cache/",
) -> dict[str, np.ndarray]:
    """Build (or load from cache) the IGSO3 pdf/cdf/score-norm tables.

    Shapes: [num_sigma, num_omega], float64 on disk; callers cast to f32 for
    device residency. Matches the reference cache layout semantics
    (so3_diffuser.py:221-278) keyed by the discretization; the cache key here
    is a hash of the grids, so any schedule change invalidates cleanly.
    """
    num_omega = len(discrete_omega)
    cache_path = None
    if cache_dir is not None:
        h = hashlib.sha256()
        h.update(np.ascontiguousarray(discrete_sigma).tobytes())
        h.update(np.ascontiguousarray(discrete_omega).tobytes())
        fname = f"igso3_{h.hexdigest()[:16]}.npz"
        cache_path = pathlib.Path(cache_dir) / fname
        # Also honor a repo-shipped prebuilt table (the default 1000x1000
        # grid takes ~1 min to build; shipping it keeps cold starts fast).
        prebuilt = (
            pathlib.Path(__file__).resolve().parent.parent.parent
            / ".igso3_cache"
            / fname
        )
        for candidate in (cache_path, prebuilt):
            if candidate.exists():
                with np.load(candidate) as z:
                    return {
                        k: z[k]
                        for k in ("pdf", "cdf", "score_norms", "score_scaling")
                    }

    exp_vals = np.stack(
        [expansion_np(discrete_omega, s) for s in discrete_sigma]
    )  # [S, O]
    pdf = marginal_density_np(exp_vals, discrete_omega)
    cdf = pdf.cumsum(axis=-1) / num_omega * np.pi
    score_norms = np.stack(
        [
            score_np(exp_vals[i], discrete_omega, s)
            for i, s in enumerate(discrete_sigma)
        ]
    )
    # E[||score||^2]^0.5 / sqrt(3) per sigma (ref so3_diffuser.py:280-285).
    score_scaling = np.sqrt(
        np.abs((score_norms**2 * pdf).sum(-1) / pdf.sum(-1))
    ) / np.sqrt(3.0)

    tables = {
        "pdf": pdf,
        "cdf": cdf,
        "score_norms": score_norms,
        "score_scaling": score_scaling,
    }
    if cache_path is not None:
        os.makedirs(cache_path.parent, exist_ok=True)
        tmp = cache_path.with_suffix(f".tmp{os.getpid()}.npz")
        np.savez_compressed(tmp, **tables)
        os.replace(tmp, cache_path)  # atomic: safe across concurrent builders
    return tables
