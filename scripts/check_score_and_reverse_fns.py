"""Numerical verification: reverse SDE with analytic scores recovers the
clean structure (role of experiments/check_score_and_reverse_fns.py:83-137 —
synthetic multi-chain "lines" inpainting check). Prints recovery errors and
exits nonzero on failure.

Run: python scripts/check_score_and_reverse_fns.py
"""
from __future__ import annotations

import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from framedipt_tpu.diffusion import SE3Diffuser  # noqa: E402
from framedipt_tpu.diffusion.se3_diffuser import assemble_rigid  # noqa: E402
from framedipt_tpu.geometry.rigid import Rigid  # noqa: E402
from framedipt_tpu.tools.config import DiffuserConfig  # noqa: E402


def main() -> int:
    # Two synthetic chains of CA "lines", middle region diffused.
    n_per_chain, num_t, min_t = 32, 100, 0.01
    xs = np.arange(n_per_chain) * 3.8
    chain1 = np.stack([xs, np.zeros_like(xs), np.zeros_like(xs)], -1)
    chain2 = np.stack([xs, np.full_like(xs, 10.0), np.zeros_like(xs)], -1)
    trans0 = np.concatenate([chain1, chain2]).astype(np.float32)
    trans0 -= trans0.mean(0)
    n = len(trans0)
    rot0 = np.zeros((n, 3), np.float32)
    mask = np.zeros(n, np.float32)
    mask[10:22] = 1.0
    mask[n_per_chain + 10 : n_per_chain + 22] = 1.0

    d = SE3Diffuser(DiffuserConfig())
    rigids0 = assemble_rigid(jnp.asarray(rot0), jnp.asarray(trans0))
    key = jax.random.PRNGKey(0)
    key, sub = jax.random.split(key)
    rigids = d.sample_ref(sub, n, impute=rigids0, diffuse_mask=jnp.asarray(mask))

    ts = np.linspace(min_t, 1.0, num_t)[::-1]
    dt = 1.0 / num_t
    for t in ts:
        key, sub = jax.random.split(key)
        trans_score = d.calc_trans_score(rigids.trans, jnp.asarray(trans0), float(t))
        rot_score = d.calc_rot_score(rigids.qs, rigids0.qs, jnp.asarray(float(t)))
        rigids = d.reverse(
            sub, rigids, rot_score, trans_score, float(t), dt,
            diffuse_mask=jnp.asarray(mask), center=False, noise_scale=0.1,
        )

    err = np.abs(np.asarray(rigids.trans) - trans0)
    err_diffused = err[mask.astype(bool)].mean()
    err_fixed = err[~mask.astype(bool)].max()
    print(f"diffused-region mean abs error: {err_diffused:.3f} A")
    print(f"fixed-region max abs error:     {err_fixed:.2e} A")
    ok = err_diffused < 1.0 and err_fixed < 1e-4
    print("MATCH" if ok else "MISMATCH")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
