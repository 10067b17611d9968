"""Numerical verification: iterated one-step forward noising vs the
closed-form marginal (role of experiments/check_forward_fn.py:12-202 —
there a visual histogram check; here it prints summary statistics and exits
nonzero on mismatch; the asserting version lives in
tests/unit/test_diffusion.py::test_forward_compose_matches_marginal).

Run: python scripts/check_forward_fn.py [num_samples] [num_steps]
"""
from __future__ import annotations

import sys

import numpy as np

import jax

sys.path.insert(0, ".")

from framedipt_tpu.diffusion import SE3Diffuser  # noqa: E402
from framedipt_tpu.diffusion.se3_diffuser import assemble_rigid  # noqa: E402
from framedipt_tpu.tools.config import DiffuserConfig  # noqa: E402


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    d = SE3Diffuser(DiffuserConfig())
    key = jax.random.PRNGKey(0)

    rigids = assemble_rigid(
        jax.numpy.zeros((n, 3)), jax.numpy.zeros((n, 3))
    )
    ts = np.linspace(1.0 / steps, 1.0, steps)
    for t in ts:
        key, sub = jax.random.split(key)
        rigids = d.forward(sub, rigids, float(t), 1.0 / steps)

    from framedipt_tpu.geometry import quat as quat_ops

    composed_rotvec = np.asarray(quat_ops.to_rotvec(rigids.qs))
    composed_angles = np.linalg.norm(composed_rotvec, axis=-1)
    composed_trans = np.asarray(rigids.trans)

    key, sub = jax.random.split(key)
    marginal = d.sample_ref(sub, n)
    marg_angles = np.linalg.norm(
        np.asarray(quat_ops.to_rotvec(marginal.qs)), axis=-1
    )
    marg_trans = np.asarray(marginal.trans)

    print(f"rotation angle mean: composed={composed_angles.mean():.4f} "
          f"marginal={marg_angles.mean():.4f}")
    print(f"rotation angle std:  composed={composed_angles.std():.4f} "
          f"marginal={marg_angles.std():.4f}")
    print(f"translation std:     composed={composed_trans.std():.4f} "
          f"marginal={marg_trans.std():.4f}")

    ok = (
        abs(composed_angles.mean() - marg_angles.mean()) < 0.1
        and abs(composed_trans.std() - marg_trans.std()) / marg_trans.std() < 0.15
    )
    print("MATCH" if ok else "MISMATCH")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
