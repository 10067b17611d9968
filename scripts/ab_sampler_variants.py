"""Interleaved on-chip A/B of sampler micro-variants at the headline config.

Variants (full-size model, bf16, both fused kernels, len-256 / num_t=100):
  base     : _HOIST_BACKBONE=True,  _SCAN_UNROLL=1  (post-scan atom37 rebuild)
  nohoist  : _HOIST_BACKBONE=False, _SCAN_UNROLL=1  (in-scan rebuild —
             the SHIPPED default since the round-4 measurement: the hoist
             lost 2-3% at both lengths, see PERF.md)
  unroll2  : _HOIST_BACKBONE=True,  _SCAN_UNROLL=2
  unroll4  : _HOIST_BACKBONE=True,  _SCAN_UNROLL=4

All variants are compiled first, then timed A/B/A/B in one process so the
documented ±5% between-run spread cannot fake a delta (PERF.md measurement
notes). Usage: PYTHONPATH=/root/repo:/root/.axon_site python
scripts/ab_sampler_variants.py [num_res] [num_t]
"""
from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

NUM_RES = int(sys.argv[1]) if len(sys.argv) > 1 else 256
NUM_T = int(sys.argv[2]) if len(sys.argv) > 2 else 100
TIMED = 8

VARIANTS = {
    "base": (True, 1),
    "nohoist": (False, 1),
    "unroll2": (True, 2),
    "unroll4": (True, 4),
}


def main() -> None:
    from bench import _build_sampler
    from framedipt_tpu.sampling import reverse as rev

    base = time.time_ns() % (2**31 - 1)
    built = {}
    orig = (rev._HOIST_BACKBONE, rev._SCAN_UNROLL)
    try:
        for name, (hoist, unroll) in VARIANTS.items():
            rev._HOIST_BACKBONE = hoist
            rev._SCAN_UNROLL = unroll
            run, params, feats = _build_sampler(
                NUM_RES, NUM_T, "bfloat16", True, 1
            )
            # Warm twice (compile + the occasionally-slow first call).
            jax.block_until_ready(run(params, feats, jax.random.PRNGKey(base)))
            jax.block_until_ready(
                run(params, feats, jax.random.PRNGKey(base + 1))
            )
            built[name] = (run, params, feats)
            print(f"compiled {name}", file=sys.stderr)
    finally:
        rev._HOIST_BACKBONE, rev._SCAN_UNROLL = orig

    times: dict[str, list[float]] = {k: [] for k in VARIANTS}
    for i in range(TIMED):
        for name, (run, params, feats) in built.items():
            key = jax.random.PRNGKey(base + 100 * (i + 1) + hash(name) % 97)
            t0 = time.perf_counter()
            jax.block_until_ready(run(params, feats, key))
            times[name].append(time.perf_counter() - t0)

    for name, ts in times.items():
        rates = sorted(NUM_T / t for t in ts)
        med = statistics.median(rates)
        print(
            f"{name:8s} len{NUM_RES}: median {med:7.2f} steps/s "
            f"(spread {rates[-1] - rates[0]:.2f}, n={len(rates)})"
        )


if __name__ == "__main__":
    main()
