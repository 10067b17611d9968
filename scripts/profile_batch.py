"""Batched-sampling roofline: why batch-5 is not 5x batch-1 (VERDICT r2 #10).

Times the full reverse sampler (bf16 + fused kernels, published model size)
at batch sizes 1/2/5 for len-256, in ONE process with interleaved timed
calls, and reads the compiled HLO's own FLOP count (XLA cost analysis) to
place each point against the v5e peak:

    B | ms/step | batch-steps/s | sample-steps/s | t(B)/t(1) | TFLOP/s | MFU

The decisive quantity is the step-time scaling t(B)/t(1). The "5x
theoretical batching gain" of the VERDICT assumes batch-1 leaves the chip
idle (latency/dispatch-bound); if instead t(B) grows ~linearly in B, the
chip is already throughput-saturated at batch 1 and the observed ~1.2x is
the entire reclaimable headroom (the fixed O(N) + dispatch share). A
linear fit t(B) = a + b*B splits the step into its amortizable (a) and
saturated (b*B) parts.

Measurement defenses as in bench.py: time-salted keys (executor dedup),
median of >= 6 calls with spread, trajectories forced to host, two warm
calls per program (PERF.md measurement gotchas).

Run on the real chip: python scripts/profile_batch.py [N] [num_t]
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")

V5E_PEAK_BF16_TFLOPS = 197.0
TIMED_CALLS = 6


def _fwd_flops(num_res: int, batch: int = 1) -> float | None:
    """FLOPs of ONE score-network forward (= one diffusion step's compute;
    the initial self-conditioning forward amortizes over num_t) from XLA's
    own cost analysis of the unrolled apply.

    Two counter pitfalls this sidesteps (both observed on this repo):
    - lax.scan bodies are counted ONCE, not trip-count times, so analyzing
      the whole sampler under-reports ~50x at num_t=100;
    - FLOPs inside Pallas custom calls are invisible, so the kernel
      variant under-reports ~12x. The XLA formulation computes identical
      math, so its count is the right MFU numerator for every variant."""
    try:
        import dataclasses

        import numpy as np

        from __graft_entry__ import _make_model
        from framedipt_tpu.diffusion import SE3Diffuser
        from framedipt_tpu.model import ScoreNetwork
        from framedipt_tpu.tools.config import SO3Config

        # Derive the FLOP-count model from the same config the benched
        # programs use (__graft_entry__._make_model), with the Pallas
        # kernels forced off so XLA's cost analysis can see every op.
        # A smaller SO3 LUT only changes table sizes, not forward FLOPs.
        cfg, _, _ = _make_model()
        cfg.diffuser.so3 = SO3Config(num_omega=50, num_sigma=20,
                                     cache_dir=None)
        mc = dataclasses.replace(cfg.model)
        mc.ipa = dataclasses.replace(
            mc.ipa,
            use_pallas_kernel=False,
            use_pallas_embedder=False,
            use_pallas_ipa=False,
        )
        diffuser = SE3Diffuser(cfg.diffuser)
        model = ScoreNetwork(mc, diffuser, inpainting=True)
        B, N = batch, num_res
        rng = np.random.default_rng(0)
        qs = rng.normal(size=(B, N, 4)).astype(np.float32)
        qs /= np.linalg.norm(qs, axis=-1, keepdims=True)
        import jax.numpy as jnp

        feats = {
            "res_mask": jnp.ones((B, N)),
            "fixed_mask": jnp.zeros((B, N)),
            "seq_idx": jnp.tile(jnp.arange(N)[None], (B, 1)),
            "t": jnp.full((B,), 0.5),
            "sc_ca_t": jnp.zeros((B, N, 3)),
            "rigids_t": jnp.asarray(np.concatenate(
                [qs, rng.normal(size=(B, N, 3)).astype(np.float32)], -1)),
            "torsion_angles_sin_cos": jnp.asarray(
                rng.normal(size=(B, N, 7, 2)).astype(np.float32)),
            "aatype": jnp.asarray(
                rng.integers(0, 20, size=(B, N)), jnp.int32),
            "rot_score_scaling": jnp.ones((B,)),
            "trans_score_scaling": jnp.ones((B,)),
        }
        params = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0), feats)
        )
        params = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), params
        )
        analysis = (
            jax.jit(model.apply).lower(params, feats).compile()
            .cost_analysis()
        )
        if isinstance(analysis, (list, tuple)):
            analysis = analysis[0]
        return float(analysis["flops"])
    except Exception as e:  # noqa: BLE001
        print(f"  (cost_analysis unavailable: {e})", file=sys.stderr)
        return None


def main() -> None:
    num_res = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    num_t = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    batches = (
        tuple(int(b) for b in sys.argv[3].split(","))
        if len(sys.argv) > 3 else (1, 2, 5)
    )

    from bench import _build_sampler, _one_timed, _warm

    base = time.time_ns() % (2**31 - 1)
    progs = {}
    for b in batches:
        progs[b] = _build_sampler(num_res, num_t, "bfloat16", True, b)
        _warm(*progs[b], base + 13 * b)

    times: dict[int, list[float]] = {b: [] for b in batches}
    for i in range(TIMED_CALLS):
        for b in batches:  # interleave so drift hits every B equally
            run, params, feats = progs[b]
            times[b].append(
                _one_timed(run, params, feats,
                           jax.random.PRNGKey(base + 1000 * b + i))
            )

    # FLOP count from one unrolled XLA forward at B=1 (see _fwd_flops for
    # why neither the scan program nor the Pallas variant can be counted
    # directly); exact linear scaling in B since every op is batched.
    flops_b1 = _fwd_flops(num_res, 1)

    rows = []
    for b in batches:
        ms = sorted(1e3 * t / num_t for t in times[b])
        med = statistics.median(ms)
        flops = flops_b1 * b if flops_b1 else None
        rows.append({
            "batch": b,
            "ms_per_step": round(med, 3),
            "spread_ms": round(ms[-1] - ms[0], 3),
            "batch_steps_per_s": round(1e3 / med, 1),
            "sample_steps_per_s": round(b * 1e3 / med, 1),
            "flops_per_step": flops,
            "tflops_per_s": (
                round(flops / med / 1e9, 1) if flops else None
            ),
            "mfu_pct": (
                round(100 * flops / med / 1e9 / V5E_PEAK_BF16_TFLOPS, 1)
                if flops else None
            ),
        })

    t1 = rows[0]["ms_per_step"]
    for r in rows:
        r["t_scaling_vs_b1"] = round(r["ms_per_step"] / t1, 2)

    # Least-squares fit t(B) = a + slope*B over the measured batches.
    bs = [float(r["batch"]) for r in rows]
    ts = [r["ms_per_step"] for r in rows]
    n = len(bs)
    mb, mt = sum(bs) / n, sum(ts) / n
    slope = sum((x - mb) * (y - mt) for x, y in zip(bs, ts)) / sum(
        (x - mb) ** 2 for x in bs
    )
    fixed = mt - slope * mb

    hdr = (f"{'B':>3} {'ms/step':>9} {'spread':>7} {'bsteps/s':>9} "
           f"{'ssteps/s':>9} {'t(B)/t(1)':>9} {'TFLOP/s':>8} {'MFU%':>6}")
    print(f"\nN={num_res} num_t={num_t} bf16+pallas\n{hdr}")
    for r in rows:
        print(f"{r['batch']:>3} {r['ms_per_step']:>9} {r['spread_ms']:>7} "
              f"{r['batch_steps_per_s']:>9} {r['sample_steps_per_s']:>9} "
              f"{r['t_scaling_vs_b1']:>9} {str(r['tflops_per_s']):>8} "
              f"{str(r['mfu_pct']):>6}")
    print(f"\nfit t(B) = {fixed:.3f} ms + {slope:.3f} ms * B "
          f"(amortizable fixed share at B=1: {100 * fixed / t1:.0f}%)")
    ceiling = (fixed + slope) / slope
    print(f"=> perfect-batching ceiling on sample-steps/s: "
          f"{ceiling:.2f}x batch-1 (as B->inf every step pays only the "
          f"b*B part; at B=5: "
          f"{5 * (fixed + slope) / (fixed + 5 * slope):.2f}x)")


if __name__ == "__main__":
    main()
