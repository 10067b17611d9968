"""Benchmark: reverse-diffusion sampler + train-step throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} for the
headline metric (median steps/s at len-256), plus per-variant lines on
stderr. Regression-grade (VERDICT r2 item 3):

- every number is the MEDIAN of >= 8 timed calls, reported with spread
  (max-min over the timed calls) so run-to-run noise is visible;
- kernels-on vs kernels-off are measured in the SAME process with
  A/B/A/B-interleaved timed calls at each length, so the documented ±5%
  between-run variance cannot fake (or hide) a kernel delta;
- a train-step variant (train_step_4x256_bf16, examples/s) makes
  training-path regressions visible to the driver, not just sampling.

Workload = the BASELINE north star (BASELINE.md): full-size FrameDiPT model
(node 256 / edge 128, 4 IPA blocks), length-256 inpainting, self-conditioned
reverse sampler. Each diffusion step is one score-network forward + the full
SE(3) reverse update, all inside one lax.scan on device; timed wall-clock
includes the single ~30 ms dispatch round-trip of the tunneled executor
(same convention as BENCH_r01/r02 — comparable across rounds). vs_baseline
is measured against the driver-defined target of 100 steps/s (500-step
sample in <5 s on one v5e chip).
"""
from __future__ import annotations

import dataclasses
import json
import pathlib
import statistics
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

TARGET_STEPS_PER_SEC = 100.0  # 500-step CDR3 sample in <5 s (BASELINE.md)
TIMED_CALLS = 8

# Plausibility floor: no step of the full-size model can run faster than
# this on one v5e (fastest measured variant is ~1.4 ms/step; the floor
# sits ~2x under it). The tunneled executor occasionally returns from
# block_until_ready WITHOUT having executed (observed r5: a whole variant
# timed at dispatch speed, reporting 195k steps/s) — any timing under
# n_steps * floor is re-measured with a fresh key, and a variant that
# stays under it becomes an {"error": ...} entry instead of garbage.
MIN_STEP_SECONDS = 8e-4


class ImplausibleTiming(RuntimeError):
    """Timings stayed below the physical plausibility floor."""


def _fresh_key() -> jax.Array:
    return jax.random.PRNGKey(time.time_ns() % (2**31 - 1))


def _build_sampler(num_res: int, num_t: int, compute_dtype: str,
                   use_pallas: bool, batch: int):
    from __graft_entry__ import _make_feats, _make_model
    from framedipt_tpu.model import ScoreNetwork
    from framedipt_tpu.sampling import build_inference_fn

    cfg, diffuser, model = _make_model()
    if compute_dtype != "float32" or use_pallas:
        mc = dataclasses.replace(cfg.model, compute_dtype=compute_dtype)
        # use_pallas enables both fused kernels (edge transitions + edge
        # embedder), matching what the inference CLI auto-enables on TPU.
        mc.ipa = dataclasses.replace(
            mc.ipa,
            use_pallas_kernel=use_pallas,
            use_pallas_embedder=use_pallas,
        )
        model = ScoreNetwork(mc, diffuser, inpainting=True)

    feats = _make_feats(batch, num_res)
    # jitted: eager init per-op dispatches through the tunnel (~30 ms each)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), feats)
    run = build_inference_fn(
        model, diffuser, num_t=num_t, min_t=0.01, noise_scale=0.1,
        inpainting=True, aux_traj=False,
    )
    return run, params, feats


def _warm(run, params, feats, base: int) -> None:
    # Salt the keys with wall-clock time: the executor can dedup repeat
    # calls with identical inputs, so a rerun with the same keys could
    # return cached trajectories at dispatch speed and fake the number.
    # Two warm calls: the first timed execution after a fresh compile is
    # occasionally ~10% slow on the tunneled executor.
    jax.block_until_ready(run(params, feats, jax.random.PRNGKey(base)))
    jax.block_until_ready(run(params, feats, jax.random.PRNGKey(base + 99)))


def _one_timed(run, params, feats, key) -> float:
    t0 = time.perf_counter()
    out = run(params, feats, key)
    jax.block_until_ready(out)
    return time.perf_counter() - t0


def _one_timed_plausible(run, params, feats, num_t: int, what: str,
                         retries: int = 3) -> float:
    """_one_timed with the plausibility floor: retry under-floor timings
    with a fresh wall-clock key (busts executor dedup), then fail loud."""
    floor = num_t * MIN_STEP_SECONDS
    for _ in range(retries + 1):
        t = _one_timed(run, params, feats, _fresh_key())
        if t >= floor:
            return t
        print(
            f"{what}: implausible timing {t * 1e3:.2f} ms for {num_t} "
            f"steps (< {floor * 1e3:.0f} ms floor; non-blocking "
            "dispatch?); retrying",
            file=sys.stderr,
        )
    raise ImplausibleTiming(
        f"{what}: timings stayed under the {floor * 1e3:.0f} ms floor "
        f"after {retries + 1} attempts"
    )


def _stats(times: list[float], num_t: int) -> dict:
    rates = sorted(num_t / t for t in times)
    return {
        "median": round(statistics.median(rates), 2),
        "spread": round(rates[-1] - rates[0], 2),
        "n": len(rates),
    }


def bench_pair(num_res: int, num_t: int, batch: int = 1) -> dict[str, dict]:
    """bf16 XLA vs bf16+Pallas at one length, interleaved in one process."""
    base = time.time_ns() % (2**31 - 1)
    run_x, p_x, f_x = _build_sampler(num_res, num_t, "bfloat16", False, batch)
    run_p, p_p, f_p = _build_sampler(num_res, num_t, "bfloat16", True, batch)
    _warm(run_x, p_x, f_x, base)
    _warm(run_p, p_p, f_p, base + 7)
    tx, tp = [], []
    for i in range(TIMED_CALLS):
        tx.append(_one_timed_plausible(
            run_x, p_x, f_x, num_t, f"len{num_res}_xla[{i}]"
        ))
        tp.append(_one_timed_plausible(
            run_p, p_p, f_p, num_t, f"len{num_res}_pallas[{i}]"
        ))
    sx, sp = _stats(tx, num_t), _stats(tp, num_t)
    sp["vs_xla_pct"] = round(100.0 * (sp["median"] / sx["median"] - 1.0), 1)
    # Paired per-iteration deltas (steps/s, pallas minus xla): the honest
    # way to adjudicate a small effect when the independent spreads
    # overlap it (VERDICT r4 weak #5 — len-256's +4-5% vs a same-size
    # spread). Negative min => the sign is within run noise at this shape.
    deltas = sorted(num_t / b - num_t / a for a, b in zip(tx, tp))
    return {
        "xla": sx,
        "pallas": sp,
        "paired_delta": {
            "median": round(statistics.median(deltas), 2),
            "min": round(deltas[0], 2),
            "max": round(deltas[-1], 2),
            "n": len(deltas),
        },
    }


def bench_single(num_res: int, num_t: int, compute_dtype: str,
                 use_pallas: bool, batch: int = 1) -> dict:
    base = time.time_ns() % (2**31 - 1)
    run, params, feats = _build_sampler(
        num_res, num_t, compute_dtype, use_pallas, batch
    )
    _warm(run, params, feats, base)
    times = [
        _one_timed_plausible(
            run, params, feats, num_t,
            f"single_len{num_res}_{compute_dtype}[{i}]",
        )
        for i in range(TIMED_CALLS)
    ]
    return _stats(times, num_t)


def _build_train_runner(batch: int = 4, num_res: int = 256,
                        compute_dtype: str = "bfloat16",
                        use_pallas: bool = False,
                        use_pallas_embedder: bool = False,
                        emb_bwd: str = "xla",
                        lo: int = 8, hi: int = 32):
    """Build the two-length scan runners for one train variant (see
    bench_train_step). Returns (time_once, batch) where time_once(i)
    runs the lo and hi scans once each and returns seconds-per-step via
    the slope (cancels the ~30 ms dispatch exactly). A wider (lo, hi)
    span divides the slope's run-to-run jitter by (hi-lo) — used by the
    paired A/B, whose ~2-3% effect needs tighter per-pair noise."""
    from __graft_entry__ import _make_feats, _make_model
    from framedipt_tpu.model import ScoreNetwork
    from framedipt_tpu.train.loop import (
        build_train_step,
        init_train_state,
        make_optimizer,
    )

    cfg, diffuser, model = _make_model()
    if compute_dtype != "float32" or use_pallas or use_pallas_embedder:
        mc = dataclasses.replace(cfg.model, compute_dtype=compute_dtype)
        if use_pallas:
            mc.ipa = dataclasses.replace(
                mc.ipa, use_pallas_kernel=True, pallas_bwd_impl="pallas"
            )
        if use_pallas_embedder:
            # Forward = fused embedder kernel; backward per emb_bwd: the
            # remat XLA twin or the fused Pallas backward kernel.
            mc.ipa = dataclasses.replace(
                mc.ipa, use_pallas_embedder=True,
                pallas_emb_bwd_impl=emb_bwd,
            )
        model = ScoreNetwork(mc, diffuser, inpainting=True)
    feats = _make_feats(batch, num_res)
    batch_dict = {
        "rigids_0": feats["rigids_t"],
        "res_mask": feats["res_mask"],
        "fixed_mask": feats["fixed_mask"],
        "seq_idx": feats["seq_idx"],
        "torsion_angles_sin_cos": feats["torsion_angles_sin_cos"],
        "aatype": feats["aatype"],
    }
    optimizer = make_optimizer(cfg.experiment.learning_rate)
    state = init_train_state(model, optimizer, batch_dict, jax.random.PRNGKey(0))
    train_step = build_train_step(model, diffuser, cfg, optimizer)

    # Force a LARGE param leaf to host after the scan: block_until_ready on
    # a scalar jit output can return without executing on the tunneled
    # backend (PERF.md measurement gotchas).
    leaf_sizes = [
        int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(state.params)
    ]
    big_idx = max(range(len(leaf_sizes)), key=leaf_sizes.__getitem__)

    def steps(n_steps: int):
        @jax.jit
        def run(state, key):
            def body(carry, k):
                st, _ = train_step(carry, batch_dict, k)
                return st, ()

            keys = jax.random.split(key, n_steps)
            final, _ = jax.lax.scan(body, state, keys)
            return jax.tree_util.tree_leaves(final.params)[big_idx]

        return run

    base = time.time_ns() % (2**31 - 1)
    run_lo, run_hi = steps(lo), steps(hi)

    def warm() -> None:
        # Warm 3x: JAX compiles twice (second when outputs commit
        # shardings).
        for i in range(3):
            jax.block_until_ready(run_lo(state, jax.random.PRNGKey(base + i)))
            jax.block_until_ready(
                run_hi(state, jax.random.PRNGKey(base + 10 + i))
            )

    def timed_scan(run_fn, n_steps: int, tag: str) -> float:
        floor = n_steps * MIN_STEP_SECONDS
        for _ in range(4):
            key = _fresh_key()
            t0 = time.perf_counter()
            jax.block_until_ready(run_fn(state, key))
            t = time.perf_counter() - t0
            if t >= floor:
                return t
            print(
                f"train {tag}: implausible {t * 1e3:.2f} ms for {n_steps} "
                "steps; retrying with a fresh key",
                file=sys.stderr,
            )
        raise ImplausibleTiming(
            f"train {tag}: timings stayed under the {floor * 1e3:.0f} ms "
            "floor after 4 attempts"
        )

    def time_once(i: int) -> float:
        t_lo = timed_scan(run_lo, lo, f"lo[{i}]")
        t_hi = timed_scan(run_hi, hi, f"hi[{i}]")
        return (t_hi - t_lo) / (hi - lo)

    return warm, time_once


def _train_stats(per_step: list[float], batch: int) -> dict:
    ex_rates = sorted(batch / t for t in per_step)
    return {
        "median": round(statistics.median(ex_rates), 2),
        "spread": round(ex_rates[-1] - ex_rates[0], 2),
        "n": len(ex_rates),
        "step_ms": round(1e3 * statistics.median(per_step), 2),
    }


def bench_train_step(batch: int = 4, num_res: int = 256,
                     compute_dtype: str = "bfloat16",
                     use_pallas: bool = False,
                     use_pallas_embedder: bool = False,
                     emb_bwd: str = "xla") -> dict:
    """Full fused train step (noising + fwd + DSM losses + Adam update) at
    the published model size; reported as examples/s via the two-length
    scan slope (cancels the ~30 ms dispatch exactly — single-call timings
    are meaningless on the tunneled executor, see PERF.md). With
    ``use_pallas`` the edge transitions run the fused pair-MLP kernel
    forward AND the fused backward kernel (pallas_bwd_impl="pallas");
    ``emb_bwd`` selects the embedder kernel's backward ("xla" remat twin
    or "pallas" fused backward)."""
    warm, time_once = _build_train_runner(
        batch, num_res, compute_dtype, use_pallas, use_pallas_embedder,
        emb_bwd,
    )
    warm()
    return _train_stats([time_once(i) for i in range(TIMED_CALLS)], batch)


def bench_train_pair(spec_a: dict, spec_b: dict, batch: int = 4,
                     lo: int = 8, hi: int = 64,
                     n_pairs: int = 20) -> dict:
    """Interleaved same-process A/B of two train variants (A,B,A,B,...),
    reporting each variant's stats PLUS the paired per-iteration delta —
    the way close calls are actually adjudicated (VERDICT r4 weak #1:
    independent medians' spreads dwarf a ~2% effect; paired deltas cancel
    the slow drift both variants share). Uses a wider slope span (8->64
    steps) and more pairs than the headline variants: at the default
    span the per-pair slope noise (~0.5 ms/step) swamps the ~0.7 ms/step
    effect being adjudicated."""
    warm_a, time_a = _build_train_runner(batch=batch, lo=lo, hi=hi, **spec_a)
    warm_b, time_b = _build_train_runner(batch=batch, lo=lo, hi=hi, **spec_b)
    warm_a()
    warm_b()
    per_a, per_b, deltas = [], [], []
    for i in range(n_pairs):
        ta = time_a(i)
        tb = time_b(i)
        per_a.append(ta)
        per_b.append(tb)
        deltas.append(batch / tb - batch / ta)  # examples/s, B minus A
    deltas.sort()
    n = len(deltas)
    # Sign-test adjudication alongside the median: frac_positive with an
    # exact two-sided binomial p-value under H0 "no difference" — a CI-free
    # statistic a reader can act on even when min/max straddle zero.
    pos = sum(1 for d in deltas if d > 0)
    k = min(pos, n - pos)
    p_sign = min(1.0, 2.0 * sum(
        _binom(n, i) for i in range(0, k + 1)
    ) / (2.0 ** n))
    return {
        "a": _train_stats(per_a, batch),
        "b": _train_stats(per_b, batch),
        "paired_delta_b_minus_a": {
            "median": round(statistics.median(deltas), 2),
            "min": round(deltas[0], 2),
            "max": round(deltas[-1], 2),
            "n": n,
            "frac_positive": round(pos / n, 2),
            "sign_test_p": round(p_sign, 4),
        },
    }


def _binom(n: int, k: int) -> int:
    import math

    return math.comb(n, k)


def bench_mpnn(num_res: int = 256, num_seqs: int = 8) -> dict:
    """In-process ProteinMPNN design throughput (seqs/s): one batched
    jit'd sample+score call for all num_seqs sequences of a length-256
    backbone (synthesized weights — throughput is weight-independent).
    The reference runs this as a subprocess looping one sequence at a
    time (protein_mpnn_run.py:210-340)."""
    from framedipt_tpu.model import mpnn
    from framedipt_tpu.tools.mpnn_design import _design_batch

    cfg = mpnn.MPNNConfig()  # released v_48 hyperparams, k=48
    params = mpnn.init_mpnn_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    ca = np.cumsum(
        rng.normal(0, 0.5, (num_res, 3)) + np.array([3.0, 1.5, 0.8]), axis=0
    )
    xyz = ca[:, None, :] + rng.normal(0, 0.6, (num_res, 4, 3))
    seq = "".join("ACDEFGHIKLMNPQRSTVWY"[i % 20] for i in range(num_res))
    feats = mpnn.featurize_chains([(seq, xyz)])
    feats = {k: jnp.asarray(v) for k, v in feats.items()}

    # A single design batch is ~ms-scale, far below the ~30 ms dispatch
    # jitter — time a scan of K batches and use the two-length slope.
    def runner(n_iter: int):
        @jax.jit
        def run(key):
            def body(_, k):
                out = _design_batch(params, k, feats, cfg, num_seqs, 0.1)
                return (), out["S"][0, 0]

            _, s = jax.lax.scan(body, (), jax.random.split(key, n_iter))
            return s

        return run

    lo, hi = 4, 16
    run_lo, run_hi = runner(lo), runner(hi)
    base = time.time_ns() % (2**31 - 1)
    for i in range(2):
        jax.block_until_ready(run_lo(jax.random.PRNGKey(base + i)))
        jax.block_until_ready(run_hi(jax.random.PRNGKey(base + 10 + i)))
    per_call = []
    for i in range(TIMED_CALLS):
        t0 = time.perf_counter()
        jax.block_until_ready(run_lo(jax.random.PRNGKey(base + 100 + i)))
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        jax.block_until_ready(run_hi(jax.random.PRNGKey(base + 200 + i)))
        t_hi = time.perf_counter() - t0
        per_call.append((t_hi - t_lo) / (hi - lo))
    rates = sorted(num_seqs / t for t in per_call)
    return {
        "median": round(statistics.median(rates), 2),
        "spread": round(rates[-1] - rates[0], 2),
        "n": len(rates),
        "unit": "seqs/s",
    }


def _backend_reachable(timeout_s: float = 240.0) -> bool:
    """Probe backend init in a bounded child. When the tunneled TPU is
    wedged (e.g. after a crashed client), plugin REGISTRATION hangs forever
    in-process — probing here keeps the bench (and the driver harness that
    parses its one JSON line) from stalling with it."""
    import subprocess

    try:
        proc = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s,
            capture_output=True,
        )
        return proc.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main() -> None:
    if not _backend_reachable():
        print(
            json.dumps(
                {
                    "metric": "diffusion_steps_per_sec_len256",
                    "value": 0.0,
                    "unit": "steps/s",
                    "vs_baseline": 0.0,
                    "error": "backend unreachable: jax.devices() did not "
                    "return within 240s (tunneled TPU wedged); no "
                    "measurement taken",
                }
            )
        )
        return

    results: dict[str, object] = {}

    def _record_failure(name: str, e: Exception) -> None:
        # A variant that raises (e.g. a Mosaic compile failure) must be
        # visible in the JSON itself, not only on stderr: round-3's
        # pallas_bwd compile regression was invisible in BENCH_r03.json
        # because the variant was silently omitted.
        msg = f"{type(e).__name__}: {e}"
        results[name] = {"error": msg[:500]}
        print(f"{name} failed: {msg}", file=sys.stderr)

    # f32 reference point (single variant, no pair).
    try:
        results["len256_f32"] = bench_single(256, 100, "float32", False)
        print(f"len256_f32: {results['len256_f32']}", file=sys.stderr)
    except Exception as e:  # noqa: BLE001
        _record_failure("len256_f32", e)

    # Interleaved kernel A/B at each production length.
    for name, (num_res, num_t) in {
        "len256": (256, 100),
        "len512": (512, 100),
        "len1024": (1024, 50),
    }.items():
        try:
            pair = bench_pair(num_res, num_t)
            results[f"{name}_bf16"] = pair["xla"]
            results[f"{name}_bf16_pallas"] = pair["pallas"]
            results[f"{name}_pallas_paired_delta"] = pair["paired_delta"]
            print(f"{name} A/B: {pair}", file=sys.stderr)
        except Exception as e:  # noqa: BLE001
            _record_failure(f"{name}_bf16_ab_pair", e)

    # The 5-sample TCR protocol as one batched scan (per-batch steps/s;
    # multiply by 5 for sample-steps/s).
    try:
        results["len256_bf16_pallas_batch5"] = bench_single(
            256, 100, "bfloat16", True, batch=5
        )
        print(
            f"len256_bf16_pallas_batch5: {results['len256_bf16_pallas_batch5']}",
            file=sys.stderr,
        )
    except Exception as e:  # noqa: BLE001
        _record_failure("len256_bf16_pallas_batch5", e)

    # Training path (examples/s, dispatch-free slope): XLA saved-activation
    # backward solo, then the two fused-backward variants as an interleaved
    # paired A/B (their ~2% difference needs paired deltas to adjudicate).
    try:
        results["train_step_4x256_bf16"] = bench_train_step()
        print(
            f"train_step_4x256_bf16: {results['train_step_4x256_bf16']}",
            file=sys.stderr,
        )
    except Exception as e:  # noqa: BLE001
        _record_failure("train_step_4x256_bf16", e)
    try:
        pair = bench_train_pair(
            # A: fused pair-MLP forward + fused backward kernel.
            {"use_pallas": True},
            # B: + embedder kernel with its fused Pallas backward (the
            # cotangent read is its only N^2 HBM traffic).
            {"use_pallas": True, "use_pallas_embedder": True,
             "emb_bwd": "pallas"},
        )
        results["train_step_4x256_bf16_pallas_bwd"] = pair["a"]
        results["train_step_4x256_bf16_pallas_emb_bwd"] = pair["b"]
        results["train_emb_bwd_paired_delta"] = (
            pair["paired_delta_b_minus_a"]
        )
        print(f"train pallas A/B: {pair}", file=sys.stderr)
    except Exception as e:  # noqa: BLE001
        _record_failure("train_step_4x256_bf16_pallas_ab_pair", e)

    # In-process MPNN sequence design (round-5 component).
    try:
        results["mpnn_design_256x8"] = bench_mpnn()
        print(f"mpnn_design_256x8: {results['mpnn_design_256x8']}",
              file=sys.stderr)
    except Exception as e:  # noqa: BLE001
        _record_failure("mpnn_design_256x8", e)

    # Fused-backward grad parity vs the XLA twins, on this exact stack
    # (VERDICT r4 weak #4: a libtpu bump could silently degrade parity
    # while still compiling — record the figures driver-visibly).
    try:
        sys.path.insert(0, str(pathlib.Path(__file__).parent / "scripts"))
        from tpu_smoke_bwd import kernel_parity

        results["kernel_parity"] = kernel_parity(n=512)
        print(f"kernel_parity: {results['kernel_parity']}", file=sys.stderr)
    except Exception as e:  # noqa: BLE001
        _record_failure("kernel_parity", e)

    # vs_baseline is computed from succeeded variants only — the explicit
    # single-sample len-256 samplers, NOT paired-delta entries (their
    # medians are deltas, not rates) or the batch-5 variant.
    len256 = [
        results[k]["median"]
        for k in ("len256_f32", "len256_bf16", "len256_bf16_pallas")
        if isinstance(results.get(k), dict) and "median" in results[k]
    ]
    if not len256:
        # Every len-256 variant failed: still emit the one JSON line the
        # driver parses, with the error explicit (same contract as the
        # backend-unreachable path above).
        print(
            json.dumps(
                {
                    "metric": "diffusion_steps_per_sec_len256",
                    "value": 0.0,
                    "unit": "steps/s",
                    "vs_baseline": 0.0,
                    "error": "all len256 variants failed (see stderr)",
                    "variants": results,
                }
            )
        )
        return
    best256 = max(len256)
    failed = sorted(
        k for k, v in results.items()
        if isinstance(v, dict) and "error" in v
    )
    line: dict[str, object] = {
        "metric": "diffusion_steps_per_sec_len256",
        "value": best256,
        "unit": "steps/s",
        "vs_baseline": round(best256 / TARGET_STEPS_PER_SEC, 3),
        "variants": results,
    }
    if failed:
        line["failed_variants"] = failed
    print(json.dumps(line))


if __name__ == "__main__":
    main()
