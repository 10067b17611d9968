"""Benchmark: reverse-diffusion sampler throughput at length 256.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} for the
headline metric (best steps/s at len-256), plus per-variant lines on stderr.

Workload = the BASELINE north star (BASELINE.md): full-size FrameDiPT model
(node 256 / edge 128, 4 IPA blocks), length-256 inpainting, self-conditioned
reverse sampler. Each diffusion step is one score-network forward + the full
SE(3) reverse update, all inside one lax.scan on device. vs_baseline is
measured against the driver-defined target of 100 steps/s (500-step sample
in <5 s on one v5e chip).
"""
from __future__ import annotations

import dataclasses
import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

TARGET_STEPS_PER_SEC = 100.0  # 500-step CDR3 sample in <5 s (BASELINE.md)


def bench_variant(
    num_res: int, num_t: int, compute_dtype: str, use_pallas: bool = False,
    batch: int = 1,
) -> float:
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
    params = model.init(jax.random.PRNGKey(0), feats)
    run = build_inference_fn(
        model, diffuser, num_t=num_t, min_t=0.01, noise_scale=0.1,
        inpainting=True, aux_traj=False,
    )
    # Salt the keys with wall-clock time: the executor can dedup repeat
    # calls with identical inputs, so a rerun with the same keys could
    # return cached trajectories at dispatch speed and fake the number.
    base = time.time_ns() % (2**31 - 1)
    out = run(params, feats, jax.random.PRNGKey(base))  # compile + warmup
    jax.block_until_ready(out)
    # One more post-compile warm call: the first timed execution after a
    # fresh compile is occasionally 10% slow on the tunneled executor.
    jax.block_until_ready(run(params, feats, jax.random.PRNGKey(base + 99)))
    times = []
    for i in range(4):
        t0 = time.perf_counter()
        out = run(params, feats, jax.random.PRNGKey(base + 1 + i))
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return num_t / min(times)


def main() -> None:
    results = {}
    for name, (num_res, num_t, dtype, pallas, batch) in {
        "len256_f32": (256, 100, "float32", False, 1),
        "len256_bf16": (256, 100, "bfloat16", False, 1),
        "len256_bf16_pallas": (256, 100, "bfloat16", True, 1),
        "len512_bf16": (512, 100, "bfloat16", False, 1),
        "len512_bf16_pallas": (512, 100, "bfloat16", True, 1),
        # Production-serving shapes: the 5-sample TCR protocol as one
        # batched scan, and the long-complex bucket. Values are per-batch
        # sampler steps/s (multiply by batch for sample-steps/s).
        "len256_bf16_pallas_batch5": (256, 100, "bfloat16", True, 5),
        "len1024_bf16_pallas": (1024, 50, "bfloat16", True, 1),
    }.items():
        try:
            sps = bench_variant(num_res, num_t, dtype, pallas, batch)
            results[name] = round(sps, 2)
            print(f"{name}: {sps:.1f} steps/s", file=sys.stderr)
        except Exception as e:  # noqa: BLE001
            print(f"{name} failed: {e}", file=sys.stderr)

    best256 = max(
        v
        for k, v in results.items()
        if k.startswith("len256") and "batch" not in k
    )
    print(
        json.dumps(
            {
                "metric": "diffusion_steps_per_sec_len256",
                "value": best256,
                "unit": "steps/s",
                "vs_baseline": round(best256 / TARGET_STEPS_PER_SEC, 3),
                "variants": results,
            }
        )
    )


if __name__ == "__main__":
    main()
