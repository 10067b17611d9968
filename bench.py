"""Benchmark: reverse-diffusion sampler throughput at length 256.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload = the BASELINE north star (BASELINE.md): full-size FrameDiPT model
(node 256 / edge 128, 4 IPA blocks), length-256 inpainting, self-conditioned
reverse sampler. Each diffusion step is one score-network forward + the full
SE(3) reverse update, all inside one lax.scan on device. vs_baseline is
measured against the driver-defined target of 100 steps/s (500-step sample
in <5 s on one v5e chip).
"""
from __future__ import annotations

import json
import time

import jax
import numpy as np

TARGET_STEPS_PER_SEC = 100.0  # 500-step CDR3 sample in <5 s (BASELINE.md)


def main() -> None:
    from __graft_entry__ import _make_feats, _make_model
    from framedipt_tpu.sampling import build_inference_fn

    num_res, num_t = 256, 100
    cfg, diffuser, model = _make_model()
    feats = _make_feats(1, num_res)
    params = model.init(jax.random.PRNGKey(0), feats)

    run = build_inference_fn(
        model,
        diffuser,
        num_t=num_t,
        min_t=0.01,
        noise_scale=0.1,
        inpainting=True,
        aux_traj=False,
    )

    # Compile + warm up.
    out = run(params, feats, jax.random.PRNGKey(1))
    jax.block_until_ready(out)

    times = []
    for i in range(3):
        t0 = time.perf_counter()
        out = run(params, feats, jax.random.PRNGKey(2 + i))
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)

    best = min(times)
    steps_per_sec = num_t / best
    print(
        json.dumps(
            {
                "metric": "diffusion_steps_per_sec_len256",
                "value": round(steps_per_sec, 2),
                "unit": "steps/s",
                "vs_baseline": round(steps_per_sec / TARGET_STEPS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
