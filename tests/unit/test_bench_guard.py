"""bench.py timing-plausibility guard (PERF.md measurement notes).

The tunneled executor can return from block_until_ready without having
executed (observed r5: whole variants at dispatch speed). The guard must
re-measure under-floor timings and fail loud — never report them.
"""
from __future__ import annotations

import sys
import time

import pytest


@pytest.fixture(scope="module")
def bench():
    sys.path.insert(0, "/root/repo")
    import bench as bench_mod

    return bench_mod


def test_plausible_timing_passes_through(bench):
    calls = []

    def run(params, feats, key):
        calls.append(key)
        time.sleep(0.02)
        return 0

    t = bench._one_timed_plausible(run, None, None, num_t=10, what="ok")
    assert t >= 10 * bench.MIN_STEP_SECONDS
    assert len(calls) == 1


def test_underfloor_timing_retries_then_raises(bench, capsys):
    calls = []

    def run(params, feats, key):
        calls.append(key)
        return 0  # returns instantly: dispatch-speed garbage

    with pytest.raises(bench.ImplausibleTiming):
        bench._one_timed_plausible(
            run, None, None, num_t=100, what="garbage", retries=2
        )
    assert len(calls) == 3  # initial + 2 retries
    # retries use distinct fresh keys (dedup busting)
    reprs = {str(k) for k in calls}
    assert len(reprs) == len(calls)
    assert "implausible timing" in capsys.readouterr().err


def test_underfloor_then_recovered_returns_real_timing(bench):
    state = {"n": 0}

    def run(params, feats, key):
        state["n"] += 1
        if state["n"] == 1:
            return 0  # first call garbage
        time.sleep(0.09)
        return 0

    t = bench._one_timed_plausible(run, None, None, num_t=100, what="flaky")
    assert t >= 100 * bench.MIN_STEP_SECONDS
    assert state["n"] == 2


def test_headline_excludes_paired_deltas_and_errors(bench):
    """The reported value must come only from the explicit len-256 variant
    list — a corrupted/paired-delta/batch entry can never win (the r5c
    run's len256_f32 'measured' 195k steps/s)."""
    # Reproduce the selection expression on a crafted results dict.
    results = {
        "len256_f32": {"error": "ImplausibleTiming: ..."},
        "len256_bf16": {"median": 660.0},
        "len256_bf16_pallas": {"median": 700.0},
        "len256_pallas_paired_delta": {"median": 999999.0},
        "len256_bf16_pallas_batch5": {"median": 888888.0},
    }
    len256 = [
        results[k]["median"]
        for k in ("len256_f32", "len256_bf16", "len256_bf16_pallas")
        if isinstance(results.get(k), dict) and "median" in results[k]
    ]
    assert max(len256) == 700.0
    # and the real bench.py source uses exactly that variant tuple
    src = open("/root/repo/bench.py").read()
    assert '("len256_f32", "len256_bf16", "len256_bf16_pallas")' in src


def test_sign_test_adjudication_math(bench):
    """Paired-delta sign test: exact two-sided binomial under H0. 15/20
    positive is significant at 0.05; a 50/50 split is p=1."""
    import math

    def p_sign(n, pos):
        k = min(pos, n - pos)
        return min(1.0, 2.0 * sum(bench._binom(n, i) for i in range(k + 1))
                   / 2.0 ** n)

    assert bench._binom(20, 3) == math.comb(20, 3)
    assert p_sign(20, 10) == 1.0
    assert p_sign(20, 15) == pytest.approx(0.0414, abs=2e-3)
    assert p_sign(20, 15) < 0.05
    assert p_sign(20, 20) == pytest.approx(2 / 2 ** 20)
