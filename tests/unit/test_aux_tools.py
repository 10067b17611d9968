"""Aux-subsystem coverage: step timing, JSONL metrics stream, and the
loss-aware timestep importance sampler (SURVEY.md §5 observability items)."""
import json

import numpy as np
import pytest

import jax.numpy as jnp

from framedipt_tpu.tools.metrics_logger import MetricsLogger
from framedipt_tpu.tools.profiling import StepTimer
from framedipt_tpu.train.importance import TimestepImportanceSampler


def test_step_timer_reports_rate():
    timer = StepTimer(window=5)
    assert timer.step(jnp.zeros(3)) is None  # first step: no rate yet
    rates = [timer.step(jnp.zeros(3)) for _ in range(6)]
    assert all(r is not None and r > 0 for r in rates)


def test_metrics_logger_jsonl_roundtrip(tmp_path):
    ml = MetricsLogger(tmp_path)
    ml.log(0, {"loss": jnp.asarray(1.5), "skipme": "not-a-number"})
    ml.log(10, {"loss": 0.5, "rot_loss": np.float32(0.25)})
    ml.close()
    rows = [
        json.loads(line)
        for line in (tmp_path / "metrics.jsonl").read_text().splitlines()
    ]
    assert [r["step"] for r in rows] == [0, 10]
    assert rows[0]["loss"] == 1.5
    assert "skipme" not in rows[0]  # non-numeric values are dropped
    assert rows[1]["rot_loss"] == 0.25


def test_importance_sampler_warmup_and_bias():
    rng = np.random.default_rng(0)
    s = TimestepImportanceSampler(num_bins=10, history_per_term=4, min_t=0.01)
    assert not s.warmed_up
    # Uniform until every bin has a full history.
    t, w = s.sample(rng, 64)
    assert t.min() >= 0.01 and t.max() < 1.0
    np.testing.assert_allclose(w, 1.0, atol=1e-6)

    # Feed a loss landscape where late timesteps are 10x harder.
    for _ in range(40):
        t, _ = s.sample(rng, 32)
        losses = np.where(t > 0.5, 10.0, 1.0)
        s.update(t, losses)
    assert s.warmed_up

    t, w = s.sample(rng, 4000)
    late = (t > 0.5).mean()
    # sqrt(E[loss^2]) weighting: late bins ~10x likelier than early.
    assert late > 0.75, late
    # 1/p weights keep the estimator unbiased: E[w] over the sampling
    # distribution equals 1 (sum over bins of p * 1/(p*B) * B = 1).
    assert abs(w.mean() - 1.0) < 0.15, w.mean()
    # Late (oversampled) draws get proportionally small weights.
    assert w[t > 0.5].mean() < w[t <= 0.5].mean()


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
