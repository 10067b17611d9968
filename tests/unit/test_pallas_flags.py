"""Auto-resolution of the Pallas kernel flags (experiments/utils.py).

The probe must reflect where jit will actually run: in this test harness
jax_default_device is pinned to CPU (conftest), so auto resolves every
kernel flag off even though the TPU plugin is registered and
jax.default_backend() still reports "tpu"."""
import jax

from framedipt_tpu.experiments.utils import resolve_pallas_flags
from framedipt_tpu.tools.config import Config


def test_auto_flags_off_when_pinned_to_cpu():
    cfg = Config()
    assert cfg.model.ipa.use_pallas_kernel is None
    resolve_pallas_flags(cfg)
    assert cfg.model.ipa.use_pallas_kernel is False
    assert cfg.model.ipa.use_pallas_embedder is False
    # The IPA attention kernel is never auto-enabled (PERF.md negative
    # result) — auto leaves it None and the trunk treats None as off.
    assert cfg.model.ipa.use_pallas_ipa is None


def test_explicit_flags_survive_resolution():
    cfg = Config()
    cfg.model.ipa.use_pallas_kernel = True
    cfg.model.ipa.use_pallas_embedder = False
    resolve_pallas_flags(cfg)
    assert cfg.model.ipa.use_pallas_kernel is True
    assert cfg.model.ipa.use_pallas_embedder is False
