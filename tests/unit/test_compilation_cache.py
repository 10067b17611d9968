"""Persistent XLA compilation cache setup (experiments/utils.py).

TPU-native infra addition (no reference counterpart — torch eager has no
AOT compile step): the CLI entry points point JAX's persistent cache at a
user-writable dir so the ~20-40 s sampler compile is paid once across
invocations/sweep jobs.
"""
import pathlib

import jax

from framedipt_tpu.experiments.utils import setup_compilation_cache
from framedipt_tpu.tools.config import Config


def _restore(prev):
    jax.config.update("jax_compilation_cache_dir", prev)


def test_sets_cache_dir(tmp_path):
    prev = jax.config.jax_compilation_cache_dir
    try:
        cfg = Config()
        cfg.experiment.compilation_cache_dir = str(tmp_path / "xla")
        setup_compilation_cache(cfg)
        assert jax.config.jax_compilation_cache_dir == str(tmp_path / "xla")
        assert (tmp_path / "xla").is_dir()
    finally:
        _restore(prev)


def test_default_config_points_home():
    cfg = Config()
    assert cfg.experiment.compilation_cache_dir == "~/.cache/framedipt_tpu/xla"


def test_none_disables(tmp_path):
    prev = jax.config.jax_compilation_cache_dir
    try:
        cfg = Config()
        cfg.experiment.compilation_cache_dir = None
        setup_compilation_cache(cfg)
        assert jax.config.jax_compilation_cache_dir == prev
        cfg.experiment.compilation_cache_dir = ""
        setup_compilation_cache(cfg)
        assert jax.config.jax_compilation_cache_dir == prev
    finally:
        _restore(prev)


def test_unwritable_path_degrades(tmp_path):
    blocker = tmp_path / "file"
    blocker.write_text("not a dir")
    prev = jax.config.jax_compilation_cache_dir
    try:
        cfg = Config()
        # mkdir under a regular file raises OSError (NotADirectoryError).
        cfg.experiment.compilation_cache_dir = str(blocker / "xla")
        setup_compilation_cache(cfg)  # must not raise
        assert jax.config.jax_compilation_cache_dir == prev
    finally:
        _restore(prev)


def test_cache_roundtrip_hits_disk(tmp_path):
    """A jitted program leaves an entry on disk once the cache is set
    (min-compile-time threshold forced to 0 for this tiny program)."""
    import jax.numpy as jnp

    from jax._src.compilation_cache import reset_cache

    prev = jax.config.jax_compilation_cache_dir
    prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
    try:
        cfg = Config()
        cfg.experiment.compilation_cache_dir = str(tmp_path / "xla")
        setup_compilation_cache(cfg)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        # The persistent cache object binds its directory at first use in
        # the process (e.g. an earlier in-process Inference() run) — rebind.
        reset_cache()

        # Constants make the HLO unique to this test: an identical program
        # compiled earlier in the pytest process would hit jax's in-memory
        # cache and never reach the disk cache.
        @jax.jit
        def f(x):
            return x * 2.7311 + 1.9173

        f(jnp.arange(11.0)).block_until_ready()
        entries = list(pathlib.Path(tmp_path / "xla").iterdir())
        assert entries, "no cache entry written"
    finally:
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", prev_min
        )
        _restore(prev)
        reset_cache()
