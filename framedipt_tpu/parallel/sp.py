"""Sequence parallelism for inference: shard the N^2 edge stack over chips.

The reference is single-GPU at inference (experiments/inference.py builds
one torch module on one device; SURVEY.md §2.9). On TPU, long complexes
(pMHC-TCR cases run N~500+, and the N^2 edge tensors grow quadratically)
are the memory/compute wall, so this module adds a TPU-native scaling
dimension: a ``sp`` mesh axis over which the *row* dimension of every
[B, N, N, C] edge tensor is sharded. With the constraints below in place,
XLA's SPMD partitioner splits the edge-stack einsums by rows and inserts
the small collectives itself (all-gather of per-row node terms / attention
keys over ICI) — the scaling-book recipe: annotate, let XLA partition,
never hand-roll collectives.

Usage::

    mesh = make_sp_mesh(sp_size=4)          # (dp, sp) mesh
    run = build_inference_fn(..., sp_mesh=mesh)

The model code calls :func:`constrain_edge` / :func:`constrain_rows` at the
producer of each N^2 tensor; outside an active SP context these are
identity, so single-chip tracing is unaffected. The context is entered by
the sampler builder around tracing, so each (mesh, axis) setting owns its
own jit cache entry (the closure differs).

The fused Pallas pair-MLP and edge-embedder kernels participate in SP
runs via explicit ``shard_map`` wrappers: each device runs the kernel on
its local row block of the edge stack (rows local, columns full — see
``model/ipa.py:355`` and ``model/embed.py:252``). Only the flag-gated
IPA-attention kernel is excluded under SP; the sampler builder rejects
``use_pallas_ipa`` with an active ``sp_mesh``
(``sampling/reverse.py`` build_inference_fn).
"""
from __future__ import annotations

import contextlib
import threading
from typing import Iterator, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DP_AXIS = "dp"
SP_AXIS = "sp"

_state = threading.local()


def make_sp_mesh(
    sp_size: int,
    dp_size: int = 1,
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """(dp, sp) mesh: batch over ``dp``, edge-tensor rows over ``sp``."""
    if devices is None:
        devices = jax.devices()
    if dp_size * sp_size != len(devices):
        devices = devices[: dp_size * sp_size]
    if dp_size * sp_size != len(devices):
        raise ValueError(
            f"dp({dp_size}) * sp({sp_size}) > device count ({len(devices)})"
        )
    grid = np.asarray(devices).reshape(dp_size, sp_size)
    return Mesh(grid, (DP_AXIS, SP_AXIS))


@contextlib.contextmanager
def sp_context(mesh: Mesh | None, axis: str = SP_AXIS) -> Iterator[None]:
    """Activate row-sharding constraints for model code traced inside."""
    prev = getattr(_state, "ctx", None)
    _state.ctx = (mesh, axis) if mesh is not None else None
    try:
        yield
    finally:
        _state.ctx = prev


def active() -> tuple[Mesh, str] | None:
    return getattr(_state, "ctx", None)


def _constrain(x: jax.Array, spec: P) -> jax.Array:
    ctx = active()
    if ctx is None:
        return x
    mesh, _ = ctx
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def constrain_edge(x: jax.Array) -> jax.Array:
    """[B, N, N, C] edge tensor: shard rows (first N) over ``sp``."""
    ctx = active()
    if ctx is None:
        return x
    _, axis = ctx
    return _constrain(x, P(DP_AXIS, axis, None, None))


def constrain_rows(x: jax.Array) -> jax.Array:
    """[B, N, ...] per-row tensor (attention logits etc.): shard over sp."""
    ctx = active()
    if ctx is None:
        return x
    _, axis = ctx
    spec = [DP_AXIS, axis] + [None] * (x.ndim - 2)
    return _constrain(x, P(*spec))


def constrain_attn(x: jax.Array) -> jax.Array:
    """[B, H, N, N] attention logits: shard query rows (axis 2) over sp."""
    ctx = active()
    if ctx is None:
        return x
    _, axis = ctx
    return _constrain(x, P(DP_AXIS, None, axis, None))


def constrain_replicated(x: jax.Array) -> jax.Array:
    """Node-level tensor: replicate over sp (batch still over dp)."""
    ctx = active()
    if ctx is None:
        return x
    spec = [DP_AXIS] + [None] * (x.ndim - 1)
    return _constrain(x, P(*spec))
