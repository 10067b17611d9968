"""Mesh + sharding utilities for data-parallel (and FSDP-style) training.

The reference has only vestigial DDP traces (stripped ``module.`` prefixes,
experiments/inference.py:158; no in-tree distributed init — SURVEY.md §2.9).
On TPU this is a first-class component: a ``jax.sharding.Mesh`` over ICI
with batch sharded on the ``dp`` axis and (optionally) parameters sharded on
``fsdp``. Gradients are reduced by XLA-inserted collectives during
``jit``-compiled backprop — the NCCL-allreduce equivalent, for free.

Multi-host pods: call ``jax.distributed.initialize()`` before ``make_mesh``
and feed per-host shards via ``jax.make_array_from_process_local_data`` —
see ``shard_batch``.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DP_AXIS = "dp"
FSDP_AXIS = "fsdp"


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    initialization_timeout: int | None = None,
) -> None:
    """Multi-host initialization for TPU pods (call once before make_mesh).

    On Cloud TPU the arguments are auto-detected from the environment; pass
    them explicitly elsewhere. After this, ``jax.devices()`` spans the whole
    pod and the (dp, fsdp) mesh lays data parallelism over ICI first, DCN
    across slices — the TPU-native replacement for the reference's off-repo
    DDP/NCCL setup (SURVEY.md §2.9)."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs.update(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    if initialization_timeout is not None:
        # Coordination-service connect budget: the jax default (300 s) can
        # flake when the machine is fully loaded and the coordinator
        # process is slow to start (observed in full-suite runs under
        # concurrent TPU load).
        kwargs.update(initialization_timeout=initialization_timeout)
    jax.distributed.initialize(**kwargs)


def make_mesh(
    devices: Sequence[jax.Device] | None = None,
    dp_size: int = -1,
    fsdp_size: int = 1,
) -> Mesh:
    """Build a (dp, fsdp) mesh. dp_size=-1 uses all remaining devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if dp_size == -1:
        if n % fsdp_size:
            raise ValueError(f"{n} devices not divisible by fsdp={fsdp_size}")
        dp_size = n // fsdp_size
    want = dp_size * fsdp_size
    if want != n:
        if want < n and jax.process_count() == 1:
            # Explicit sizes below the host's device count: run on the
            # leading slice (the reference's hydra-launcher semantics — a
            # job uses its num_gpus slice of the host, config/base.yaml:147
            # + hydra.job.num device mapping). Only safe single-process:
            # a multi-host global mesh needs every process represented.
            devices = list(devices)[:want]
            n = want
        else:
            raise ValueError(
                f"dp({dp_size}) * fsdp({fsdp_size}) != device count ({n})"
            )
    grid = np.asarray(devices).reshape(dp_size, fsdp_size)
    return Mesh(grid, (DP_AXIS, FSDP_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across dp; replicate the rest."""
    return NamedSharding(mesh, P(DP_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_sharding(mesh: Mesh, param: jax.Array) -> NamedSharding:
    """FSDP-style rule: shard the largest divisible axis across ``fsdp``.

    With fsdp_size == 1 this degenerates to full replication — the right
    default at FrameDiPT's ~17M-parameter scale; the hook exists for larger
    configs.
    """
    fsdp = mesh.shape[FSDP_AXIS]
    if fsdp == 1:
        return NamedSharding(mesh, P())
    shape = param.shape
    candidates = [i for i, d in enumerate(shape) if d % fsdp == 0]
    if not candidates:
        return NamedSharding(mesh, P())
    axis = max(candidates, key=lambda i: shape[i])
    spec = [None] * len(shape)
    spec[axis] = FSDP_AXIS
    return NamedSharding(mesh, P(*spec))


def shard_params(mesh: Mesh, params: Any) -> Any:
    """Place a parameter pytree on the mesh under the FSDP rule."""
    return jax.tree_util.tree_map(
        lambda p: jax.device_put(p, param_sharding(mesh, p)), params
    )


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Place a host batch pytree on the mesh, batch-axis over dp.

    Single-process: a plain device_put with a NamedSharding. Multi-host:
    uses ``jax.make_array_from_process_local_data`` so each host contributes
    its local shard.
    """
    sharding = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), batch
        )
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        batch,
    )
