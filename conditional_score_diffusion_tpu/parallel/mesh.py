"""Mesh construction and sharding helpers.

The framework's distributed story (matching the reference's DDP-only scope,
SURVEY.md §2.8) is data parallelism over a 1-D ``('data',)`` mesh:

  * batch pytrees are sharded on their leading axis across ``data``;
  * model/optimizer state is replicated;
  * `jax.jit` with these shardings makes XLA insert `psum` gradient
    all-reduces over ICI — the entire DDP layer in ~50 lines.

Scaling beyond one slice needs no code change: a multi-slice mesh simply has
more devices on the same axis and XLA routes the all-reduce over ICI within
slices and DCN across them.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over all (or the first n) devices."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    mesh_devices = mesh_utils.create_device_mesh((len(devices),), devices=devices)
    return Mesh(mesh_devices, (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Leading-axis sharding for batch pytrees."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding for model/optimizer state."""
    return NamedSharding(mesh, P())


def local_batch_to_global(batch: Any, mesh: Mesh, axis_name: str = "data") -> Any:
    """Place a host-local numpy batch onto the mesh, sharded over ``data``.

    Single-process path uses `jax.device_put`; multi-process (one process per
    host on a pod) uses `jax.make_array_from_process_local_data` so each host
    contributes its local shard (the TPU-native replacement for per-rank
    DataLoaders under DDP).
    """
    sharding = batch_sharding(mesh, axis_name)
    if jax.process_count() == 1:
        return jax.device_put(batch, sharding)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        batch,
    )


def shard_train_step(train_step: Callable, mesh: Mesh, axis_name: str = "data") -> Callable:
    """Jit a ``(state, batch, rng) -> (state, metrics)`` step over the mesh.

    State in/out replicated; batch sharded on its leading axis; rng
    replicated.  Buffer donation keeps params/opt-state updates in place
    (HBM win on large models).
    """
    repl = replicated_sharding(mesh)
    data = batch_sharding(mesh, axis_name)
    # No out_shardings: with replicated inputs + in-program gradient psums the
    # outputs are already replicated, and forcing an out_sharding makes XLA
    # emit a separate cross-module reshard collective (observed to deadlock
    # the CPU in-process communicator on low-core hosts).
    return jax.jit(
        train_step,
        in_shardings=(repl, data, repl),
        donate_argnums=(0,),
    )

def shard_sampling_fn(
    sampling_fn: Callable, mesh: Mesh, axis_name: str = "data"
) -> Callable:
    """Batch-shard a ``fn(rng, params[, y]) -> (samples, info)`` sampler.

    PC sampling has no cross-sample dependencies, so sharding the sample
    batch over ``data`` scales inference linearly across chips (the v5e-8
    path of the headline benchmark; the reference's analog is Lightning DDP
    inference, `run_lib.py:55-57`).  ``rng`` and ``params`` are replicated;
    each device runs its slice of the scan.  Per-device RNG decorrelation
    comes from the batch dimension inside the sampler (one prior draw and
    one noise draw per sample), so replicated keys are correct.
    """
    repl = replicated_sharding(mesh)
    data = batch_sharding(mesh, axis_name)

    def conditional_wrapped(rng, params, y):
        return sampling_fn(rng, params, y)

    def unconditional_wrapped(rng, params):
        return sampling_fn(rng, params)

    cond = jax.jit(conditional_wrapped, in_shardings=(repl, repl, data))
    uncond = jax.jit(unconditional_wrapped, in_shardings=(repl, repl))

    def fn(rng, params, y=None):
        if y is None:
            return uncond(rng, params)
        return cond(rng, params, y)

    return fn
