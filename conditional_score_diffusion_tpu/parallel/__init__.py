"""Device-mesh parallelism utilities.

Reference equivalent: PyTorch-Lightning DDP (`run_lib.py:55-57`,
``accelerator='ddp'`` when ``gpus > 1``) — implicit NCCL gradient
all-reduce.  TPU-native replacement (SURVEY.md §2.8): one
`jax.sharding.Mesh` over all chips; the train step is jitted with the batch
sharded over the ``data`` axis and the state replicated, so XLA emits the
gradient all-reduce as ICI collectives automatically.
"""

from .mesh import (
    batch_sharding,
    local_batch_to_global,
    make_mesh,
    replicated_sharding,
    shard_sampling_fn,
    shard_train_step,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "local_batch_to_global",
    "shard_train_step",
    "shard_sampling_fn",
]
