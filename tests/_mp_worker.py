"""Worker process for the 2-process data-parallel test (run via subprocess).

Each process exposes 4 virtual CPU devices and joins a 2-process cluster
(global mesh: 8 devices), loads its half of a fixed global batch through
`local_batch_to_global` (exercising `jax.make_array_from_process_local_data`
— the per-host loading path of SURVEY §2.8), evaluates the data-parallel
loss, and writes it to a file for the parent test to compare against the
single-process value.

Usage: python _mp_worker.py <process_id> <num_processes> <coordinator_port> <out_dir>
"""

import os
import sys

proc_id = int(sys.argv[1])
nprocs = int(sys.argv[2])
port = sys.argv[3]
out_dir = sys.argv[4]

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}",
    num_processes=nprocs,
    process_id=proc_id,
)

import ml_collections  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from conditional_score_diffusion_tpu.losses import build_loss_fn  # noqa: E402
from conditional_score_diffusion_tpu.models import init_model  # noqa: E402
from conditional_score_diffusion_tpu.parallel import (  # noqa: E402
    local_batch_to_global,
    make_mesh,
    replicated_sharding,
    batch_sharding,
)
from conditional_score_diffusion_tpu.sde import build_sde  # noqa: E402


def config():
    c = ml_collections.ConfigDict()
    c.training = ml_collections.ConfigDict(
        dict(sde="vesde", continuous=True, reduce_mean=True, likelihood_weighting=True)
    )
    c.model = ml_collections.ConfigDict(
        dict(name="fcn", state_size=2, hidden_layers=1, hidden_nodes=16,
             dropout=0.0, sigma_min=0.01, sigma_max=5.0, num_scales=100,
             beta_min=0.1, beta_max=20.0, ema_rate=0.999)
    )
    c.data = ml_collections.ConfigDict(dict(shape=[2]))
    return c


def main():
    assert jax.process_count() == nprocs, jax.process_count()
    assert len(jax.devices()) == 4 * nprocs, len(jax.devices())

    c = config()
    module, params = init_model(c, jax.random.key(0))
    sde, _ = build_sde(c)
    loss_fn = build_loss_fn(c, module, sde, train=False)

    # fixed global batch; this process loads only its contiguous shard
    global_batch = np.random.RandomState(0).randn(64, 2).astype(np.float32)
    per = global_batch.shape[0] // nprocs
    local = global_batch[proc_id * per : (proc_id + 1) * per]

    mesh = make_mesh()
    assert mesh.devices.size == 4 * nprocs
    gbatch = local_batch_to_global(local, mesh)
    assert gbatch.shape[0] == global_batch.shape[0]  # global view

    rng = jax.random.key(7)
    loss = jax.jit(
        lambda p, b: loss_fn(p, sde, b, rng),
        in_shardings=(replicated_sharding(mesh), batch_sharding(mesh)),
    )(params, gbatch)
    val = float(loss)

    with open(os.path.join(out_dir, f"loss_{proc_id}.txt"), "w") as f:
        f.write(repr(val))
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
