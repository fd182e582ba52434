"""Observability callbacks: sampling visualizations during training.

Reference: `lightning_callbacks/` registry (`lightning_callbacks/utils.py:2-40`)
with entries configuration / decreasing_variance_configuration / ema / base /
GradientVisualization / 2D / paired / test_paired / haar_multiscale / ...

Design note: the reference's `configuration`, `decreasing_variance_
configuration` and `ema` callbacks mutate trainer state every batch
(`callbacks.py:9-133`); in this framework those behaviors live *inside* the
jitted train step (SDE factory, sigma_y schedule, EMA update), so the
corresponding registry entries are no-op markers kept for config
compatibility.  The visualization callbacks below are genuinely host-side:
they sample with current EMA params on a schedule and write image grids /
scatter plots / evolution videos to TensorBoard (same tags as the
reference).
"""

from __future__ import annotations

import math
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import registry

register_callback = registry.callbacks.register
get_callback = registry.callbacks.get


def _viz_p_steps(config) -> int:
    """Predictor steps for visualization sampling.

    Must default to the FULL config.model.num_scales: the reverse-diffusion
    predictor discretizes against the SDE's own N (reference
    `sde_lib.py:360-372`), so sampling with fewer predictor steps than
    num_scales under-denoises (observed: pure-noise visualization grids at
    p_steps=200 on an N=1000 model).  `training.visualization_p_steps`
    optionally overrides for speed with p_steps-consistent predictors.
    """
    return int(config.training.get("visualization_p_steps", 0) or config.model.num_scales)


def image_grid(images: np.ndarray, nrow: Optional[int] = None) -> np.ndarray:
    """[B,H,W,C] in [0,1] -> one [H',W',C] grid (torchvision make_grid equivalent)."""
    B, H, W, C = images.shape
    nrow = nrow or int(math.ceil(math.sqrt(B)))
    ncol = int(math.ceil(B / nrow))
    grid = np.ones((ncol * H, nrow * W, C), dtype=np.float32)
    for i in range(B):
        r, c = divmod(i, nrow)
        grid[r * H : (r + 1) * H, c * W : (c + 1) * W] = np.clip(images[i], 0, 1)
    return grid


def scatter_figure(points: np.ndarray, title: str = "samples"):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure()
    plt.scatter(points[:, 0], points[:, 1], s=3)
    plt.title(title)
    return fig


def _log_image(trainer, tag: str, grid_hwc: np.ndarray, step: int):
    if trainer.writer is not None:
        trainer.writer.add_image(tag, np.transpose(grid_hwc, (2, 0, 1)), step)


def _log_video(trainer, tag: str, frames_thwc: np.ndarray, step: int, fps: int = 50):
    """Evolution video (reference `utils.py:create_video`, fps=50).

    tensorboardX's add_video needs moviepy; without it we degrade to a
    filmstrip image (<=16 subsampled frames side by side) under the same tag
    so the trajectory is still visible in air-gapped environments."""
    if trainer.writer is None:
        return
    frames = np.clip(frames_thwc, 0, 1)
    try:
        import moviepy  # noqa: F401

        vid = np.transpose(frames[None], (0, 1, 4, 2, 3))  # N,T,C,H,W
        trainer.writer.add_video(tag, (vid * 255).astype(np.uint8), step, fps=fps)
    except ImportError:
        stride = max(1, frames.shape[0] // 16)
        strip = np.concatenate(list(frames[::stride]), axis=1)  # [H, T'*W, C]
        _log_image(trainer, f"{tag}/filmstrip", strip, step)


class _FreqGated:
    def __init__(self, config, fn: Callable):
        freq = config.training.get("visualization_freq", 0)
        self.freq = freq or config.training.get("snapshot_freq", 5000)
        self.fn = fn

    def __call__(self, trainer, step: int):
        if step % self.freq == 0:
            self.fn(trainer, step)


@register_callback(name="configuration")
def configuration_callback(config, phase: str = "train"):
    """No-op marker: SDE/loss configuration happens inside the train step."""
    return lambda trainer, step: None


@register_callback(name="decreasing_variance_configuration")
def dv_configuration_callback(config, phase: str = "train"):
    """No-op marker: the sigma_y schedule is evaluated inside the train step
    and logged by the Trainer."""
    return lambda trainer, step: None


@register_callback(name="ema")
def ema_callback(config, phase: str = "train"):
    """No-op marker: EMA is part of the train state."""
    return lambda trainer, step: None


@register_callback(name="base")
def image_visualization_callback(config, phase: str = "train"):
    """Sample an image grid on a schedule (reference `callbacks.py:135-161`)."""

    def fn(trainer, step):
        from .tasks import create_task

        task = create_task(config, trainer.module)
        n = min(16, config.eval.batch_size)
        shape = _sample_shape(config, n)
        sampling_fn = task.sampling_fn(shape, p_steps=_viz_p_steps(config))
        show_evo = config.training.get("show_evolution", False)
        samples, info = sampling_fn(
            jax.random.key(step), trainer.state.ema.params, show_evolution=show_evo
        )
        _log_image(trainer, "generated_images", image_grid(np.asarray(samples)), step)
        if show_evo and "evolution" in info:
            evo = np.asarray(info["evolution"])[:, 0]  # first sample over time
            _log_video(trainer, "generation_evolution", evo, step)

    return _FreqGated(config, fn)


@register_callback(name="2D")
def two_d_visualization_callback(config, phase: str = "train"):
    """Scatter plot of 2-D samples (reference `callbacks.py:185-224`)."""

    def fn(trainer, step):
        from .tasks import create_task

        task = create_task(config, trainer.module)
        sampling_fn = task.sampling_fn((512, 2), p_steps=_viz_p_steps(config))
        samples, _ = sampling_fn(jax.random.key(step), trainer.state.ema.params)
        if trainer.writer is not None:
            trainer.writer.add_figure(
                "samples_2d", scatter_figure(np.asarray(samples)), step
            )

    return _FreqGated(config, fn)


@register_callback(name="GradientVisualization")
def gradient_visualization_callback(config, phase: str = "train"):
    """Score-norm-vs-t curve (reference `callbacks.py:165-183`)."""

    def fn(trainer, step):
        from ..models.wrappers import get_score_fn
        from ..sde import build_sde

        sde, _ = build_sde(config)
        score_fn = get_score_fn(
            sde, trainer.module, trainer.state.ema.params,
            conditional=False, train=False, continuous=config.training.continuous,
        )
        shape = _sample_shape(config, 16)
        rng = jax.random.key(step)
        ts = np.linspace(1e-3, 1.0, 20)
        norms = []
        for t in ts:
            vec_t = jnp.full((shape[0],), float(t))
            x = sde.prior_sampling(jax.random.fold_in(rng, int(t * 1e3)), shape)
            s = score_fn(x, vec_t)
            norms.append(float(jnp.mean(jnp.linalg.norm(s.reshape(s.shape[0], -1), axis=-1))))
        if trainer.writer is not None:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            fig = plt.figure()
            plt.plot(ts, norms)
            plt.xlabel("t")
            plt.ylabel("mean score norm")
            trainer.writer.add_figure("score_norm_vs_t", fig, step)

    return _FreqGated(config, fn)


@register_callback(name="paired")
def paired_visualization_callback(config, phase: str = "train"):
    """y | sample | ground-truth grids (reference `PairedCallback.py:41-92`);
    with ``training.show_evolution`` also logs the joint y|x sampling
    trajectory as a video (reference `PairedCallback.py:87-92`)."""

    show_evolution = config.training.get("show_evolution", False)

    def fn(trainer, step):
        from .tasks import create_task

        task = create_task(config, trainer.module)
        batch = next(trainer.datamodule.val_iterator(batch_size=min(8, config.eval.batch_size)))
        y = jnp.asarray(batch["y"])
        x_gt = np.asarray(batch["x"])
        shape = (y.shape[0],) + _xshape(config)
        sampling_fn = task.sampling_fn(shape, p_steps=_viz_p_steps(config))
        samples, info = sampling_fn(
            jax.random.key(step), trainer.state.ema.params, y,
            show_evolution=show_evolution,
        )
        rows = np.concatenate(
            [np.asarray(y)[..., :3], np.clip(np.asarray(samples), 0, 1), x_gt], axis=2
        )  # side-by-side y | sample | gt
        _log_image(trainer, "paired_y_sample_gt", image_grid(rows, nrow=1), step)
        if show_evolution and "evolution" in info:
            frames = _joint_evolution_frames(info["evolution"])
            _log_video(trainer, "val_joint_evolution", frames, step)

    return _FreqGated(config, fn)


def _normalise_per_image(x: np.ndarray) -> np.ndarray:
    """Per-image min-max to [0,1] (reference `PairedCallback.py:13-26`)."""
    lo = x.min(axis=(1, 2, 3), keepdims=True)
    hi = x.max(axis=(1, 2, 3), keepdims=True)
    return (x - lo) / (hi - lo + 1e-8)


def _joint_evolution_frames(evolution, max_frames: int = 100) -> np.ndarray:
    """[T,B,H,W,C] dict {'x','y'} -> [T',gH,gW,3] video frames: per-frame
    per-image normalization, y|x side by side, gridded
    (reference `PairedCallback.py:28-40,87-92`)."""
    ex = np.asarray(evolution["x"])
    ey = np.asarray(evolution["y"])
    stride = max(1, ex.shape[0] // max_frames)
    frames = []
    for t in range(0, ex.shape[0], stride):
        joint = np.concatenate(
            [_normalise_per_image(ey[t])[..., :3], _normalise_per_image(ex[t])[..., :3]],
            axis=2,
        )
        frames.append(image_grid(joint))
    return np.stack(frames)


def haar_supergrid(coeffs: np.ndarray) -> np.ndarray:
    """2x2 supergrid of the four Haar bands, each min-max normalized
    (reference `HaarMultiScaleCallback.py:48-62` normalise_per_band +
    create_supergrid)."""
    C = coeffs.shape[-1] // 4
    bands = [coeffs[..., i * C : (i + 1) * C] for i in range(4)]
    bands = [(b - b.min()) / (b.max() - b.min() + 1e-8) for b in bands]
    top = np.concatenate(bands[:2], axis=2)
    bot = np.concatenate(bands[2:], axis=2)
    return image_grid(np.concatenate([top, bot], axis=1))


@register_callback(name="haar_multiscale")
def haar_multiscale_callback(config, phase: str = "train"):
    """Band-normalized Haar supergrid (reference `HaarMultiScaleCallback.py:48-62`);
    with ``training.show_evolution`` also logs the supergrid trajectory video
    (reference `HaarMultiScaleCallback.py:66-91`)."""

    show_evolution = config.training.get("show_evolution", False)
    _supergrid = haar_supergrid

    def fn(trainer, step):
        from ..ops.haar import haar_backward
        from .tasks import create_task

        task = create_task(config, trainer.module)
        shape = _sample_shape(config, 4)
        sampling_fn = task.sampling_fn(shape, p_steps=_viz_p_steps(config))
        coeffs, info = sampling_fn(
            jax.random.key(step), trainer.state.ema.params,
            show_evolution=show_evolution,
        )
        coeffs = np.asarray(coeffs)
        _log_image(trainer, "haar_supergrid", _supergrid(coeffs), step)
        imgs = np.asarray(haar_backward(jnp.asarray(coeffs)))
        imgs = (imgs - imgs.min()) / (imgs.max() - imgs.min() + 1e-8)
        _log_image(trainer, "haar_reconstructed", image_grid(imgs), step)
        if show_evolution and "evolution" in info:
            evo = np.asarray(info["evolution"])
            stride = max(1, evo.shape[0] // 100)
            frames = np.stack([_supergrid(evo[t]) for t in range(0, evo.shape[0], stride)])
            _log_video(trainer, "haar_super_grid_evolution", frames, step)

    return _FreqGated(config, fn)


@register_callback(name="conditional_haar_multiscale")
def conditional_haar_multiscale_callback(config, phase: str = "train"):
    """DC-conditioned HF sampling visualization (reference
    `HaarMultiScaleCallback.py:95-122`): sample HF bands given the DC band y,
    inverse-Haar to image space, log NN-upsampled-DC | sample | GT grid."""

    show_evolution = config.training.get("show_evolution", False)

    def fn(trainer, step):
        from ..ops.haar import haar_backward
        from .tasks import create_task

        task = create_task(config, trainer.module)
        batch = next(trainer.datamodule.val_iterator(batch_size=min(4, config.eval.batch_size)))
        y = jnp.asarray(batch["y"])  # DC coefficients
        x_gt = jnp.asarray(batch["x"])  # HF coefficients
        shape = (y.shape[0],) + _xshape(config)
        sampling_fn = task.sampling_fn(shape, p_steps=_viz_p_steps(config))
        sampled_hf, _ = sampling_fn(
            jax.random.key(step), trainer.state.ema.params, y,
            show_evolution=show_evolution,
        )
        orig = np.asarray(haar_backward(jnp.concatenate([y, x_gt], axis=-1)))
        sampled = np.asarray(haar_backward(jnp.concatenate([y, sampled_hf], axis=-1)))
        dc_interp = np.asarray(_nearest_up(y, 2))[..., :3]
        rows = np.concatenate(
            [_normalise_per_image(v) for v in (dc_interp, sampled, orig)], axis=2
        )
        _log_image(trainer, "conditional_haar_samples", image_grid(rows, nrow=1), step)

    return _FreqGated(config, fn)


def _sr_visualization(config, factor_fn, tag):
    """LR(NN-interp) | SR sample | GT grids (reference
    `HaarMultiScaleCallback.py:124-174`, bicubic_SR and KxSR)."""

    show_evolution = config.training.get("show_evolution", False)

    def fn(trainer, step):
        from .tasks import create_task

        task = create_task(config, trainer.module)
        batch = next(trainer.datamodule.val_iterator(batch_size=min(4, config.eval.batch_size)))
        y = jnp.asarray(batch["y"])
        x_gt = np.asarray(batch["x"])
        shape = (y.shape[0],) + _xshape(config)
        sampling_fn = task.sampling_fn(shape, p_steps=_viz_p_steps(config))
        samples, _ = sampling_fn(
            jax.random.key(step), trainer.state.ema.params, y,
            show_evolution=show_evolution,
        )
        factor = factor_fn(config)
        up_y = np.asarray(_nearest_up(y, factor))
        rows = np.concatenate(
            [_normalise_per_image(v) for v in (up_y, np.asarray(samples), x_gt)],
            axis=2,
        )
        _log_image(trainer, tag, image_grid(rows, nrow=1), step)

    return _FreqGated(config, fn)


@register_callback(name="bicubic_SR")
def bicubic_sr_callback(config, phase: str = "train"):
    return _sr_visualization(config, lambda c: 2, "bicubic_SR_samples")


@register_callback(name="KxSR")
def kx_sr_callback(config, phase: str = "train"):
    return _sr_visualization(
        config, lambda c: int(c.data.get("scale", 2)), "KxSR_samples"
    )


@register_callback(name="2DVisualization")
def two_d_visualization_alias(config, phase: str = "train"):
    """Reference registry name for the 2-D scatter callback
    (`callbacks.py:185`)."""
    return two_d_visualization_callback(config, phase)


@register_callback(name="test_paired")
def test_paired_callback(config, phase: str = "train"):
    """Reference `PairedCallback.py:94-259` runs the full test harness as a
    Lightning callback under trainer.test; here --mode test drives
    `eval/harness.run_test` directly, so at train time this is a no-op
    marker (configs list it in `eval.callbacks`)."""

    def fn(trainer, step):
        return None

    return fn


def _nearest_up(x, factor):
    B, H, W, C = x.shape
    return jax.image.resize(x, (B, H * factor, W * factor, C), method="nearest")


@register_callback(name="paired3D")
def paired3d_visualization_callback(config, phase: str = "train"):
    """Volume visualization: middle slices along the three axes of
    y | sample | ground truth (reference `PairedCallback.py:261-349`)."""

    def fn(trainer, step):
        from .tasks import create_task

        task = create_task(config, trainer.module)
        batch = next(trainer.datamodule.val_iterator(batch_size=2))
        y = jnp.asarray(batch["y"])
        x_gt = np.asarray(batch["x"])
        shape = (y.shape[0],) + _xshape(config)
        sampling_fn = task.sampling_fn(shape, p_steps=min(100, config.model.num_scales))
        samples, _ = sampling_fn(jax.random.key(step), trainer.state.ema.params, y)
        samples = np.clip(np.asarray(samples), 0, 1)
        # reconstruction scalar (reference `PairedCallback.py:341-343`)
        rec = float(np.mean(np.abs(x_gt - samples)))
        if trainer.writer is not None:
            trainer.writer.add_scalar("val_rec_loss_pc", rec, step)
        # vols: [B, D, H, W, C]; middle slice per axis + fly-through videos
        # (reference `PairedCallback.py:277-329` slices every frame of each
        # axis into a y | sample | gt grid video)
        yv, gv = np.asarray(y), x_gt
        for axis, name in [(1, "axial"), (2, "coronal"), (3, "sagittal")]:
            mid = samples.shape[axis] // 2
            sl = lambda v, i=mid: np.take(v, i, axis=axis)
            rows = np.concatenate([sl(yv), sl(samples), sl(gv)], axis=2)
            if rows.shape[-1] == 1:
                rows = np.repeat(rows, 3, axis=-1)
            _log_image(trainer, f"paired3D_{name}", image_grid(rows, nrow=1), step)
            frames = []
            for i in range(samples.shape[axis]):
                f = np.concatenate(
                    [_normalise_per_image(np.take(v, i, axis=axis)) for v in (yv, samples, gv)],
                    axis=2,
                )
                if f.shape[-1] == 1:
                    f = np.repeat(f, 3, axis=-1)
                frames.append(image_grid(f, nrow=1))
            _log_video(trainer, f"paired_video_dim_{name}", np.stack(frames), step, fps=10)

    return _FreqGated(config, fn)


def _xshape(config):
    if "shape_x" in config.data:
        c, h, w = config.data.shape_x
        return (h, w, c)
    c, *spatial = config.data.shape
    return tuple(spatial) + (c,)


def _sample_shape(config, n):
    return (n,) + _xshape(config)


def get_callbacks(config, phase: str = "train") -> List[Callable]:
    """Reference `lightning_callbacks/utils.py:24-40`: assemble the callback
    list for a phase from the config."""
    if phase != "train":
        return []  # test flow is eval/harness.py
    names = ["configuration", "ema"]
    from .schedules import is_decreasing_variance

    if is_decreasing_variance(config):
        names[0] = "decreasing_variance_configuration"
    viz = config.training.get("visualization_callback", None)
    if viz:
        if viz not in registry.callbacks:
            raise ValueError(
                f"Unknown visualization_callback: {viz!r}; registered: "
                f"{sorted(registry.callbacks.names())}"
            )
        names.append(viz)
    return [get_callback(n)(config, phase) for n in names]
