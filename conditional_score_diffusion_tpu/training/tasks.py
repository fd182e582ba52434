"""Task definitions — the functional equivalents of the reference's
Lightning modules.

Reference: `lightning_modules/` registry names
(`lightning_modules/utils.py:2-28`):
  * ``base``                                  -> :class:`BaseTask`
  * ``conditional``                           -> :class:`ConditionalTask`
  * ``conditional_decreasing_variance``       -> :class:`DecreasingVarianceConditionalTask`
  * ``haar_conditional_decreasing_variance``  -> :class:`HaarDecreasingVarianceConditionalTask`
  * ``haar_multiscale``                       -> :class:`HaarMultiScaleTask`

A Task owns no mutable state: it binds config + module into pure functions
(SDE factory, batch preparation, sampling), which the Trainer and the test
harness drive.  The reference's stateful pieces map as:
  * ``configure_sde``        -> :meth:`Task.sde_for_step` (traced sigma_y)
  * ``training_step`` loss   -> `training.steps.make_train_step`
  * ``sample``               -> :meth:`Task.sampling_fn`
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

from .. import registry
from ..ops import haar as haar_ops
from ..sampling import get_conditional_sampling_fn, get_inpainting_fn, get_sampling_fn
from ..sde import build_sde
from .schedules import sigma_y_at_step

register_trainable = registry.trainables.register
get_trainable = registry.trainables.get


def create_task(config, module):
    name = config.training.get("lightning_module", "base")
    return get_trainable(name)(config, module)


@register_trainable(name="base")
class BaseTask:
    """Unconditional generative model (reference `BaseSdeGenerativeModel.py:13-96`)."""

    conditional = False

    def __init__(self, config, module):
        self.config = config
        self.module = module
        self.sde, self.sampling_eps = build_sde(config)

    def sde_for_step(self, step):
        return self.sde

    def prepare_batch(self, batch):
        """Host/device batch normalization hook; identity by default."""
        return batch

    def sampling_fn(self, shape, **overrides) -> Callable:
        """Returns ``fn(rng, params) -> (samples, info)``
        (reference `BaseSdeGenerativeModel.sample`)."""
        return get_sampling_fn(
            self.config, self.sde, shape, self.sampling_eps, self.module, **overrides
        )

    def inpainting_fn(self, n_steps_each: int = 1) -> Callable:
        return get_inpainting_fn(
            self.config, self.sde, self.sampling_eps, self.module, n_steps_each
        )


@register_trainable(name="conditional")
class ConditionalTask(BaseTask):
    """CDE/CDiffE/CMDE (reference `ConditionalSdeGenerativeModel.py:12-85`)."""

    conditional = True

    def sampling_fn(self, shape, **overrides) -> Callable:
        """Returns ``fn(rng, params, y) -> (samples, info)``."""
        return get_conditional_sampling_fn(
            self.config, self.sde, shape, self.sampling_eps, self.module, **overrides
        )


@register_trainable(name="conditional_decreasing_variance")
class DecreasingVarianceConditionalTask(ConditionalTask):
    """VS-CMDE (reference `ConditionalSdeGenerativeModel.py:136-199` +
    `callbacks.py:23-116`): sigma_y follows the inverse-multiplicative
    schedule; at a given step the SDE is reconstructed with the scheduled
    (possibly traced) sigma_y."""

    def sde_for_step(self, step):
        smin_y, smax_y = sigma_y_at_step(self.config, step)
        sde, _ = build_sde(self.config, sigma_min_y=smin_y, sigma_max_y=smax_y)
        return sde

    def reconfigure(self, step: int):
        """Test-time restoration (reference `callbacks.py:75-78`)."""
        smin_y, smax_y = sigma_y_at_step(self.config, step)
        self.sde, self.sampling_eps = build_sde(
            self.config, sigma_min_y=float(smin_y), sigma_max_y=float(smax_y)
        )
        return self.sde


@register_trainable(name="deprecated_conditional_decreasing_variance")
class DeprecatedDecreasingVarianceConditionalTask(DecreasingVarianceConditionalTask):
    """Older single-sigma variant (reference
    `ConditionalSdeGenerativeModel.py:87-134`): only sigma_max_y is
    annealed; sigma_min_y stays at its config value."""

    def sde_for_step(self, step):
        _, smax_y = sigma_y_at_step(self.config, step)
        sde, _ = build_sde(self.config, sigma_max_y=smax_y)
        return sde

    def reconfigure(self, step: int):
        _, smax_y = sigma_y_at_step(self.config, step)
        self.sde, self.sampling_eps = build_sde(
            self.config, sigma_max_y=float(smax_y)
        )
        return self.sde


@register_trainable(name="haar_conditional_decreasing_variance")
class HaarDecreasingVarianceConditionalTask(DecreasingVarianceConditionalTask):
    """VS-CMDE in Haar space (reference
    `ConditionalSdeGenerativeModel.py:201-221`): exposes the fixed
    orthonormal Haar transform with band permutation."""

    haar_forward = staticmethod(haar_ops.haar_forward)
    haar_backward = staticmethod(haar_ops.haar_backward)
    get_dc_coefficients = staticmethod(haar_ops.get_dc_coefficients)
    get_hf_coefficients = staticmethod(haar_ops.get_hf_coefficients)


@register_trainable(name="haar_multiscale")
class HaarMultiScaleTask(BaseTask):
    """Unconditional model trained in Haar coefficient space
    (reference `HaarMultiScaleSdeGenerativeModel.py:41-89`): image batches
    are Haar-transformed on device before the loss; sampling can return
    either coefficient space or image space; HF bands can be inpainted
    given DC coefficients."""

    haar_forward = staticmethod(haar_ops.haar_forward)
    haar_backward = staticmethod(haar_ops.haar_backward)

    def prepare_batch(self, batch):
        # level-0 data are images -> transform; deeper levels are stored
        # as coefficients already (reference `HaarDecomposedDataset`).
        if self.config.data.get("level", 0) == 0 and batch.shape[-1] == 3:
            return haar_ops.haar_forward(jnp.asarray(batch))
        return batch

    def sampling_fn(self, shape, space: str = "haar", **overrides) -> Callable:
        base_fn = get_sampling_fn(
            self.config, self.sde, shape, self.sampling_eps, self.module, **overrides
        )
        if space == "haar":
            return base_fn

        def image_fn(rng, params, **kw):
            samples, info = base_fn(rng, params, **kw)
            return haar_ops.haar_backward(samples), info

        return image_fn

    def inpaint_hf(self, rng, params, dc_coefficients, n_steps_each: int = 1):
        """Fill the HF bands given DC coefficients via masked PC inpainting
        (reference `HaarMultiScaleSdeGenerativeModel.inpaint`, with its
        torch `.astype` crash fixed)."""
        C = dc_coefficients.shape[-1]
        B, H, W, _ = dc_coefficients.shape
        full = jnp.concatenate(
            [dc_coefficients, jnp.zeros((B, H, W, 3 * C), dc_coefficients.dtype)], axis=-1
        )
        mask = jnp.zeros_like(full).at[..., :C].set(1.0)
        fn = self.inpainting_fn(n_steps_each)
        return fn(rng, params, full, mask)
