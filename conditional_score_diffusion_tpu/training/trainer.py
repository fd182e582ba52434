"""Host-side training loop.

Reference: `pl.Trainer.fit` orchestration (`run_lib.py:33-75`) + the
callback layer.  The device-side work is a single sharded jitted step; this
loop only feeds batches, logs scalars, runs periodic eval, snapshots
checkpoints, and (for visual configs) samples.

TensorBoard tags mirror the reference (`train_loss`, `eval_loss`,
`sigma_max_y`, ... — SURVEY.md §5 observability).
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, Optional

import jax
import numpy as np

from ..data import create_datamodule
from ..models import init_model
from ..parallel import local_batch_to_global, make_mesh, replicated_sharding, shard_train_step
from .checkpoint import CheckpointManager
from .schedules import is_decreasing_variance, sigma_y_at_step
from .state import create_train_state
from .steps import make_eval_step, make_train_step


class Trainer:
    def __init__(self, config, log_path: str, checkpoint_path: Optional[str] = None):
        self.config = config
        self.log_path = log_path
        self.checkpoint_path = checkpoint_path
        os.makedirs(log_path, exist_ok=True)

        self.mesh = make_mesh()
        self.datamodule = create_datamodule(config)
        self.datamodule.setup()

        rng = jax.random.key(config.seed)
        self.module, params = init_model(config, rng)

        from .tasks import create_task

        self.task = create_task(config, self.module)

        train_step, tx = make_train_step(config, self.module)
        self.state = create_train_state(config, params, tx)
        self.train_step = shard_train_step(train_step, self.mesh)

        eval_step = make_eval_step(config, self.module)
        repl = replicated_sharding(self.mesh)
        from ..parallel import batch_sharding

        self.eval_step = jax.jit(
            eval_step,
            in_shardings=(repl, batch_sharding(self.mesh), repl),
        )

        self.ckpt = CheckpointManager(
            os.path.join(log_path, "checkpoints"),
            max_to_keep=3,
            save_interval=1,
        )
        if checkpoint_path:
            restore_mgr = CheckpointManager(checkpoint_path)
            self.state = restore_mgr.restore(self.state)
            restore_mgr.close()
        elif self.ckpt.latest_step() is not None:
            self.state = self.ckpt.restore(self.state)

        try:
            from tensorboardX import SummaryWriter

            self.writer = SummaryWriter(log_path)
        except ImportError:  # pragma: no cover
            self.writer = None
        self.callback_failures: Dict[str, int] = {}

    def log_scalar(self, tag: str, value: float, step: int):
        if self.writer is not None:
            self.writer.add_scalar(tag, value, step)

    def run_eval(self, rng) -> float:
        # 0 (the default) = full validation split, matching the reference's
        # behavior; set config.eval.max_val_batches to bound long val passes
        max_batches = int(self.config.eval.get("max_val_batches", 0) or 0)
        losses = []
        for i, batch in enumerate(self.datamodule.val_iterator()):
            if max_batches and i >= max_batches:
                break
            batch = self.task.prepare_batch(batch)
            gbatch = local_batch_to_global(np.asarray(batch) if not isinstance(batch, dict)
                                           else batch, self.mesh)
            m = self.eval_step(self.state, gbatch, jax.random.fold_in(rng, i))
            losses.append(float(m["eval_loss"]))
        return float(np.mean(losses)) if losses else float("nan")

    def fit(self, max_steps: Optional[int] = None, callbacks=None) -> Dict[str, Any]:
        config = self.config
        if callbacks is None:
            from .callbacks import get_callbacks

            callbacks = get_callbacks(config, phase="train")
        n_iters = max_steps if max_steps is not None else config.training.n_iters
        log_freq = config.training.get("log_freq", 250)
        eval_freq = config.training.get("eval_freq", 2500)
        snapshot_freq = config.training.get("snapshot_freq", 5000)

        rng = jax.random.key(config.seed + 1)
        from ..data.native import PrefetchIterator

        train_iter = PrefetchIterator(self.datamodule.train_iterator(), depth=2)
        history = {"train_loss": [], "eval_loss": []}
        t_last = time.time()
        # sustained-throughput window anchor: the step the current timing
        # window started at.  Windows span only uninterrupted train steps —
        # the anchor is re-set after eval/snapshot/callback boundaries so
        # ms_per_step / train_imgs_per_sec never absorb host-side work, and
        # n_window is exact even when a resume step isn't log_freq-aligned.
        window_step = int(self.state.step)

        # SURVEY.md §5: the reference has no tracing; here a device trace can
        # be captured around training steps via CSDT_PROFILE_DIR.
        profile_dir = os.environ.get("CSDT_PROFILE_DIR")
        profile_steps = int(os.environ.get("CSDT_PROFILE_STEPS", "10"))

        start = int(self.state.step)
        for step in range(start, n_iters):
            if profile_dir and step == start + 2:
                jax.profiler.start_trace(profile_dir)
            if profile_dir and step == start + 2 + profile_steps:
                jax.profiler.stop_trace()
                print(f"[profiler] trace written to {profile_dir}", flush=True)
                profile_dir = None
            batch = self.task.prepare_batch(next(train_iter))
            gbatch = local_batch_to_global(np.asarray(batch) if not isinstance(batch, dict)
                                           else batch, self.mesh)
            self.state, metrics = self.train_step(self.state, gbatch, rng)

            if (step + 1) % log_freq == 0 or step == start:
                loss = float(metrics["loss"])
                history["train_loss"].append((step + 1, loss))
                self.log_scalar("train_loss", loss, step + 1)
                if is_decreasing_variance(config):
                    smin, smax = sigma_y_at_step(config, step + 1)
                    self.log_scalar("sigma_max_y", float(smax), step + 1)
                    self.log_scalar("sigma_min_y", float(smin), step + 1)
                dt = time.time() - t_last
                t_last = time.time()
                # sustained window throughput (first window includes compile)
                n_window = max(step + 1 - window_step, 1)
                window_step = step + 1
                ms_step = dt / n_window * 1e3
                imgs_s = config.training.batch_size * n_window / dt
                self.log_scalar("ms_per_step", ms_step, step + 1)
                self.log_scalar("train_imgs_per_sec", imgs_s, step + 1)
                # the exact step count behind this window, so sustained
                # numbers are auditable (ADVICE r4: unaligned resumes used
                # to overstate img/s by assuming a full log_freq window)
                self.log_scalar("window_steps", n_window, step + 1)
                print(
                    f"step {step + 1}: loss={loss:.5f} ({dt:.1f}s, "
                    f"{ms_step:.1f} ms/step, {imgs_s:.1f} img/s)",
                    flush=True,
                )

            t_host0 = time.time()
            if (step + 1) % eval_freq == 0:
                eval_loss = self.run_eval(jax.random.fold_in(rng, step))
                history["eval_loss"].append((step + 1, eval_loss))
                self.log_scalar("eval_loss", eval_loss, step + 1)

            if (step + 1) % snapshot_freq == 0 or (step + 1) == n_iters:
                self.ckpt.save(int(self.state.step), self.state, force=True)

            for cb in callbacks:
                try:
                    cb(self, step + 1)
                except Exception as e:  # visualization must never kill training
                    # surface the failure (TB text + counter) so a permanently
                    # broken callback is visible in long runs, not just stdout
                    name = type(cb).__name__
                    msg = f"{type(e).__name__}: {e}"
                    print(f"[callback {name}] {msg}", flush=True)
                    self.callback_failures[name] = self.callback_failures.get(name, 0) + 1
                    self.log_scalar(f"callback_failures/{name}",
                                    self.callback_failures[name], step + 1)
                    if self.writer is not None:
                        self.writer.add_text(f"callback_errors/{name}", msg, step + 1)

            # eval/snapshot/callback time must not leak into the next
            # sustained-throughput window: re-anchor if host work was real.
            if time.time() - t_host0 > 0.05:
                t_last = time.time()
                window_step = step + 1

        self.ckpt.wait()
        return history


def train(config, log_path: str, checkpoint_path: Optional[str] = None,
          max_steps: Optional[int] = None) -> Dict[str, Any]:
    """Reference `run_lib.train` equivalent."""
    trainer = Trainer(config, log_path, checkpoint_path)
    return trainer.fit(max_steps=max_steps)
