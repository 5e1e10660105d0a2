"""TPU training step for triplane DDPMs.

The reference ships training scaffolding with no training script
(MixedPrecisionTrainer fp16_util.py:147-231, update_ema nn.py:54-64,
training_losses gaussian_diffusion.py:884-957; SURVEY.md §2.4). This module
is the TPU-native equivalent: one pjit-compiled train step over a
``(data, model)`` mesh — fp32 master params, bf16 forward (the UNet's
compute-dtype policy replaces hand-rolled fp16 loss scaling; bf16 needs
none), AdamW, EMA. Batch shards over ``data``; params either replicated or
tensor-parallel over ``model`` (parallel/mesh.py policy).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ishapediting_tpu.config import UNetConfig
from ishapediting_tpu.core.losses import training_losses, update_ema
from ishapediting_tpu.core.schedule import Schedule
from ishapediting_tpu.models.unet import unet_apply


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Dict
    ema_params: Dict
    opt_state: optax.OptState


def make_optimizer(
    lr: float = 1e-4, weight_decay: float = 0.0, grad_clip: float = 0.0
) -> optax.GradientTransformation:
    chain = []
    if grad_clip > 0:
        chain.append(optax.clip_by_global_norm(grad_clip))
    chain.append(optax.adamw(lr, weight_decay=weight_decay))
    return optax.chain(*chain)


def init_train_state(params: Dict, opt: optax.GradientTransformation) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        ema_params=jax.tree.map(lambda x: x, params),
        opt_state=opt.init(params),
    )


def make_train_step(
    cfg: UNetConfig,
    sched: Schedule,
    opt: optax.GradientTransformation,
    *,
    ema_rate: float = 0.9999,
    remat: bool = True,
) -> Callable[[TrainState, jnp.ndarray, jax.Array], Tuple[TrainState, Dict]]:
    """Build the (jittable / pjit-able) train step.

    batch: [B, H, W, C] normalized triplane latents in [-1, 1].
    """

    def train_step(state: TrainState, batch: jnp.ndarray, rng: jax.Array):
        r_t, r_loss, r_drop = jax.random.split(rng, 3)
        t = jax.random.randint(
            r_t, (batch.shape[0],), 0, sched.num_timesteps, jnp.int32
        )

        def loss_fn(params):
            def model_fn(x, t_orig):
                return unet_apply(
                    cfg,
                    params,
                    x,
                    t_orig,
                    train=True,
                    dropout_rng=r_drop,
                    remat=remat,
                )

            terms = training_losses(sched, model_fn, batch, t, r_loss)
            return jnp.mean(terms["loss"]), terms

        (loss, terms), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema_params = update_ema(state.ema_params, params, ema_rate)
        metrics = {
            "loss": loss,
            "mse": jnp.mean(terms["mse"]),
            "vb": jnp.mean(terms["vb"]),
            "grad_norm": optax.global_norm(grads),
        }
        return (
            TrainState(state.step + 1, params, ema_params, opt_state),
            metrics,
        )

    return train_step
