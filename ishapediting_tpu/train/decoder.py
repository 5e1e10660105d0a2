"""Joint triplane-decoder training: shared occupancy MLP + per-object planes.

This is the upstream capability that produced the released ``*_decoder.pt``
checkpoints (MultiTriplane over num_objs objects, reference:
axisnetworks.py:517-575 + dataset_3d.py): optimize one shared
Fourier+MLP head and a [num_objs, 3, H, W, C] plane bank against occupancy
labels, with the smoothness/TV/L2 regularizers of the direct fit
(reference loss recipe: drag_utils.py:516-531).
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ishapediting_tpu.edit.fit import bce_with_logits
from ishapediting_tpu.ops.triplane import (
    decode_points,
    init_decoder_params,
    l2_reg,
    tv_reg,
)


def init_plane_bank(
    rng: jax.Array, num_objs: int, resolution: int = 128, channels: int = 32
) -> jnp.ndarray:
    """[num_objs, 3, H, W, C], init scale 0.001 (reference: axisnetworks.py:523)."""
    return (
        jax.random.normal(
            rng, (num_objs, 3, resolution, resolution, channels), jnp.float32
        )
        * 0.001
    )


def make_decoder_train_step(
    *,
    lr: float = 1e-3,
    smooth_weight: float = 0.3,
    l2_weight: float = 0.001,
    tv_weight: float = 0.01,
):
    """Build (opt, step). step(params, planes_bank, opt_state, obj_idx,
    coords, labels, rng) -> (params, planes_bank, opt_state, metrics)."""
    opt = optax.adam(lr)

    @jax.jit
    def step(params, planes_bank, opt_state, obj_idx, coords, labels, rng):
        def loss_fn(args):
            p, bank = args
            planes = bank[obj_idx]
            logits = decode_points(p, planes, coords)
            loss = bce_with_logits(logits, labels[:, None])
            k1, k2 = jax.random.split(rng)
            rand = jax.random.uniform(k1, coords.shape, jnp.float32, -1.0, 1.0)
            offs = rand + 1e-2 * jax.random.normal(k2, coords.shape)
            smooth = jnp.mean(
                jnp.square(
                    decode_points(p, planes, rand) - decode_points(p, planes, offs)
                )
            )
            loss = loss + smooth_weight * smooth
            loss = loss + l2_weight * l2_reg(planes) + tv_weight * tv_reg(planes)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)((params, planes_bank))
        updates, opt_state = opt.update(grads, opt_state)
        params, planes_bank = optax.apply_updates((params, planes_bank), updates)
        return params, planes_bank, opt_state, {"loss": loss}

    return opt, step


def train_decoder(
    batches: Iterator[Tuple[int, np.ndarray, np.ndarray]],
    *,
    num_objs: int,
    steps: int,
    resolution: int = 128,
    channels: int = 32,
    mapping: int = 64,
    hidden: int = 128,
    seed: int = 0,
    lr: float = 1e-3,
    log_every: int = 100,
) -> Tuple[Dict, jnp.ndarray]:
    """Train the shared decoder + plane bank; returns (decoder_params,
    planes_bank)."""
    from ishapediting_tpu.utils.logger import get_logger

    logger = get_logger()
    rng = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(rng)
    params = init_decoder_params(
        k1, in_channels=channels, mapping=mapping, hidden=hidden
    )
    bank = init_plane_bank(k2, num_objs, resolution, channels)
    opt, step = make_decoder_train_step(lr=lr)
    opt_state = opt.init((params, bank))
    for i in range(steps):
        obj_idx, coords, labels = next(batches)
        rng, sub = jax.random.split(rng)
        params, bank, opt_state, metrics = step(
            params, bank, opt_state, obj_idx,
            jnp.asarray(coords), jnp.asarray(labels), sub,
        )
        if i % log_every == 0:
            logger.log(f"decoder step {i}: loss {float(metrics['loss']):.4f}")
    return params, bank
