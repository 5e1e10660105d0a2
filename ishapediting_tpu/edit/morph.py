"""Latent-space shape morphing (framework extension; no reference
counterpart — the reference ships ``ddim_reverse_sample`` as dead code,
gaussian_diffusion.py:718-761, with no loop or caller).

Shapes are embedded in the diffusion noise space with the deterministic
DDIM reverse ODE (``core.diffusion.ddim_reverse_sample_loop``), interpolated
there with spherical lerp (noise vectors live near a Gaussian shell, so
slerp preserves the norm statistics a linear mix would shrink), and decoded
back with the deterministic DDIM sampler. TPU-shaped: both endpoints encode
as ONE batch-2 scan and all K interpolants decode as ONE batch-K scan —
the MXU sees two large batched trajectories, not 2+K small ones."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ishapediting_tpu.core.diffusion import (
    ddim_reverse_sample_loop,
    ddim_sample_loop,
)
from ishapediting_tpu.core.schedule import Schedule


def slerp(a: jnp.ndarray, b: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """Spherical interpolation of flattened latents; ``alpha`` may be a
    scalar or a leading batch of mix weights ([K] -> [K, *a.shape]).
    Falls back to lerp when the endpoints are (anti-)parallel."""
    a32 = a.astype(jnp.float32).reshape(-1)
    b32 = b.astype(jnp.float32).reshape(-1)
    # a zero endpoint has no direction: clamp the norms so the cosine is 0
    # (quarter-circle arc toward the other endpoint) instead of 0/0 NaNs
    na = jnp.maximum(jnp.linalg.norm(a32), 1e-12)
    nb = jnp.maximum(jnp.linalg.norm(b32), 1e-12)
    cos = jnp.clip(jnp.dot(a32 / na, b32 / nb), -1.0, 1.0)
    theta = jnp.arccos(cos)
    alpha = jnp.asarray(alpha, jnp.float32)
    w = alpha.reshape(alpha.shape + (1,))  # [..., 1] over the flat axis
    sin = jnp.sin(theta)
    safe = jnp.abs(sin) > 1e-6
    wa = jnp.where(safe, jnp.sin((1 - w) * theta) / jnp.where(safe, sin, 1.0),
                   1 - w)
    wb = jnp.where(safe, jnp.sin(w * theta) / jnp.where(safe, sin, 1.0), w)
    out = wa * a32 + wb * b32
    return out.reshape(alpha.shape + a.shape)


def morph_latents(
    sched: Schedule,
    model_fn,
    x0_a: jnp.ndarray,
    x0_b: jnp.ndarray,
    alphas: Sequence[float],
    *,
    clip_denoised: bool = True,
    rng: Optional[jax.Array] = None,
    mesh=None,
) -> jnp.ndarray:
    """Morph between two clean latents: returns [K, H, W, C] decoded
    latents at the given mix weights (alpha=0 -> a, 1 -> b; endpoints are
    DDIM round trips of the inputs, not the inputs themselves — the
    order-1 ODE discretization error is the price of a consistent
    embedding). Jittable; encode is batch-2, decode batch-K."""
    x0_a = jnp.asarray(x0_a, jnp.float32)
    x0_b = jnp.asarray(x0_b, jnp.float32)
    if x0_a.ndim == x0_b.ndim == 3:
        x0_a, x0_b = x0_a[None], x0_b[None]
    pair = jnp.concatenate([x0_a, x0_b], axis=0)  # [2, H, W, C]
    noises = ddim_reverse_sample_loop(
        sched, model_fn, pair, clip_denoised=clip_denoised
    )
    mixed = slerp(
        noises[0], noises[1], jnp.asarray(list(alphas), jnp.float32)
    )  # [K, H, W, C]
    if mesh is not None:
        # frames are independent trajectories: shard K over the data axis
        # (GSPMD keeps each chain chip-local through the whole decode scan)
        from jax.sharding import NamedSharding, PartitionSpec as P

        mixed = jax.lax.with_sharding_constraint(
            mixed, NamedSharding(mesh, P("data"))
        )
    if rng is None:
        rng = jax.random.PRNGKey(0)  # unused at eta=0 (deterministic)
    return ddim_sample_loop(
        sched, model_fn, mixed, rng, eta=0.0, clip_denoised=clip_denoised
    )
