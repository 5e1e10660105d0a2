"""Real-shape fitting: mesh -> triplane latent.

Two fitters matching the reference:

- ``fit_guided``: classifier-guided DDPM reconstruction — at every sampling
  step, the BCE between decoded occupancy of the *predicted x0* and the
  mesh's occupancy labels is differentiated back to the latent and applied as
  classifier guidance (reference: drag_utils.py:401-471). The whole loop is
  one ``lax.scan``; each step draws a fresh 40k-point batch by indexing the
  200k-point pool with a folded rng.

- ``fit_direct``: the direct-Adam alternative, optimizing the physical
  planes against BCE + smoothness + TV + L2 (reference:
  drag_utils.py:473-550, kept because it is a useful option).

Occupancy labeling of the sampled points is host-side (geometry/occupancy).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ishapediting_tpu.config import FitConfig
from ishapediting_tpu.core.diffusion import guided_sample_loop, p_sample_guidance
from ishapediting_tpu.core.schedule import Schedule
from ishapediting_tpu.geometry.mesh import TriMesh
from ishapediting_tpu.geometry.occupancy import points_occupancy
from ishapediting_tpu.ops.triplane import decode_points, l2_reg, tv_reg


def sample_training_points(
    mesh: TriMesh, cfg: FitConfig, seed: int = 0
) -> Tuple[np.ndarray, np.ndarray]:
    """50% uniform in [-1,1]^3 + 50% near-surface with sigma=0.01 jitter,
    occupancy-labeled (reference: drag_utils.py:431-437)."""
    rng = np.random.default_rng(seed)
    n_uniform = int(cfg.points_size * cfg.points_uniform_ratio)
    uniform = (rng.random((n_uniform, 3)) * 2 - 1).astype(np.float32)
    surface = mesh.sample_points_uniformly(
        cfg.points_size - n_uniform, seed=seed + 1
    ).astype(np.float32)
    surface = surface + cfg.surface_jitter * rng.standard_normal(
        surface.shape
    ).astype(np.float32)
    points = np.concatenate([uniform, surface], axis=0)
    occ = points_occupancy(mesh, points).astype(np.float32)
    return points, occ


def bce_with_logits(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean BCEWithLogits, numerically stable."""
    return jnp.mean(
        jnp.maximum(logits, 0.0)
        - logits * labels
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def latent_to_planes(
    latent: jnp.ndarray, half_range: jnp.ndarray, middle: jnp.ndarray
) -> jnp.ndarray:
    """[1, H, W, 96] normalized latent -> [3, H, W, 32] physical planes
    (reference: drag_utils.py:295,449-450). Channel groups are contiguous:
    plane p <- channels [32p, 32p+32)."""
    tri = latent * half_range + middle
    h, w, c = tri.shape[1:]
    return tri[0].reshape(h, w, 3, c // 3).transpose(2, 0, 1, 3)


def latents_to_planes(
    latents: jnp.ndarray, half_range: jnp.ndarray, middle: jnp.ndarray
) -> jnp.ndarray:
    """Batched ``latent_to_planes``: [B, H, W, 96] -> [B, 3, H, W, 32]."""
    tri = latents * half_range + middle
    b, h, w, c = tri.shape
    return tri.reshape(b, h, w, 3, c // 3).transpose(0, 3, 1, 2, 4)


def fit_guided(
    sched: Schedule,
    model_fn: Callable,
    decoder: Dict,
    points: jnp.ndarray,  # [P, 3] or [B, P, 3]
    occupancies: jnp.ndarray,  # [P] or [B, P]
    half_range: jnp.ndarray,
    middle: jnp.ndarray,
    rng: jax.Array,
    *,
    latent_shape: Tuple[int, int, int],
    batch_points: int = 40_000,
    scale: float = 600.0,
    clip_denoised: bool = True,
) -> jnp.ndarray:
    """Classifier-guided reconstruction; returns the fitted normalized latents
    [B, H, W, 96].

    The reference fits strictly one shape (drag_utils.py:401-471); passing
    ``points``/``occupancies`` with a leading shape axis fits B shapes in one
    program — each shape gets its own BCE term (summed, so the per-shape
    latent gradient is identical to a B=1 run at the same ``scale``), and all
    B UNet evaluations batch through the model together. The trajectory runs
    through ``core.diffusion.guided_sample_loop``; this function contributes
    the per-step BCE guidance closure."""
    if points.ndim == 2:
        points = points[None]
        occupancies = occupancies[None]
    b = points.shape[0]
    p_total = points.shape[1]
    rng, init_rng = jax.random.split(rng)
    x = jax.random.normal(init_rng, (b,) + tuple(latent_shape), jnp.float32)

    def guidance(img, tb, step_rng):
        r_noise, r_batch = jax.random.split(step_rng)
        idx = jax.random.randint(r_batch, (b, batch_points), 0, p_total)
        coords = jnp.take_along_axis(points, idx[..., None], axis=1)
        labels = jnp.take_along_axis(occupancies, idx, axis=1)[..., None]

        def loss_fn(im):
            out = p_sample_guidance(
                sched, model_fn, im, tb, r_noise, clip_denoised=clip_denoised
            )
            planes = latents_to_planes(out["pred_xstart"], half_range, middle)
            logits = jax.vmap(lambda p, c: decode_points(decoder, p, c))(
                planes, coords
            )
            per_shape = jax.vmap(bce_with_logits)(logits, labels)
            loss = -jnp.sum(per_shape)
            return loss, (out["sample"], out["variance"])

        (_, (sample, variance)), grad = jax.value_and_grad(
            loss_fn, has_aux=True
        )(img)
        return scale * grad, sample, variance

    return guided_sample_loop(sched, x, rng, guidance_fn=guidance)


def fit_direct(
    decoder: Dict,
    points: jnp.ndarray,
    occupancies: jnp.ndarray,
    half_range: jnp.ndarray,
    middle: jnp.ndarray,
    means: Optional[np.ndarray],
    stds: Optional[np.ndarray],
    rng: jax.Array,
    cfg: FitConfig,
    *,
    latent_shape: Tuple[int, int, int],
    _eager_loop: bool = False,
) -> jnp.ndarray:
    """Direct Adam fit of the physical planes (reference: drag_utils.py:473-550).

    The optimization runs as ONE jitted ``lax.scan`` over all
    ``opt_epochs * steps_per_epoch`` Adam steps (the reference runs an eager
    torch loop); ``_eager_loop=True`` selects the per-step-dispatch variant,
    kept only for the bit-parity test.

    Returns the *normalized* latent [1, H, W, 96] ((tri - middle)/half_range,
    reference: drag_utils.py:547)."""
    h, w, c = latent_shape
    rng, init_rng = jax.random.split(rng)
    init = jax.random.normal(init_rng, (1, h, w, c), jnp.float32)
    if means is not None and stds is not None:
        init = init * jnp.asarray(stds) + jnp.asarray(means)
    else:
        # no category statistics: fall back to the decoder-training plane
        # init scale (reference: axisnetworks.py:523, randn * 0.001)
        init = init * 0.001
    planes = init[0].reshape(h, w, 3, c // 3).transpose(2, 0, 1, 3)

    opt = optax.adam(cfg.opt_lr, b1=0.9, b2=0.999)
    opt_state = opt.init(planes)
    p_total = points.shape[0]
    steps_per_epoch = max(1, p_total // cfg.batch_points)
    total_steps = cfg.opt_epochs * steps_per_epoch

    def train_step(decoder, points, occupancies, planes, opt_state, key):
        k_batch, k_rand, k_off = jax.random.split(key, 3)
        idx = jax.random.randint(k_batch, (cfg.batch_points,), 0, p_total)
        coords = points[idx]
        labels = occupancies[idx][:, None]

        def loss_fn(p):
            logits = decode_points(decoder, p, coords)
            loss = bce_with_logits(logits, labels)
            rand_coord = jax.random.uniform(
                k_rand, coords.shape, jnp.float32, -1.0, 1.0
            )
            offset = rand_coord + 1e-2 * jax.random.normal(k_off, coords.shape)
            pred_a = decode_points(decoder, p, rand_coord)
            pred_b = decode_points(decoder, p, offset)
            loss = loss + cfg.opt_smooth_weight * jnp.mean(
                jnp.square(pred_a - pred_b)
            )
            loss = loss + cfg.opt_l2_weight * l2_reg(p)
            loss = loss + cfg.opt_tv_weight * tv_reg(p)
            return loss

        grads = jax.grad(loss_fn)(planes)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(planes, updates), opt_state

    if _eager_loop:
        # Per-step-dispatch reference path, kept only so tests can assert the
        # scan below is bit-identical to it. ~28 ms/dispatch on the tunnel
        # makes this path crawl at real recipes — never use it in product.
        step_jit = jax.jit(train_step)
        for _ in range(total_steps):
            rng, key = jax.random.split(rng)
            planes, opt_state = step_jit(
                decoder, points, occupancies, planes, opt_state, key
            )
    else:
        # One compiled program: lax.scan over (epochs x steps_per_epoch) with
        # the rng carried and split exactly like the eager loop, so the key
        # sequence (and therefore the result) is bit-identical.
        @jax.jit
        def run(decoder, points, occupancies, planes, opt_state, rng):
            def body(carry, _):
                planes, opt_state, rng = carry
                rng, key = jax.random.split(rng)
                planes, opt_state = train_step(
                    decoder, points, occupancies, planes, opt_state, key
                )
                return (planes, opt_state, rng), None

            (planes, opt_state, _), _ = jax.lax.scan(
                body, (planes, opt_state, rng), None, length=total_steps
            )
            return planes, opt_state

        planes, opt_state = run(
            decoder, points, occupancies, planes, opt_state, rng
        )

    tri = planes.transpose(1, 2, 0, 3).reshape(1, h, w, c)
    return (tri - middle) / half_range
