"""The drag-edit guidance step and loop (reference: drag_utils.py:302-399).

One edit step, fully inside XLA:

    grad = d/d(x_t) [ -motion_loss - cof * mask_loss ]   (autodiff through
                                                          the whole UNet)
    x_{t-1} = sample(x_t) + variance(x_t) * scale * grad

where the losses compare the tapped UNet feature planes of the current latent
against the cached originals, sampled at the source/target neighborhoods
(motion) and outside them (mask regularization).

The reference runs 170 Python iterations of fwd+bwd; here the loop is a
``lax.scan`` over the per-step cached features, jit-compiled once. For GUI
interactivity the engine runs the scan in chunks (progress + stop between
chunks) with a single compiled chunk function.
"""

from __future__ import annotations

from typing import Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ishapediting_tpu.core.diffusion import p_sample_guidance
from ishapediting_tpu.core.schedule import Schedule
from ishapediting_tpu.edit.features import (
    complement_masks,
    neighborhood_points,
    plane_grids,
    regroup_features,
)
from ishapediting_tpu.ops.grid_sample import grid_sample_2d


class DragProblem(NamedTuple):
    """Precomputed geometry of one drag request (a pytree of device arrays,
    safe to pass through jit boundaries without retracing)."""

    patch_grid: jnp.ndarray  # [3, B, N1, 2]
    shift_grid: jnp.ndarray  # [3, B, N1, 2]
    masks: jnp.ndarray  # [3, s, s] complement masks
    mask_count: jnp.ndarray  # scalar: total complement pixels across planes


def build_drag_problem(
    sources: np.ndarray,
    targets: np.ndarray,
    *,
    r1: int,
    voxel_size: float,
    feat_width: int,
) -> DragProblem:
    """Handle points -> plane grids + complement masks
    (reference: drag_utils.py:316-334)."""
    sources = np.asarray(sources, np.float32).reshape(-1, 3)
    targets = np.asarray(targets, np.float32).reshape(-1, 3)
    if sources.shape != targets.shape:
        raise ValueError("sources and targets must pair up")
    patch = neighborhood_points(sources, r1, voxel_size)
    shift = neighborhood_points(targets, r1, voxel_size)
    masks, count = complement_masks(patch, shift, feat_width)
    return DragProblem(
        patch_grid=jnp.asarray(plane_grids(patch)),
        shift_grid=jnp.asarray(plane_grids(shift)),
        masks=jnp.asarray(masks),
        mask_count=jnp.asarray(count, jnp.float32),
    )


def drag_losses(
    edit_feat: jnp.ndarray,
    origin_feat: jnp.ndarray,
    problem: DragProblem,
    loss_type: str = "l2",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(motion_loss, mask_loss), both scalars (reference: drag_utils.py:355-382).

    ``edit_feat``/``origin_feat``: [3, s, s, C] plane features. Losses
    always compute in fp32 — the cache may be stored bf16
    (EditConfig.feat_store_dtype) to halve its ~1.7 GB/shape footprint.
    """
    edit_feat = edit_feat.astype(jnp.float32)
    origin_feat = origin_feat.astype(jnp.float32)
    c = edit_feat.shape[-1]
    patch_feature = jax.lax.stop_gradient(
        grid_sample_2d(origin_feat, problem.patch_grid)
    )  # [3, B, N1, C]
    shift_feature = grid_sample_2d(edit_feat, problem.shift_grid)
    diff = edit_feat - origin_feat  # [3, s, s, C]
    m = problem.masks[..., None]
    if loss_type == "l1":
        motion = jnp.mean(jnp.abs(shift_feature - patch_feature))
        mask = jnp.sum(jnp.abs(diff) * m) / (c * problem.mask_count)
    else:
        motion = jnp.mean(jnp.square(shift_feature - patch_feature))
        mask = jnp.sum(jnp.square(diff) * m) / (c * problem.mask_count)
    return motion, mask


def make_drag_step(
    sched: Schedule,
    model_fn_feat: Callable,
    problem: DragProblem,
    *,
    scale: float,
    cof: float,
    loss_type: str = "l2",
    clip_denoised: bool = True,
):
    """Build the per-step function
    ``(x_t, t, origin_feat, rng, variance_override, variance_noise) -> x_{t-1}``.

    ``model_fn_feat`` must return the tapped feature; the closure regroups it
    into plane features before the loss.

    Note on ``cof <= 0``: the reference skips computing mask_loss entirely
    when cof <= 0 (drag_utils.py:361-365, a Python-level fast path). Here
    ``cof`` is a *traced* scalar so scale/lambda changes never recompile
    (the GUI knobs), which means the mask term is always computed and merely
    multiplied by 0 — a deliberate trade: the mask loss is <2% of the step
    cost (one masked subtraction over 3 planes vs a full UNet fwd+bwd), and
    one compiled program beats two.

    The two optional per-step overrides reproduce the reference's edit-mode
    variants (drag_utils.py:342-346, 388-390):
    - ``variance_override``: fresh noise, but the inversion-recorded variance
      (case 1 "fix variance");
    - ``variance_noise``: the full recorded residual replayed, no fresh noise
      (exact-replay editing). Pass None for the shipped default (case 2).
    """

    def step(img, t, origin_feat, rng, variance_override=None, variance_noise=None):
        """Returns ``(x_{t-1}, (motion, mask))``. The per-step losses are
        already computed for the gradient, so surfacing them is free — the
        engine exposes them as drag diagnostics (``last_drag_losses``) and
        the edit-effect regression gate asserts on them."""
        tb = jnp.full((img.shape[0],), t, jnp.int32)

        def loss_fn(im):
            out = p_sample_guidance(
                sched,
                model_fn_feat,
                im,
                tb,
                rng,
                variance=variance_override,
                variance_noise=variance_noise,
                clip_denoised=clip_denoised,
            )
            edit_feat = regroup_features(out["inter_feat"])[0]  # [3,s,s,C]
            motion, mask = drag_losses(edit_feat, origin_feat, problem, loss_type)
            loss = -motion - cof * mask
            return loss, (out["sample"], out["variance"], motion, mask)

        (_, (sample, variance, motion, mask)), grad = jax.value_and_grad(
            loss_fn, has_aux=True
        )(img)
        return sample + variance * (scale * grad), (motion, mask)

    return step


def drag_edit_scan(
    sched: Schedule,
    model_fn_feat: Callable,
    problem: DragProblem,
    w_latent: jnp.ndarray,
    features: jnp.ndarray,  # [w_time, 3, s, s, C], index k <-> t = w_time-1-k
    rng: jax.Array,
    *,
    w_time: int,
    scale: float,
    cof: float,
    loss_type: str = "l2",
    t_stop: int = 0,
) -> jnp.ndarray:
    """Full drag loop t = w_time-1 .. t_stop as one scan. Returns x_{t_stop}."""
    step = make_drag_step(
        sched, model_fn_feat, problem, scale=scale, cof=cof, loss_type=loss_type
    )

    def body(img, inp):
        t, feat = inp
        img, losses = step(img, t, feat, jax.random.fold_in(rng, t))
        return img, losses

    ts = jnp.arange(w_time - 1, t_stop - 1, -1)
    feats = features[: w_time - t_stop]
    img, _ = jax.lax.scan(body, w_latent.astype(jnp.float32), (ts, feats))
    return img
