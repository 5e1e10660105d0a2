"""Batched multi-shape editing, sharded over the device mesh.

The reference edits strictly one shape at a time (drag_utils.py:303-304
raises for num_samples > 1). TPU-native extension (BASELINE.json config 5):
N independent shapes — each with its own cached ``w`` latent, per-step
guidance features, and handle set — edited simultaneously, vmapped over the
shape axis and sharded over the mesh's ``data`` axis so every chip carries
its own trajectories with zero cross-device traffic.

The full real-shape path is batched end-to-end: ``fit_guided`` accepts
[N, P, 3] point sets (edit/fit.py), ``ddpm_inversion`` accepts [N, H, W, C]
latents (core/diffusion.py), and ``drag_edit_batched`` below consumes the
stacked records, including the inversion-anchored noise modes
("fixed_variance" / "replay", the reference's commented edit-mode variants
at drag_utils.py:342-346, 388-396).

All shapes must share the same handle count (pad with repeated handles if
needed — duplicated handle points are a no-op for both losses).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ishapediting_tpu.core.diffusion import ddpm_inversion
from ishapediting_tpu.core.schedule import Schedule, validate_w_time
from ishapediting_tpu.edit.drag import DragProblem, build_drag_problem, make_drag_step
from ishapediting_tpu.edit.features import regroup_features
from ishapediting_tpu.edit.fit import fit_guided, sample_training_points


def stack_problems(problems: Sequence[DragProblem]) -> DragProblem:
    """[per-shape DragProblem] -> one DragProblem with a leading shape axis."""
    n_handles = {p.patch_grid.shape[1] for p in problems}
    if len(n_handles) != 1:
        raise ValueError(
            f"all shapes must share one handle count, got {sorted(n_handles)}; "
            "pad with repeated handles"
        )
    return DragProblem(
        patch_grid=jnp.stack([p.patch_grid for p in problems]),
        shift_grid=jnp.stack([p.shift_grid for p in problems]),
        masks=jnp.stack([p.masks for p in problems]),
        mask_count=jnp.stack([p.mask_count for p in problems]),
    )


def drag_edit_batched(
    sched: Schedule,
    model_fn_p: Callable,
    params,
    w_batch: jnp.ndarray,  # [N, 1, H, W, C]
    features_batch: jnp.ndarray,  # [N, w_time, 3, s, s, C']
    problems: DragProblem,  # stacked, leading shape axis
    rng: jax.Array,
    *,
    w_time: int,
    scale,
    cof,
    loss_type: str = "l2",
    clip_denoised: bool = True,
    mesh: Optional[Mesh] = None,
    noise_mode: str = "resample",
    variances_batch: Optional[jnp.ndarray] = None,  # [N, w_time, 1, H, W, C]
    variance_noise_batch: Optional[jnp.ndarray] = None,  # same shape
    edit_positions: Optional[np.ndarray] = None,
) -> jnp.ndarray:
    """Edit N shapes in one jitted program; returns [N, 1, H, W, C] latents.

    With ``mesh`` given, the shape axis is sharded over ``data`` (pjit;
    XLA keeps each trajectory chip-local).

    ``scale`` / ``cof`` may be scalars or per-shape [N] arrays (each shape's
    own edit strength, e.g. from per-edit EditLog entries).

    ``noise_mode`` matches the single-shape engine (edit/engine.py):
    "resample" (fresh noise), "fixed_variance" (inversion-recorded variance),
    "replay" (inversion-recorded variance_noise replayed exactly). The latter
    two require the stacked inversion records.

    Fast editing (framework extension, resample-only): pass the window-
    respaced schedule as ``sched`` and its kept chain positions as
    ``edit_positions`` — both from
    ``core.schedule.fast_edit_schedule(sched_full, base_betas, w_time, k)``.
    The walk then takes ``k`` larger posterior steps, gathering the guidance
    feature rows of the kept positions from the SAME ``features_batch`` the
    full walk uses (quality trade: docs/PERF.md "Fast editing").
    """
    if noise_mode not in ("resample", "fixed_variance", "replay"):
        raise ValueError(f"unknown noise_mode {noise_mode!r}")
    if features_batch.shape[1] != w_time:
        # the silent failure mode here is a clamped jnp.take row gather
        raise ValueError(
            f"features_batch has {features_batch.shape[1]} rows but "
            f"w_time={w_time} (invert_batched records one row per window "
            "step)"
        )
    if edit_positions is None:
        # full walk: sched IS the full respaced chain
        validate_w_time(sched, w_time, context="drag_edit_batched")
    elif not (
        0 <= np.min(edit_positions) and np.max(edit_positions) < w_time
    ):
        # fast editing: sched is the k-step window schedule; the invariant
        # is that every kept chain position has a feature-cache row
        raise ValueError(
            f"edit_positions must lie in [0, w_time={w_time}); got "
            f"[{np.min(edit_positions)}, {np.max(edit_positions)}]"
        )
    if edit_positions is not None and noise_mode != "resample":
        raise ValueError(
            "edit_positions (fast editing) supports noise_mode='resample' "
            "only: inversion-recorded variances/noise belong to the full "
            "per-step grid"
        )
    if noise_mode != "resample" and (
        variances_batch is None or variance_noise_batch is None
    ):
        raise ValueError(
            f"noise_mode={noise_mode!r} needs variances_batch and "
            "variance_noise_batch from invert_batched()"
        )
    n = w_batch.shape[0]
    if edit_positions is not None:
        positions = np.asarray(edit_positions, np.int32)
        n_steps = len(positions)
        # scan step j walks fast position t = n_steps-1-j, whose guidance
        # features live at inversion-cache row w_time-1-positions[t]
        # (row i <-> chain position w_time-1-i, same convention as the
        # full walk below)
        rows = w_time - 1 - positions[::-1]
        features_batch = jnp.take(
            features_batch, jnp.asarray(rows.copy()), axis=1
        )
    else:
        n_steps = w_time
    if variances_batch is None:
        # unused placeholders keep the scan signature static
        variances_batch = jnp.zeros((n, n_steps), jnp.float32)
        variance_noise_batch = jnp.zeros((n, n_steps), jnp.float32)

    # scalars or per-shape [N] arrays; traced (never baked into the jaxpr)
    scale = jnp.broadcast_to(jnp.asarray(scale, jnp.float32), (n,))
    cof = jnp.broadcast_to(jnp.asarray(cof, jnp.float32), (n,))

    def one_shape(p, w, feats, variances, variance_noises, problem, key, sc, cf):
        step = make_drag_step(
            sched,
            partial(model_fn_p, p),
            problem,
            scale=sc,
            cof=cf,
            loss_type=loss_type,
            clip_denoised=clip_denoised,
        )

        def body(img, inp):
            t, feat, var, vn = inp
            key_t = jax.random.fold_in(key, t)
            if noise_mode == "fixed_variance":
                nxt, _ = step(img, t, feat, key_t, variance_override=var)
            elif noise_mode == "replay":
                nxt, _ = step(img, t, feat, key_t, variance_noise=vn)
            else:
                nxt, _ = step(img, t, feat, key_t)
            return nxt, None

        ts = jnp.arange(n_steps - 1, -1, -1)
        img, _ = jax.lax.scan(
            body, w.astype(jnp.float32), (ts, feats, variances, variance_noises)
        )
        return img

    keys = jax.random.split(rng, n)
    # params are a jit ARGUMENT (vmap-broadcast), never a closure constant —
    # closed-over 421M-param trees make compiles non-terminating on some
    # backends (docs/PERF.md, CLAUDE.md).
    fn = jax.vmap(one_shape, in_axes=(None, 0, 0, 0, 0, 0, 0, 0, 0))
    args = (w_batch, features_batch, variances_batch, variance_noise_batch)
    if mesh is not None:
        shard = NamedSharding(mesh, P("data"))
        args = tuple(jax.device_put(a, shard) for a in args)
        problems = jax.tree.map(lambda a: jax.device_put(a, shard), problems)
        fn = jax.jit(fn, out_shardings=shard)
    else:
        fn = jax.jit(fn)
    return fn(params, *args, problems, keys, scale, cof)


def invert_batched(
    sched: Schedule,
    model_fn_p: Callable,
    params,
    latents: jnp.ndarray,  # [N, H, W, C] normalized latents
    rng: jax.Array,
    *,
    w_time: int,
    clip_denoised: bool = True,
    chunk: int = 2,
    mesh: Optional[Mesh] = None,
    feat_dtype=jnp.float32,
) -> Dict[str, jnp.ndarray]:
    """Edit-friendly inversion of N latents in ONE jitted program, reshaped
    for ``drag_edit_batched``:

      w:               [N, 1, H, W, C]
      features:        [N, w_time, 3, s, s, C']  (``feat_dtype``; bf16
                       halves the dominant N x w_time feature footprint —
                       the drag losses upcast to fp32)
      variances:       [N, w_time, 1, H, W, C]
      variance_noise:  [N, w_time, 1, H, W, C]
      sample:          [N, H, W, C]  (== latents, replay identity)

    ``model_fn_p(params, x, t)`` — params are a jit argument, never a
    closure constant (CLAUDE.md / docs/PERF.md).
    """
    if mesh is not None:
        latents = jax.device_put(latents, NamedSharding(mesh, P("data")))
    validate_w_time(sched, w_time, context="invert_batched")
    feat_dtype = jnp.dtype(feat_dtype)

    def run(p, x, r):
        return ddpm_inversion(
            sched,
            partial(model_fn_p, p),
            x,
            r,
            steps=w_time,
            feat_postprocess=lambda f: regroup_features(f).astype(feat_dtype),
            clip_denoised=clip_denoised,
            chunk=chunk,
        )

    out = jax.jit(run)(params, latents, rng)
    # [steps, N, ...] -> [N, steps, ...] with the per-shape singleton batch
    # axis the single-shape drag step expects.
    move = lambda a: jnp.moveaxis(a, 0, 1)
    return {
        "w": out["latent"][:, None],
        "features": move(out["features"]),
        "variances": move(out["variances"])[:, :, None],
        "variance_noise": move(out["variance_noise"])[:, :, None],
        "sample": out["sample"],
    }


def fit_real_shapes_batched(
    sched_fit: Schedule,
    model_fn_p: Callable,
    params,
    decoder: Dict,
    meshes: Sequence,
    half_range: jnp.ndarray,
    middle: jnp.ndarray,
    rng: jax.Array,
    *,
    latent_shape: Tuple[int, int, int],
    fit_cfg,
    seed: int = 0,
    clip_denoised: bool = True,
    mesh: Optional[Mesh] = None,
) -> jnp.ndarray:
    """Classifier-guided reconstruction of N real meshes in one program
    (host-side point sampling per mesh, then one batched ``fit_guided``).
    Returns normalized latents [N, H, W, C]."""
    pts, occ = [], []
    for i, m in enumerate(meshes):
        p, o = sample_training_points(m, fit_cfg, seed=seed + i)
        pts.append(p)
        occ.append(o)
    points = jnp.asarray(np.stack(pts))
    occs = jnp.asarray(np.stack(occ))
    if mesh is not None:
        shard = NamedSharding(mesh, P("data"))
        points = jax.device_put(points, shard)
        occs = jax.device_put(occs, shard)
    return fit_guided(
        sched_fit,
        partial(model_fn_p, params),
        decoder,
        points,
        occs,
        half_range,
        middle,
        rng,
        latent_shape=latent_shape,
        batch_points=fit_cfg.batch_points,
        scale=fit_cfg.grad_scale,
        clip_denoised=clip_denoised,
    )


def build_batched_problems(
    sources_list: Sequence[np.ndarray],
    targets_list: Sequence[np.ndarray],
    *,
    r1: int,
    voxel_size: float,
    feat_width: int,
) -> DragProblem:
    """Per-shape handle sets -> stacked DragProblem (pads to the max handle
    count by repeating each shape's last handle pair)."""
    max_handles = max(np.asarray(s).reshape(-1, 3).shape[0] for s in sources_list)
    problems: List[DragProblem] = []
    for src, tgt in zip(sources_list, targets_list):
        src = np.asarray(src, np.float32).reshape(-1, 3)
        tgt = np.asarray(tgt, np.float32).reshape(-1, 3)
        if src.shape[0] < max_handles:
            pad = max_handles - src.shape[0]
            src = np.concatenate([src, np.repeat(src[-1:], pad, 0)], 0)
            tgt = np.concatenate([tgt, np.repeat(tgt[-1:], pad, 0)], 0)
        problems.append(
            build_drag_problem(
                src, tgt, r1=r1, voxel_size=voxel_size, feat_width=feat_width
            )
        )
    return stack_problems(problems)
