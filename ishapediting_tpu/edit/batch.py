"""Batched multi-shape drag editing, sharded over the device mesh.

The reference edits strictly one shape at a time (drag_utils.py:303-304
raises for num_samples > 1). TPU-native extension (BASELINE.json config 5):
N independent shapes — each with its own cached ``w`` latent, per-step
guidance features, and handle set — edited simultaneously, vmapped over the
shape axis and sharded over the mesh's ``data`` axis so every chip carries
its own trajectories with zero cross-device traffic.

All shapes must share the same handle count (pad with repeated handles if
needed — duplicated handle points are a no-op for both losses).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ishapediting_tpu.core.schedule import Schedule
from ishapediting_tpu.edit.drag import DragProblem, build_drag_problem, make_drag_step


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
    scale: float,
    cof: float,
    loss_type: str = "l2",
    clip_denoised: bool = True,
    mesh: Optional[Mesh] = None,
) -> jnp.ndarray:
    """Edit N shapes in one jitted program; returns [N, 1, H, W, C] latents.

    With ``mesh`` given, the shape axis is sharded over ``data`` (pjit;
    XLA keeps each trajectory chip-local).
    """

    def one_shape(w, feats, problem, key):
        step = make_drag_step(
            sched,
            partial(model_fn_p, params),
            problem,
            scale=scale,
            cof=cof,
            loss_type=loss_type,
            clip_denoised=clip_denoised,
        )

        def body(img, inp):
            t, feat = inp
            return step(img, t, feat, jax.random.fold_in(key, t)), None

        ts = jnp.arange(w_time - 1, -1, -1)
        img, _ = jax.lax.scan(body, w.astype(jnp.float32), (ts, feats))
        return img

    n = w_batch.shape[0]
    keys = jax.random.split(rng, n)
    fn = jax.vmap(one_shape, in_axes=(0, 0, 0, 0))
    if mesh is not None:
        shard = NamedSharding(mesh, P("data"))
        w_batch = jax.device_put(w_batch, shard)
        features_batch = jax.device_put(features_batch, shard)
        problems = jax.tree.map(lambda a: jax.device_put(a, shard), problems)
        fn = jax.jit(fn, out_shardings=shard)
    else:
        fn = jax.jit(fn)
    return fn(w_batch, features_batch, problems, keys)


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
