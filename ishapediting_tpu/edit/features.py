"""Feature-space geometry for drag editing.

Rebuilds the reference's feature plumbing (reference: drag_utils.py:134-159,
316-334) with array-first semantics:

- ``regroup_features`` splits a tapped UNet activation into per-triplane
  feature planes (the ``resize_feat_align`` regroup, drag_utils.py:141-159).
- ``plane_grids`` projects 3D handle-point neighborhoods onto the three plane
  coordinate systems for ``grid_sample`` lookups (drag_utils.py:316-321).
- ``complement_masks`` replaces the reference's CPU Python-set arithmetic
  (drag_utils.py:322-334) with a scattered boolean mask — O(1) jit-friendly
  instead of seconds of host work.

Internal feature layout is planes-first NHWC: ``[3, s, s, C']`` per step
(the reference uses ``[3, C', s, s]``); channel *grouping* matches the
reference exactly so converted checkpoints behave identically.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from ishapediting_tpu.ops.nn import channel_nearest_resize


def regroup_features(feat: jnp.ndarray, cat_var: bool = True) -> jnp.ndarray:
    """[B, s, s, 2C] tapped activation -> [B, 3, s, s, C''] plane features.

    Channels split into mean/var halves, each truncated to a multiple of 3
    with nearest-neighbor channel resampling, grouped contiguously into the
    three planes, then (optionally) re-concatenated (reference:
    drag_utils.py:141-159). Output is fp32.
    """
    b, s1, s2, c2 = feat.shape
    assert c2 % 2 == 0, c2
    c = c2 // 2
    mean, var = feat[..., :c], feat[..., c:]
    if c % 3:
        expect = c - c % 3
        mean = channel_nearest_resize(mean, expect, axis=-1)
        var = channel_nearest_resize(var, expect, axis=-1)
        c = expect
    c3 = c // 3

    def to_planes(x):
        # [B, s, s, 3*c3] -> [B, 3, s, s, c3] with contiguous channel groups
        return x.reshape(b, s1, s2, 3, c3).transpose(0, 3, 1, 2, 4)

    mean = to_planes(mean)
    if not cat_var:
        return mean.astype(jnp.float32)
    var = to_planes(var)
    return jnp.concatenate([mean, var], axis=-1).astype(jnp.float32)


def make_offsets(r: int) -> np.ndarray:
    """Cubic neighborhood offsets [-r..r]^3 -> [(2r+1)^3, 3]
    (reference: drag_utils.py:134-138)."""
    p = np.arange(-r, r + 1)
    px, py, pz = np.meshgrid(p, p, p, indexing="ij")
    return np.stack([px.reshape(-1), py.reshape(-1), pz.reshape(-1)], axis=-1)


def neighborhood_points(points: np.ndarray, r: int, voxel_size: float) -> np.ndarray:
    """[B,3] handle points -> [B, N1, 3] cubic neighborhoods
    (reference: drag_utils.py:316-317)."""
    offsets = make_offsets(r).astype(np.float32)
    return points[:, None, :] + voxel_size * offsets[None, :, :]


def plane_grids(pnt: np.ndarray) -> np.ndarray:
    """[B, N1, 3] points -> [3, B, N1, 2] grid_sample coordinates for the
    xy / yz / xz planes (reference: drag_utils.py:318-321)."""
    xy = pnt[..., 0:2]
    yz = pnt[..., 1:3]
    xz = pnt[..., ::2]  # (x, z)
    return np.stack([xy, yz, xz], axis=0)


def complement_masks(
    patch_pnt: np.ndarray, shift_pnt: np.ndarray, width: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Build the per-plane complement masks for the mask-regularization loss.

    Returns (mask [3, width, width] float32 — 1 where the pixel is *outside*
    both neighborhoods' integer projections, matching the reference's
    set-difference semantics exactly (drag_utils.py:322-334) — and the total
    complement pixel count [scalar]).

    Index convention per plane (row, col):
      xy-plane: (y, x); yz-plane: (z, y); xz-plane: (z, x) — the transposed
      pairs at drag_utils.py:329-334.
    """
    pts = np.concatenate(
        [patch_pnt.reshape(-1, 3), shift_pnt.reshape(-1, 3)], axis=0
    )
    ints = np.round((pts + 1.0) * (width - 1) / 2.0).astype(np.int64)
    ints = np.clip(ints, 0, width - 1)
    mask = np.ones((3, width, width), dtype=np.float32)
    x, y, z = ints[:, 0], ints[:, 1], ints[:, 2]
    mask[0, y, x] = 0.0
    mask[1, z, y] = 0.0
    mask[2, z, x] = 0.0
    count = float(mask.sum())
    return mask, count
