"""Bilinear grid sampling with PyTorch `F.grid_sample` semantics.

The reference leans on ``torch.nn.functional.grid_sample`` in two hot places:
the triplane plane sampler (reference: axisnetworks.py:537-544) and the
motion-loss feature lookup (reference: drag_utils.py:355-358), both with
``mode='bilinear', padding_mode='zeros', align_corners=True``.

This implementation is pure gather + lerp, differentiable w.r.t. the feature
map (JAX derives the scatter-add VJP automatically), and uses NHWC layout so
gathers and the subsequent MXU matmuls stay in TPU-friendly layouts.

Coordinate convention (identical to torch): ``grid[..., 0]`` = x indexes the
*width* (second spatial) axis, ``grid[..., 1]`` = y indexes the *height*
(first spatial) axis; both in [-1, 1]. With ``align_corners=True``,
-1 maps to pixel 0 and +1 maps to pixel (size-1).
"""

from __future__ import annotations

import jax.numpy as jnp


def grid_sample_2d(
    feat: jnp.ndarray, grid: jnp.ndarray, align_corners: bool = True
) -> jnp.ndarray:
    """Sample ``feat`` [N, H, W, C] at ``grid`` [N, ..., 2] -> [N, ..., C].

    padding_mode='zeros': out-of-range contributions are zeroed exactly like
    torch (per-corner zero padding, so partially-inside samples still blend).
    """
    if feat.ndim != 4:
        raise ValueError(f"feat must be [N,H,W,C], got {feat.shape}")
    n, h, w, c = feat.shape
    batch_shape = grid.shape[:-1]
    grid = grid.reshape(n, -1, 2).astype(jnp.float32)

    x = grid[..., 0]
    y = grid[..., 1]
    if align_corners:
        ix = (x + 1.0) * 0.5 * (w - 1)
        iy = (y + 1.0) * 0.5 * (h - 1)
    else:
        ix = ((x + 1.0) * w - 1.0) * 0.5
        iy = ((y + 1.0) * h - 1.0) * 0.5

    ix0 = jnp.floor(ix)
    iy0 = jnp.floor(iy)
    ix1 = ix0 + 1.0
    iy1 = iy0 + 1.0

    wx1 = ix - ix0
    wx0 = 1.0 - wx1
    wy1 = iy - iy0
    wy0 = 1.0 - wy1

    def gather(iy_f, ix_f):
        valid = (
            (ix_f >= 0) & (ix_f <= w - 1) & (iy_f >= 0) & (iy_f <= h - 1)
        )
        xi = jnp.clip(ix_f, 0, w - 1).astype(jnp.int32)
        yi = jnp.clip(iy_f, 0, h - 1).astype(jnp.int32)
        flat = feat.reshape(n, h * w, c)
        idx = yi * w + xi  # [N, P]
        vals = jnp.take_along_axis(flat, idx[..., None], axis=1)
        return vals * valid[..., None].astype(feat.dtype)

    out = (
        gather(iy0, ix0) * (wy0 * wx0)[..., None].astype(feat.dtype)
        + gather(iy0, ix1) * (wy0 * wx1)[..., None].astype(feat.dtype)
        + gather(iy1, ix0) * (wy1 * wx0)[..., None].astype(feat.dtype)
        + gather(iy1, ix1) * (wy1 * wx1)[..., None].astype(feat.dtype)
    )
    return out.reshape(*batch_shape, c)
