"""Mesh-sharded dense occupancy decode.

The res^3 marching sweep is embarrassingly parallel along x (SURVEY §5.7:
the honest long-axis scaling dimensions are trajectory batch and the
16.7M-point occupancy sweep; reference path: visualize.py:76-97 runs it as
336 sequential 50k-point chunks on one GPU). ``decode_grid_sharded`` splits
the x-rows over EVERY device of the mesh with ``shard_map``: the per-plane
precompute (resize + Fourier projection, per-pixel cost) is replicated —
it is ~res/3 x cheaper than the per-voxel MLP — and each device runs the
MLP sweep only for its own row slab, producing a [res, res, res] array
sharded on axis 0 with zero cross-device traffic.

Bit-identical to ``ops.triplane.decode_grid`` (same precompute, same slab
kernel, same chunking — verified in tests/test_parallel_decode.py).
"""

from __future__ import annotations

import functools
import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ishapediting_tpu.ops.triplane import _grid_precompute, _grid_rows


@functools.lru_cache(maxsize=16)
def _build(mesh: Mesh, res: int, chunk: int, compute_dtype, out_dtype):
    axis_names = tuple(mesh.axis_names)
    n_dev = math.prod(mesh.shape[a] for a in axis_names)
    if res % n_dev:
        raise ValueError(
            f"res={res} must divide by the mesh's {n_dev} devices "
            "(pad res or use ops.triplane.decode_grid)"
        )
    rows_per = res // n_dev
    c = min(chunk, rows_per)
    while rows_per % c:  # largest divisor of rows_per not exceeding chunk
        c -= 1

    def body(dec, planes):
        pre = _grid_precompute(dec, planes, res, compute_dtype)
        lin = 0
        for name in axis_names:  # row-major linear device index
            lin = lin * mesh.shape[name] + jax.lax.axis_index(name)
        rows = lin * rows_per + jnp.arange(rows_per)
        out = _grid_rows(pre, rows, c, compute_dtype)
        return out if out_dtype is None else out.astype(out_dtype)

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P()),  # decoder + planes replicated (tiny)
        out_specs=P(axis_names),  # x-rows concatenated over all devices
    )
    return jax.jit(fn)


def decode_grid_sharded(
    dec: Dict,
    planes: jnp.ndarray,
    mesh: Mesh,
    *,
    res: int = 256,
    chunk: int = 16,
    compute_dtype: jnp.dtype = jnp.bfloat16,
    out_dtype: Optional[jnp.dtype] = None,
) -> jnp.ndarray:
    """Dense [res, res, res] occupancy logits, x-axis sharded over every
    device of ``mesh``. Same contract as ``ops.triplane.decode_grid``;
    ``res`` must be divisible by the mesh's device count. The jitted
    program is cached per (mesh, res, chunk, dtypes)."""
    fn = _build(mesh, res, chunk, compute_dtype, out_dtype)
    return fn(dec, planes)


@functools.lru_cache(maxsize=16)
def _build_batched(mesh: Mesh, res: int, chunk: int, compute_dtype, out_dtype):
    axis_names = tuple(mesh.axis_names)
    c = min(chunk, res)
    while res % c:
        c -= 1

    def body(dec, planes_local):  # [n_loc, 3, h, w, c]
        def one(planes):
            pre = _grid_precompute(dec, planes, res, compute_dtype)
            out = _grid_rows(pre, jnp.arange(res), c, compute_dtype)
            return out if out_dtype is None else out.astype(out_dtype)

        return jax.lax.map(one, planes_local)  # [n_loc, res, res, res]

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(axis_names)),  # decoder replicated; grids per device
        out_specs=P(axis_names),
    )
    return jax.jit(fn)


def decode_grids_batched(
    dec: Dict,
    planes_batch: jnp.ndarray,  # [N, 3, h, w, c]
    mesh: Mesh,
    *,
    res: int = 256,
    chunk: int = 16,
    compute_dtype: jnp.dtype = jnp.bfloat16,
    out_dtype: Optional[jnp.dtype] = None,
) -> jnp.ndarray:
    """Decode N triplanes to N dense grids simultaneously, one grid per
    device ([N, res, res, res], batch axis sharded over the whole mesh) —
    the batch-generation decode stage (the reference's printed
    'decode time', generate.py:89-98, decodes its samples one after
    another on one GPU). N must divide by the mesh's device count; grids
    stay device-resident (fp16 ``out_dtype`` halves the fetch).
    """
    n = planes_batch.shape[0]
    n_dev = math.prod(mesh.shape[a] for a in mesh.axis_names)
    if n % n_dev:
        raise ValueError(
            f"batch {n} must divide by the mesh's {n_dev} devices "
            "(pad the batch or decode per-sample)"
        )
    fn = _build_batched(mesh, res, chunk, compute_dtype, out_dtype)
    return fn(dec, planes_batch)
