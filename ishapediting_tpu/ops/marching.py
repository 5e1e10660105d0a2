"""Marching tetrahedra ON DEVICE (pure jax, fixed-capacity, jit-able).

The host pipeline (geometry/marching.py) needs the full occupancy grid on
the host — 33 MB at 256^3 even as fp16, which the tunneled backend fetches
at ~28 MB/s (docs/PERF.md "Harness quirk"). This module runs the same
6-tetrahedra decomposition on the accelerator over the grid *where it was
decoded*, and ships only the compacted triangle soup: per-triangle int32
edge keys + interpolation parameters, count-sized (a few MB). The host then
welds vertices by edge key (exact integer dedup) and assembles the TriMesh.

Dynamic shapes are handled TPU-natively with static capacities:
``jnp.nonzero(..., size=K)`` compacts active cells and triangle slots into
fixed-size buffers; actual counts come back with the payload and the caller
falls back to the host path if a capacity overflows (never silently).

Semantics match geometry/marching.py (same case tables — imported from it —
same interpolation formula, same np.gradient orientation rule incl. the
one-sided border stencil) up to f32-vs-f64 rounding; parity is pinned by
tests/test_marching_device.py.

Reference behavior replaced: mcubes.marching_cubes on a host-fetched grid
(reference: visualize.py:76-105).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ishapediting_tpu.geometry.marching import _CASES, _CORNERS, _TET_EDGES, _TETS
from ishapediting_tpu.geometry.mesh import TriMesh

# ---------------------------------------------------------------------------
# Static case tables in dense-array form (built from the host module's
# tables so there is one source of truth for the decomposition).
# ---------------------------------------------------------------------------

_NTRI = np.zeros(16, np.int32)
_CASE_TRI = np.zeros((16, 2, 3), np.int32)  # local tet-edge ids, 0-padded
for _code, _tris in _CASES.items():
    _NTRI[_code] = len(_tris)
    for _s, _tri in enumerate(_tris):
        _CASE_TRI[_code, _s] = _tri

_CORNER_FLAT_WEIGHTS = None  # computed per-res below

#: Largest res for which orientation gradients use the dense [r^3, 3] grid
#: (one bandwidth-bound pass + ONE row gather — measured fastest at the 256
#: product scale, "March kernel" docs/PERF.md). Larger grids switch to six
#: O(T) per-axis gathers: the dense grid costs 679 MB at 384 / 1.6 GB at
#: 512 of extra HBM. Tests lower this to pin parity of the two paths.
_DENSE_GRAD_MAX_RES = 256


def _deltas_for_res(res: int) -> np.ndarray:
    """Sorted distinct positive flat-index deltas between tet-edge endpoint
    corners (<= 7 values, so a 4-bit rank packs into the int32 edge key)."""
    deltas = set()
    for tet in _TETS:
        for la, lb in _TET_EDGES:
            da = _CORNERS[tet[la]]
            db = _CORNERS[tet[lb]]
            d = (db - da) @ np.array([res * res, res, 1], np.int64)
            deltas.add(int(abs(d)))
    out = np.array(sorted(deltas), np.int64)
    assert len(out) <= 16 and out[0] > 0
    return out


def default_capacities(res: int) -> Tuple[int, int]:
    """(max_cells, max_tris). Realistic surfaces activate <1% of cells
    (measured ~0.7% at the bench's 0.1%-inside calibration); 1/64 ~ 1.6%
    gives >2x margin. The kernel's warm wall is capacity-proportional
    (tools/probe_march_cap.py on-chip: 1.78 s at 1/32, 1.14 s at 1/64,
    0.73 s at 1/128 for the same 293k-tri surface), so the default sits at
    the smallest rung that still clears typical loads comfortably; the
    engine recovers an overflow by climbing ``capacity_ladder`` instead of
    abandoning the device path. Overflow is detected, never truncated."""
    max_cells = max(res**3 // 64, 8192)
    return max_cells, 3 * max_cells


def capacity_ladder(res: int) -> Tuple[int, ...]:
    """Ascending ``max_cells`` rungs for adaptive capacity selection
    (``max_tris`` is always ``3 * max_cells``). Spans 1/256 of the grid's
    cells (a small in-session surface) up to 1/8 (a heavily fragmented
    field — anything larger belongs on the float64 host path anyway).
    Rungs step by ~1.33x: the kernel wall is capacity-proportional
    (~2.7 µs / 1k cells, docs/PERF.md "march capacity sweep"), so a coarse
    power-of-two ladder would leave up to 2x slack between a surface's
    hinted counts and its rung; the finer steps halve the worst-case
    slack. Rungs compile only when selected."""
    return tuple(sorted({max(res**3 // div, 8192)
                         for div in (256, 192, 128, 96, 64, 48, 32, 24, 16, 12, 8)}))


def pick_capacity(
    ladder: Tuple[int, ...], n_cells: int, n_tris: int,
    min_cells: int = 0, min_tris: int = 0,
) -> Optional[Tuple[int, int]]:
    """Smallest ``(max_cells, max_tris)`` rung pair holding ``n_cells``
    active cells and ``n_tris`` triangles, or None when even the top rungs
    are too small. The two capacities are picked INDEPENDENTLY (tris rungs
    are ``3 * ladder``): surfaces run 2-5 triangles per active cell, so a
    fixed 3x ratio would let whichever bound binds bounce the other one a
    full rung up (measured: the bench's realistic 256³ surface is
    tris-bound at ~4 tris/cell and a coupled pick wastes 1.5x cells
    capacity). ``min_cells``/``min_tris`` exclude rungs <= an overflowed
    capacity so a retry always climbs strictly (the kernel's ``n_tris``
    UNDERCOUNTS when cells overflowed — it only sees the first
    ``max_cells`` compacted cells — so a pick from it may overflow again;
    strict climb guarantees the walk terminates at the ladder top)."""
    cells = next(
        (r for r in ladder if r > min_cells and r >= n_cells), None
    )
    tris = next(
        (3 * r for r in ladder if 3 * r > min_tris and 3 * r >= n_tris), None
    )
    if cells is None or tris is None:
        return None
    return cells, tris


def marching_tets_device(
    grid: jnp.ndarray,
    iso: float = 0.0,
    *,
    max_cells: int,
    max_tris: int,
) -> dict:
    """Jit-able marching tetrahedra over a dense [R, R, R] device grid.

    Returns fixed-capacity buffers plus actual counts:
      keys   [max_tris, 3] int32 — per-corner edge key ``lo * 16 + delta_rank``
      tvals  [max_tris, 3] f32   — interpolation parameter along lo -> hi
      n_cells, n_tris            — actual counts (overflow check on host)
    Triangle corners are already wound outward (np.gradient rule).
    """
    r = grid.shape[0]
    assert grid.shape == (r, r, r)
    if r > 512:
        raise ValueError(
            f"marching_tets_device supports res <= 512 (got {r}): the int32 "
            "edge-key packing (corner*16 + rank) reaches INT32_MAX exactly "
            "at 512^3; use the host path (geometry.marching) beyond that"
        )
    gridf = grid.astype(jnp.float32).reshape(-1)
    inside = (gridf > iso).reshape(r, r, r)

    # -- active cells -------------------------------------------------------
    occ = inside.astype(jnp.uint8)
    s = jnp.zeros((r - 1, r - 1, r - 1), jnp.uint8)
    for dx, dy, dz in _CORNERS:
        s = s + occ[dx : dx + r - 1, dy : dy + r - 1, dz : dz + r - 1]
    active = (s > 0) & (s < 8)
    n_cells = jnp.sum(active, dtype=jnp.int32)
    cell_ids = jnp.nonzero(active.reshape(-1), size=max_cells, fill_value=0)[0]
    valid_cell = jnp.arange(max_cells, dtype=jnp.int32) < n_cells

    c1 = (r - 1) * (r - 1)
    ci = cell_ids // c1
    cj = (cell_ids // (r - 1)) % (r - 1)
    ck = cell_ids % (r - 1)
    # flat GRID ids of the 8 cube corners, [K, 8]
    corner_off = jnp.asarray(
        _CORNERS @ np.array([r * r, r, 1], np.int64), jnp.int32
    )
    base_flat = ci * (r * r) + cj * r + ck
    corner_flat = base_flat[:, None] + corner_off[None, :]
    vals = gridf[corner_flat]  # [K, 8] f32
    ins = vals > iso

    # -- per-tet triangle candidates ----------------------------------------
    ntri_t = jnp.asarray(_NTRI)
    case_tri_t = jnp.asarray(_CASE_TRI)  # [16, 2, 3]
    tet_edges_t = jnp.asarray(_TET_EDGES.astype(np.int32))  # [6, 2]
    # Carry LOCAL cube-corner ids (0..7) through compaction instead of flat
    # grid ids: the endpoint VALUES and flat ids of every tet edge already
    # live in the per-cell ``vals``/``corner_flat`` rows, so looking them
    # up post-compaction is a gather from a K*8-element array (VMEM-sized)
    # rather than T*3 random gathers from the res^3 grid in HBM — the
    # gathers are what make the kernel wall capacity-proportional
    # (docs/PERF.md "march capacity sweep").
    ca_parts, cb_parts, valid_parts = [], [], []
    for tet in _TETS:
        code = (
            ins[:, tet[0]].astype(jnp.int32)
            + ins[:, tet[1]] * 2
            + ins[:, tet[2]] * 4
            + ins[:, tet[3]] * 8
        )
        edges = case_tri_t[code]  # [K, 2, 3] local tet-edge ids
        la = tet_edges_t[edges, 0]  # [K, 2, 3] local tet corner 0..3
        lb = tet_edges_t[edges, 1]
        tet_arr = jnp.asarray(np.array(tet, np.int32))
        ca_parts.append(tet_arr[la])  # [K, 2, 3] cube corner 0..7
        cb_parts.append(tet_arr[lb])
        slot_valid = jnp.arange(2, dtype=jnp.int32)[None, :] < ntri_t[code][:, None]
        valid_parts.append(slot_valid & valid_cell[:, None])

    # [K, 6, 2, 3] -> [K*12, 3]: cell-major slot order (6 tets x 2 slots)
    ca_all = jnp.stack(ca_parts, axis=1).reshape(-1, 3)
    cb_all = jnp.stack(cb_parts, axis=1).reshape(-1, 3)
    valid = jnp.stack(valid_parts, axis=1).reshape(-1)

    # -- compact triangles ----------------------------------------------------
    n_tris = jnp.sum(valid, dtype=jnp.int32)
    tri_idx = jnp.nonzero(valid, size=max_tris, fill_value=0)[0]
    cell_row = tri_idx // 12  # compacted-cell row of each triangle
    ca_c = ca_all[tri_idx]  # [T, 3] local corner ids
    cb_c = cb_all[tri_idx]
    cf = corner_flat.reshape(-1)  # [K*8] flat grid ids
    vf = vals.reshape(-1)  # [K*8] corner values (already gathered)
    ia = cell_row[:, None] * 8 + ca_c
    ib = cell_row[:, None] * 8 + cb_c
    fa = cf[ia]  # [T, 3] flat grid ids of the edge endpoints
    fb = cf[ib]
    va = vf[ia]
    vb = vf[ib]
    swap = fa > fb  # canonical edge direction: lo = smaller flat id
    lo_c = jnp.where(swap, fb, fa)
    hi_c = jnp.where(swap, fa, fb)

    # -- interpolation + positions -------------------------------------------
    v1 = jnp.where(swap, vb, va)
    v2 = jnp.where(swap, va, vb)
    denom = v2 - v1
    t = jnp.where(
        jnp.abs(denom) > 1e-30,
        (iso - v1) / jnp.where(denom == 0, 1.0, denom),
        0.5,
    )
    t = jnp.clip(t, 0.0, 1.0)

    def unflat(f):
        return jnp.stack(
            [f // (r * r), (f // r) % r, f % r], axis=-1
        ).astype(jnp.float32)

    p1 = unflat(lo_c)  # [T, 3, 3]
    p2 = unflat(hi_c)
    pos = p1 + t[..., None] * (p2 - p1)

    # -- orientation: np.gradient central differences (one-sided at borders) --
    # Compute the gradient over the whole grid with shifts (bandwidth-bound,
    # ~ms) and do ONE [T, 3] row gather, instead of six per-axis random
    # gathers from the res^3 grid — identical values (jnp.gradient is the
    # same central-diff / one-sided-border stencil as the host's
    # np.gradient), half the remaining HBM random accesses.
    centroid = pos.mean(axis=1)  # [T, 3]
    idx = jnp.clip(jnp.round(centroid).astype(jnp.int32), 0, r - 1)
    flat_idx = idx[:, 0] * (r * r) + idx[:, 1] * r + idx[:, 2]
    if r <= _DENSE_GRAD_MAX_RES:
        grad_grid = jnp.stack(
            jnp.gradient(gridf.reshape(r, r, r)), axis=-1
        ).reshape(-1, 3)
        grad = grad_grid[flat_idx]  # [T, 3]
    else:
        # past the 256 product scale the [r^3, 3] gradient grid costs real
        # HBM (679 MB at 384, 1.6 GB at 512, on top of the grid + payload)
        # — gather the same central-diff / one-sided-border stencil per
        # axis at the T centroids instead (6 small gathers, O(T) memory):
        # np.gradient == (g[min(i+1,r-1)] - g[max(i-1,0)]) / (hi - lo)
        strides = (r * r, r, 1)
        parts = []
        for a in range(3):
            hi = jnp.minimum(idx[:, a] + 1, r - 1)
            lo = jnp.maximum(idx[:, a] - 1, 0)
            base = flat_idx - idx[:, a] * strides[a]
            diff = gridf[base + hi * strides[a]] - gridf[
                base + lo * strides[a]
            ]
            parts.append(diff / (hi - lo).astype(jnp.float32))
        grad = jnp.stack(parts, axis=-1)  # [T, 3]
    normal = jnp.cross(pos[:, 1] - pos[:, 0], pos[:, 2] - pos[:, 0])
    flip = jnp.einsum("ij,ij->i", normal, grad) > 0

    # -- pack edge keys, apply winding ----------------------------------------
    deltas = jnp.asarray(_deltas_for_res(r).astype(np.int32))
    drank = jnp.searchsorted(deltas, hi_c - lo_c).astype(jnp.int32)
    # max key = (r^3-1)*16 + 15, which is exactly INT32_MAX at r = 512;
    # larger grids would silently wrap negative and weld unrelated edges
    # (the res-512 bound is enforced at entry)
    keys = lo_c * 16 + drank
    keys = jnp.where(flip[:, None], keys[:, jnp.array([0, 2, 1])], keys)
    t = jnp.where(flip[:, None], t[:, jnp.array([0, 2, 1])], t)

    return {"keys": keys, "tvals": t, "n_cells": n_cells, "n_tris": n_tris}


#: Fetch-slice row quantum. On the tunneled backend every DISTINCT eager
#: slice shape compiles its own tiny fetch program (~1-2 s, docs/PERF.md
#: "Harness quirk") — fetching ``payload[:n_tris]`` exactly would pay that
#: compile on every mesh whose count differs. Rounding the slice up to a
#: multiple of this quantum keeps the fetch program session-stable (counts
#: move <<1% per edit step) at <=0.16 MB of over-fetch.
FETCH_QUANTUM = 8192


def fetch_rows(hint_tris: int, max_tris: int) -> int:
    """Number of payload rows (incl. the counts row) to fetch for a mesh
    expected to have ~``hint_tris`` triangles: 10% margin, rounded up to
    ``FETCH_QUANTUM`` so the slice shape — and its one-time fetch-program
    compile — is reused across meshes with nearby counts."""
    want = int(1.1 * hint_tris) + 2  # +1 counts row, +1 slack
    q = -(-want // FETCH_QUANTUM) * FETCH_QUANTUM
    return min(q, max_tris + 1)


def pack_march_output(out: dict) -> jnp.ndarray:
    """Pack the kernel output for a SINGLE host round trip (traced, call
    inside the jit program that ran ``marching_tets_device``).

    The unpacked dict costs four round trips to consume (n_cells, n_tris,
    keys, tvals) and a counts+payload pair still costs two — at ~0.4 s
    tunnel latency each that is more than the payload bytes themselves
    (docs/PERF.md "Harness quirk"). Packed form: one ``[max_tris+1, 5]``
    int32 array whose row 0 carries ``[n_cells, n_tris, 0, 0, 0]`` and
    whose rows ``1..n_tris`` carry ``[k0, k1, k2, t0|t1<<16, t2]`` with the
    interpolation parameters quantized to f16 (bit pattern in the low
    halves). A caller holding a count hint fetches ``payload[:fetch_rows
    (hint, max_tris)]`` — counts and triangles in ONE quantized-shape
    round trip. f16 tvals match the precision the host path already has
    (it marches an f16-quantized grid) and cut payload bytes by 1/6;
    duplicates of an edge still carry bit-identical t, so the host weld
    (``assemble_mesh``) is unaffected."""
    counts_row = jnp.stack(
        [
            out["n_cells"].astype(jnp.uint32),
            out["n_tris"].astype(jnp.uint32),
            jnp.uint32(0),
            jnp.uint32(0),
            jnp.uint32(0),
        ]
    )[None, :]
    t16 = jax.lax.bitcast_convert_type(
        out["tvals"].astype(jnp.float16), jnp.uint16
    ).astype(jnp.uint32)
    rows = jnp.concatenate(
        [
            out["keys"].astype(jnp.uint32),
            (t16[:, 0] | (t16[:, 1] << 16))[:, None],
            t16[:, 2:3],
        ],
        axis=1,
    )
    return jax.lax.bitcast_convert_type(
        jnp.concatenate([counts_row, rows], axis=0), jnp.int32
    )


def march_counts(head: np.ndarray) -> Tuple[int, int]:
    """(n_cells, n_tris) from a fetched payload head (>=1 row)."""
    head = np.asarray(head, np.int32)
    return int(head[0, 0]), int(head[0, 1])


def unpack_march_payload(rows: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side inverse of ``pack_march_output`` for the TRIANGLE rows
    (i.e. ``payload[1:n_tris+1]``): returns (keys [n,3] int32,
    tvals [n,3] f32 — exact f32 widening of the packed f16 bits)."""
    rows = np.asarray(rows, np.int32).view(np.uint32)
    keys = rows[:, :3].astype(np.int32)
    u16 = np.stack(
        [
            rows[:, 3] & np.uint32(0xFFFF),
            rows[:, 3] >> np.uint32(16),
            rows[:, 4] & np.uint32(0xFFFF),
        ],
        axis=1,
    ).astype(np.uint16)
    tvals = u16.view(np.float16).astype(np.float32)
    return keys, tvals


def assemble_mesh(
    keys: np.ndarray, tvals: np.ndarray, res: int
) -> TriMesh:
    """Host-side weld + vertex build from count-sized kernel output.

    Vertices are deduped by exact integer edge key (the device computes t
    identically for every duplicate of an edge), matching the host path's
    edge-id weld. Vertex coordinates are in voxel-index units, like
    marching_tetrahedra."""
    keys = np.asarray(keys, np.int64).reshape(-1)
    tvals = np.asarray(tvals, np.float64).reshape(-1)
    uniq, inverse = np.unique(keys, return_inverse=True)
    tv = np.empty(len(uniq), np.float64)
    tv[inverse] = tvals  # duplicates carry identical t
    lo = uniq >> 4
    delta = _deltas_for_res(res)[uniq & 15]
    hi = lo + delta

    def unflat(f):
        return np.stack(
            [f // (res * res), (f // res) % res, f % res], axis=1
        ).astype(np.float64)

    p1 = unflat(lo)
    p2 = unflat(hi)
    vertices = p1 + tv[:, None] * (p2 - p1)
    triangles = inverse.reshape(-1, 3)
    return TriMesh(vertices, triangles).remove_degenerate_triangles()


def device_grid_to_mesh(
    grid: jnp.ndarray,
    iso: float = 0.0,
    to_unit: bool = True,
    max_cells: Optional[int] = None,
    max_tris: Optional[int] = None,
    _jit_cache: dict = {},
) -> Optional[TriMesh]:
    """Convenience wrapper: run the device kernel on ``grid``, fetch the
    count-sized payload, weld on host. Returns None on capacity overflow
    (caller falls back to the host path). The engine fuses the kernel
    into its own decode program instead (DragEngine._decode_mesh_device);
    this wrapper serves tests and standalone device grids."""
    r = int(grid.shape[0])
    mc, mt = default_capacities(r)
    max_cells = max_cells or mc
    max_tris = max_tris or mt
    key = (r, iso, max_cells, max_tris, str(grid.dtype))
    if key not in _jit_cache:
        _jit_cache[key] = jax.jit(
            lambda g: pack_march_output(
                marching_tets_device(
                    g, iso, max_cells=max_cells, max_tris=max_tris
                )
            )
        )
    out = _jit_cache[key](grid)
    n_cells, n_tris = march_counts(np.asarray(out[:1]))
    if n_cells > max_cells or n_tris > max_tris:
        return None
    if n_tris == 0:
        return TriMesh(np.zeros((0, 3)), np.zeros((0, 3), np.int64))
    slab = np.asarray(out[: fetch_rows(n_tris, max_tris)])
    keys, tvals = unpack_march_payload(slab[1 : n_tris + 1])
    mesh = assemble_mesh(keys, tvals, r)
    if to_unit:
        mesh.vertices = mesh.vertices / r * 2.0 - 1.0
    return mesh
