"""Isosurface extraction via marching tetrahedra (vectorized NumPy, with an
optional native C++ fast path — see native/).

Replaces PyMCubes' ``mcubes.marching_cubes(grid, 0)`` in the reference mesh
path (reference: visualize.py:76-105). We use the 6-tetrahedra cube
decomposition: tiny case tables, watertight output on shared faces, and fully
vectorizable. Extracted vertices live on grid-edge crossings and are deduped
by edge id, so the mesh is vertex-welded like PyMCubes output.

Triangle orientation is normalized globally afterwards using the field
gradient (outward = decreasing field), which is simpler and more robust than
per-case winding bookkeeping.

Vertex coordinates are in voxel-index units [0, res-1]; ``grid_to_mesh``
applies the reference's ``v / res * 2 - 1`` mapping (visualize.py:101).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from ishapediting_tpu.geometry.mesh import TriMesh

# Cube corner offsets, standard ordering.
_CORNERS = np.array(
    [
        [0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
        [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1],
    ],
    dtype=np.int64,
)

# 6-tet decomposition sharing the main diagonal v0-v6.
_TETS = np.array(
    [
        [0, 5, 1, 6],
        [0, 1, 2, 6],
        [0, 2, 3, 6],
        [0, 3, 7, 6],
        [0, 7, 4, 6],
        [0, 4, 5, 6],
    ],
    dtype=np.int64,
)

# Local tet edges (pairs of local corner ids 0..3), ids 0..5.
_TET_EDGES = np.array(
    [[0, 1], [0, 2], [0, 3], [1, 2], [1, 3], [2, 3]], dtype=np.int64
)

# Triangles per inside-bitmask (bit i set = tet corner i inside), as triples
# of local edge ids. Winding fixed globally afterwards.
_CASES = {
    0b0001: [(0, 1, 2)],
    0b0010: [(0, 3, 4)],
    0b0100: [(1, 3, 5)],
    0b1000: [(2, 4, 5)],
    0b0011: [(1, 2, 4), (1, 4, 3)],
    0b0101: [(0, 2, 5), (0, 5, 3)],
    0b1001: [(0, 1, 5), (0, 5, 4)],
    0b0110: [(0, 4, 5), (0, 5, 1)],
    0b1010: [(0, 3, 5), (0, 5, 2)],
    0b1100: [(1, 3, 4), (1, 4, 2)],
    0b0111: [(2, 4, 5)],
    0b1011: [(1, 3, 5)],
    0b1101: [(0, 3, 4)],
    0b1110: [(0, 1, 2)],
}


def marching_tetrahedra(grid: np.ndarray, iso: float = 0.0) -> TriMesh:
    """Extract the iso-surface of a dense scalar grid.

    :param grid: [R0, R1, R2] float field; "inside" = value > iso.
    :returns: TriMesh with vertices in voxel-index coordinates.
    """
    grid = np.asarray(grid, dtype=np.float64)
    r0, r1, r2 = grid.shape
    inside = grid > iso

    # Active cubes: corner occupancy not constant over the 8 corners.
    occ = inside.astype(np.uint8)
    s = np.zeros((r0 - 1, r1 - 1, r2 - 1), np.uint8)
    for dx, dy, dz in _CORNERS:
        s += occ[dx : dx + r0 - 1, dy : dy + r1 - 1, dz : dz + r2 - 1]
    active = (s > 0) & (s < 8)
    ci, cj, ck = np.nonzero(active)
    if len(ci) == 0:
        return TriMesh(np.zeros((0, 3)), np.zeros((0, 3), np.int64))
    base = np.stack([ci, cj, ck], axis=1)  # [M, 3]

    # Global flat ids + values of the 8 corners of each active cube.
    corner_idx = base[:, None, :] + _CORNERS[None, :, :]  # [M, 8, 3]
    flat = (
        corner_idx[..., 0] * (r1 * r2)
        + corner_idx[..., 1] * r2
        + corner_idx[..., 2]
    )  # [M, 8]
    vals = grid.reshape(-1)[flat]  # [M, 8]
    ins = vals > iso

    tri_edge_a = []  # flat grid id of edge endpoint 1
    tri_edge_b = []  # flat grid id of edge endpoint 2

    for tet in _TETS:
        tvals = vals[:, tet]  # [M, 4]
        tins = ins[:, tet]
        code = (
            tins[:, 0].astype(np.int64)
            + tins[:, 1] * 2
            + tins[:, 2] * 4
            + tins[:, 3] * 8
        )
        tflat = flat[:, tet]  # [M, 4]
        for c, tris in _CASES.items():
            sel = np.nonzero(code == c)[0]
            if len(sel) == 0:
                continue
            for tri in tris:
                ea = np.empty((len(sel), 3), np.int64)
                eb = np.empty((len(sel), 3), np.int64)
                for k, eid in enumerate(tri):
                    la, lb = _TET_EDGES[eid]
                    ea[:, k] = tflat[sel, la]
                    eb[:, k] = tflat[sel, lb]
                tri_edge_a.append(ea)
                tri_edge_b.append(eb)

    ea = np.concatenate(tri_edge_a, axis=0)  # [T, 3]
    eb = np.concatenate(tri_edge_b, axis=0)
    # canonical edge key (min, max)
    lo = np.minimum(ea, eb)
    hi = np.maximum(ea, eb)
    keys = lo.astype(np.int64) * (r0 * r1 * r2) + hi
    uniq, inverse = np.unique(keys, return_inverse=True)
    triangles = inverse.reshape(-1, 3)

    # Interpolate one vertex per unique edge.
    ulo = (uniq // (r0 * r1 * r2)).astype(np.int64)
    uhi = (uniq % (r0 * r1 * r2)).astype(np.int64)
    v1 = grid.reshape(-1)[ulo]
    v2 = grid.reshape(-1)[uhi]
    denom = v2 - v1
    t = np.where(np.abs(denom) > 1e-30, (iso - v1) / np.where(denom == 0, 1, denom), 0.5)
    t = np.clip(t, 0.0, 1.0)

    def unflat(f):
        return np.stack([f // (r1 * r2), (f // r2) % r1, f % r2], axis=1).astype(
            np.float64
        )

    p1 = unflat(ulo)
    p2 = unflat(uhi)
    vertices = p1 + t[:, None] * (p2 - p1)

    mesh = TriMesh(vertices, triangles)
    _orient_outward(mesh, grid)
    return mesh.remove_degenerate_triangles()


def _orient_outward(mesh: TriMesh, grid: np.ndarray) -> None:
    """Flip triangles so normals point toward decreasing field (outside)."""
    if len(mesh.triangles) == 0:
        return
    g = np.stack(np.gradient(grid), axis=-1)  # [R0,R1,R2,3]
    v = mesh.vertices
    t = mesh.triangles
    centroid = v[t].mean(axis=1)
    idx = np.clip(np.round(centroid).astype(np.int64), 0, np.array(grid.shape) - 1)
    grad = g[idx[:, 0], idx[:, 1], idx[:, 2]]
    normal = np.cross(v[t[:, 1]] - v[t[:, 0]], v[t[:, 2]] - v[t[:, 0]])
    flip = np.einsum("ij,ij->i", normal, grad) > 0
    t[flip] = t[flip][:, [0, 2, 1]]


def grid_to_mesh(
    grid: np.ndarray, iso: float = 0.0, to_unit: bool = True
) -> TriMesh:
    """Extract + map vertices into [-1, 1]^3 with the reference's convention
    ``v / res * 2 - 1`` (visualize.py:101)."""
    try:
        from ishapediting_tpu.native import native_marching_tetrahedra

        mesh = native_marching_tetrahedra(grid, iso).remove_degenerate_triangles()
    except Exception:
        mesh = marching_tetrahedra(grid, iso)
    if to_unit:
        res = grid.shape[0]
        mesh.vertices = mesh.vertices / res * 2.0 - 1.0
    return mesh
