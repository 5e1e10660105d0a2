"""Oriented point cloud -> mesh reconstruction (reference: meshProcess.py
``cloud2mesh``, 121-157, which uses Open3D Poisson reconstruction).

We reconstruct by estimating a signed field on a regular grid from the
oriented points — signed projection onto the nearest points' normals,
averaged over k neighbors (a screened-Poisson-lite estimator) — then extract
with marching tetrahedra. Robust for the dense, well-oriented clouds the
pipeline deals with.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
from scipy.spatial import cKDTree

from ishapediting_tpu.geometry.marching import grid_to_mesh
from ishapediting_tpu.geometry.mesh import TriMesh


def point_cloud_to_mesh(
    points: np.ndarray,
    normals: np.ndarray,
    resolution: int = 128,
    k: int = 8,
    trunc: float = 0.1,
    smooth_iterations: int = 10,
) -> TriMesh:
    """Reconstruct a surface from an oriented point cloud.

    :param points: [N, 3] positions (any scale; grid spans their bbox + 5%).
    :param normals: [N, 3] outward normals.
    :returns: TriMesh in the same coordinate frame as ``points``.
    """
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


def cloud2mesh(path: str, resolution: int = 128) -> None:
    """Batch directory pipeline matching the reference's contract
    (meshProcess.py:121-157): for ``<path>/<name>/<file>/pointcloud.npz``
    with 'points' + 'normals', writes mesh_origin.obj, mesh_scale.obj and
    mesh_scale_smooth.obj."""
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
                smooth_iterations=0,
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
