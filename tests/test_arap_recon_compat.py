import os

import numpy as np
import pytest

from ishapediting_tpu.compat import (
    arap,
    calc_implicit_field,
    calc_mesh_points_normals,
    create_obj,
    cross_section,
)
from ishapediting_tpu.geometry.arap import arap_deform
from ishapediting_tpu.geometry.marching import grid_to_mesh
from ishapediting_tpu.geometry.mesh import TriMesh
from ishapediting_tpu.geometry.recon import point_cloud_to_mesh
from ishapediting_tpu.geometry.metrics import chamfer_distance


def _sphere(res=32, r=0.5):
    x = np.linspace(-1, 1, res)
    X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
    return grid_to_mesh((r - np.sqrt(X**2 + Y**2 + Z**2)).astype(np.float32))


def test_arap_moves_handle_and_preserves_static():
    mesh = _sphere(24, 0.5)
    v = mesh.vertices
    handle = int(np.argmax(v[:, 0]))  # +x pole
    static = list(np.nonzero(v[:, 0] < -0.3)[0][:50])  # back cap fixed
    target = v[handle] + np.array([0.3, 0.0, 0.0])
    out = arap_deform(mesh, static + [handle], np.vstack([v[static], target]), max_iter=20)
    np.testing.assert_allclose(out.vertices[handle], target, atol=1e-6)
    np.testing.assert_allclose(out.vertices[static], v[static], atol=1e-6)
    # the pull must drag nearby free vertices along (smooth deformation)
    near = int(np.argsort(np.linalg.norm(v - v[handle], axis=1))[1])
    assert out.vertices[near, 0] > v[near, 0] + 0.05
    # and far free vertices should move much less
    far_mask = (v[:, 0] < 0) & ~np.isin(np.arange(len(v)), static)
    far_disp = np.linalg.norm(out.vertices[far_mask] - v[far_mask], axis=1)
    assert np.median(far_disp) < 0.15


def test_point_cloud_reconstruction_roundtrip():
    mesh = _sphere(40, 0.5)
    pts = mesh.sample_points_uniformly(20000, seed=0)
    # analytic outward normals of a sphere centered ~0
    c = mesh.vertices.mean(axis=0)
    normals = pts - c
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    recon = point_cloud_to_mesh(pts, normals, resolution=64, smooth_iterations=5)
    cd = chamfer_distance(mesh, recon, 20000)
    assert cd < 5e-4, cd


def test_calc_implicit_field_modes():
    mesh = _sphere(32, 0.5)
    pts = np.array([[0, 0, 0], [0.9, 0, 0]], float)
    occ = calc_implicit_field(mesh, pts, sdf=False)
    np.testing.assert_array_equal(occ, [1, 0])
    sd = calc_implicit_field(mesh, pts, sdf=True)
    assert sd[0] < 0 < sd[1]


def test_calc_mesh_points_normals():
    mesh = _sphere(32, 0.5)
    out = calc_mesh_points_normals(mesh, n=512)
    assert out["points"].shape == (512, 3)
    assert out["normals"].shape == (512, 3)
    # normals roughly radial for a sphere
    p = out["points"] - mesh.vertices.mean(axis=0)
    p /= np.linalg.norm(p, axis=1, keepdims=True)
    cos = np.einsum("ij,ij->i", p, out["normals"])
    assert np.median(np.abs(cos)) > 0.9


def test_create_obj_and_cross_section(tmp_path):
    import jax

    from ishapediting_tpu.ops.triplane import init_decoder_params

    dec = init_decoder_params(jax.random.PRNGKey(0), in_channels=8, mapping=16, hidden=32)
    tri = np.random.default_rng(0).standard_normal((3, 8, 32, 32)).astype(np.float32) * 0.01
    mesh = create_obj(dec, tri, res=24, output_path=str(tmp_path / "m.obj"))
    assert os.path.exists(tmp_path / "m.obj")
    img = cross_section(dec, tri, res=32)
    assert img.shape == (32, 32)
    assert img.dtype == np.uint8
