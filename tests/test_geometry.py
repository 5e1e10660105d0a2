import os

import numpy as np
import pytest

from ishapediting_tpu.geometry.marching import grid_to_mesh, marching_tetrahedra
from ishapediting_tpu.geometry.mesh import TriMesh
from ishapediting_tpu.geometry.metrics import (
    chamfer_distance,
    hausdorff_distance,
    iou,
    local_distance,
)
from ishapediting_tpu.geometry.occupancy import (
    _numpy_occupancy,
    points_occupancy,
    signed_distance,
)


def sphere_grid(res=48, radius=0.6):
    x = np.linspace(-1, 1, res)
    X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
    return radius - np.sqrt(X**2 + Y**2 + Z**2)  # >0 inside


def mesh_volume(mesh: TriMesh) -> float:
    v = mesh.vertices
    t = mesh.triangles
    a, b, c = v[t[:, 0]], v[t[:, 1]], v[t[:, 2]]
    return float(np.einsum("ij,ij->i", a, np.cross(b, c)).sum() / 6.0)


def test_marching_tets_sphere():
    grid = sphere_grid()
    mesh = grid_to_mesh(grid, to_unit=True)
    assert len(mesh.vertices) > 500
    r = np.linalg.norm(mesh.vertices + 1.0 / 48, axis=1)  # index->unit offset
    # all vertices near the sphere surface
    assert abs(np.median(r) - 0.6) < 0.03
    assert np.abs(r - 0.6).max() < 0.08


def test_marching_tets_watertight_and_oriented():
    grid = sphere_grid(32, 0.5)
    mesh = marching_tetrahedra(grid)
    t = mesh.triangles
    edges = np.concatenate([t[:, [0, 1]], t[:, [1, 2]], t[:, [2, 0]]], axis=0)
    und = np.sort(edges, axis=1)
    _, counts = np.unique(und, axis=0, return_counts=True)
    assert (counts == 2).all(), "every edge must be shared by exactly 2 triangles"
    # consistent outward orientation -> positive enclosed volume ~ sphere
    vol = mesh_volume(mesh)
    R_vox = 0.5 * (32 - 1) / 2  # radius in voxel units
    expect = 4 / 3 * np.pi * R_vox**3
    assert vol == pytest.approx(expect, rel=0.05)
    # directed edges: each unordered edge appears once per direction
    d = edges[:, 0] * (10**6) + edges[:, 1]
    assert len(np.unique(d)) == len(d)


def test_marching_tets_empty():
    mesh = marching_tetrahedra(np.full((8, 8, 8), -1.0))
    assert len(mesh.vertices) == 0 and len(mesh.triangles) == 0


def test_native_matches_numpy_if_available():
    try:
        from ishapediting_tpu.native import native_marching_tetrahedra
        nat = native_marching_tetrahedra(sphere_grid(24), 0.0)
    except ImportError:
        pytest.skip("native build unavailable")
    ref = marching_tetrahedra(sphere_grid(24), 0.0)
    assert len(nat.triangles) == len(ref.triangles)
    assert mesh_volume(nat) == pytest.approx(mesh_volume(ref), rel=1e-6)
    # same vertex set (order may differ)
    a = np.sort(np.round(nat.vertices, 6).view([("x", float), ("y", float), ("z", float)]), axis=0)
    b = np.sort(np.round(ref.vertices, 6).view([("x", float), ("y", float), ("z", float)]), axis=0)
    assert np.array_equal(a, b)


def test_native_rejects_oversize_grid_before_copying():
    """Grids past the C++ 32-bit edge-key bound must raise (grid_to_mesh
    then falls back to the int64-keyed NumPy path) — and must do so BEFORE
    ascontiguousarray materializes a copy (a stride-tricked 1300^3 view
    would otherwise allocate 8.8 GB just to be rejected)."""
    try:
        from ishapediting_tpu.native import native_marching_tetrahedra
        native_marching_tetrahedra(sphere_grid(8), 0.0)  # build available?
    except ImportError:
        pytest.skip("native build unavailable")
    big = np.lib.stride_tricks.as_strided(
        np.zeros(1, np.float32), shape=(1300, 1300, 1300), strides=(0, 0, 0)
    )
    with pytest.raises(ValueError, match="edge-key bound"):
        native_marching_tetrahedra(big, 0.0)


def test_occupancy_sphere():
    mesh = grid_to_mesh(sphere_grid(48, 0.6))
    # note: the reference's v/res*2-1 vertex mapping (visualize.py:101)
    # contracts the surface slightly (r=0.6 -> ~0.567 here), kept for parity.
    pts = np.array([
        [0, 0, 0], [0.5, 0, 0], [0, 0.55, 0],
        [0.7, 0, 0], [0, 0, 0.95], [2, 2, 2],
    ], float)
    occ = points_occupancy(mesh, pts)
    np.testing.assert_array_equal(occ, [1, 1, 1, 0, 0, 0])


def test_numpy_occupancy_agrees_with_native(rng):
    mesh = grid_to_mesh(sphere_grid(32, 0.5))
    pts = rng.uniform(-1, 1, (2000, 3))
    a = _numpy_occupancy(mesh, pts)
    try:
        from ishapediting_tpu.native import native_points_occupancy
        b = native_points_occupancy(mesh, pts)
    except ImportError:
        pytest.skip("native build unavailable")
    assert (a == b).mean() > 0.999


def test_signed_distance_sign_and_magnitude():
    mesh = grid_to_mesh(sphere_grid(48, 0.6))
    pts = np.array([[0, 0, 0], [0.9, 0, 0]], float)
    sd = signed_distance(mesh, pts, samples=20000)
    assert sd[0] < 0 and sd[1] > 0
    assert sd[0] == pytest.approx(-0.6, abs=0.05)
    assert sd[1] == pytest.approx(0.3, abs=0.05)


def test_chamfer_and_hausdorff():
    m1 = grid_to_mesh(sphere_grid(40, 0.5))
    m2 = m1.copy().translate([0.1, 0, 0])
    assert chamfer_distance(m1, m1, 20000) < 1e-4
    cd = chamfer_distance(m1, m2, 20000)
    assert 0 < cd < 0.1**2 * 2 + 1e-3
    hd = hausdorff_distance(m1, m2, 20000)
    assert hd == pytest.approx(0.1, abs=0.03)


def test_iou_identity_and_disjoint():
    m1 = grid_to_mesh(sphere_grid(40, 0.5))
    assert iou(m1, m1, 20000) > 0.97
    m2 = m1.copy().translate([2.5, 0, 0])
    assert iou(m1, m2, 20000) < 0.02


def test_local_distance():
    m1 = grid_to_mesh(sphere_grid(40, 0.5))
    pa = np.array([[0.5, 0, 0]])
    val = local_distance(m1, m1, pa, pa, r=0.2, point_num=4000)
    assert val > 0.97
    val_l2 = local_distance(m1, m1, pa, pa, r=0.2, point_num=4000, metric="L2")
    assert val_l2 < 0.01


def test_mesh_io_roundtrip(tmp_path):
    mesh = grid_to_mesh(sphere_grid(20, 0.5))
    for ext in ("obj", "ply", "off", "stl"):
        p = os.path.join(tmp_path, f"m.{ext}")
        mesh.write(p)
        back = TriMesh.read(p)
        if ext == "stl":  # stl re-welds vertices; compare welded vertex sets
            a = np.unique(np.round(mesh.vertices, 5), axis=0)
            b = np.unique(np.round(back.vertices, 5), axis=0)
            np.testing.assert_allclose(a, b, atol=1e-4)
        else:
            np.testing.assert_allclose(back.vertices, mesh.vertices, atol=1e-5)
            np.testing.assert_array_equal(back.triangles, mesh.triangles)


def test_normalize_unit_cube():
    # symmetric cube far from origin: reference semantics (vertex-mean center,
    # scale by max extent; drag_utils.py:418-426) bring it into [-1,1]^3
    corners = np.array(
        [[x, y, z] for x in (5, 15.0) for y in (5, 15.0) for z in (5, 15.0)]
    )
    tris = np.array([[0, 1, 2], [1, 3, 2], [4, 6, 5], [5, 6, 7]])
    mesh = TriMesh(corners, tris).normalize_unit_cube()
    assert mesh.max_bound.max() <= 1.0 + 1e-9
    assert mesh.min_bound.min() >= -1.0 - 1e-9
    # in-bounds meshes are untouched
    v0 = mesh.vertices.copy()
    mesh.normalize_unit_cube()
    np.testing.assert_array_equal(mesh.vertices, v0)


def test_sample_points_on_surface():
    mesh = grid_to_mesh(sphere_grid(40, 0.5))
    pts = mesh.sample_points_uniformly(5000, seed=0)
    r = np.linalg.norm(pts + 1.0 / 40, axis=1)
    assert abs(r.mean() - 0.5) < 0.02


def test_smoothing_shrinks_noise(rng):
    mesh = grid_to_mesh(sphere_grid(32, 0.5))
    noisy = mesh.copy()
    noisy.vertices = noisy.vertices + rng.standard_normal(noisy.vertices.shape) * 0.01
    smoothed = noisy.filter_smooth_simple(10)
    r_noisy = np.linalg.norm(noisy.vertices, axis=1)
    r_smooth = np.linalg.norm(smoothed.vertices, axis=1)
    assert r_smooth.std() < r_noisy.std()


def test_native_smooth_matches_scipy_fallback(rng):
    """The C++ smooth_simple must equal the scipy-CSR fallback (the
    executable spec) to fp-roundoff on a real marched surface."""
    pytest.importorskip("scipy")
    try:
        from ishapediting_tpu.native import native_smooth_simple
    except Exception:
        pytest.skip("native toolchain unavailable")
    from scipy import sparse

    mesh = grid_to_mesh(sphere_grid(32, 0.5))
    mesh.vertices = (
        mesh.vertices + rng.standard_normal(mesh.vertices.shape) * 0.01
    )
    got = native_smooth_simple(mesh.vertices, mesh.triangles, 10)

    v, t = mesh.vertices.copy(), mesh.triangles
    n = len(v)
    rows = np.concatenate([t[:, 0], t[:, 1], t[:, 2], t[:, 1], t[:, 2], t[:, 0]])
    cols = np.concatenate([t[:, 1], t[:, 2], t[:, 0], t[:, 0], t[:, 1], t[:, 2]])
    adj = sparse.csr_matrix((np.ones(len(rows)), (rows, cols)), shape=(n, n))
    adj.data[:] = 1.0
    inv = 1.0 / (1.0 + np.diff(adj.indptr))[:, None]
    for _ in range(10):
        v = (v + adj.dot(v)) * inv
    np.testing.assert_allclose(got, v, atol=1e-12)


def test_native_obj_writer_byte_identical(rng, tmp_path):
    """The C++ OBJ writer must produce byte-identical output to the Python
    per-row writer (the executable spec), including exponent formatting."""
    try:
        from ishapediting_tpu.native import native_write_obj
    except Exception:
        pytest.skip("native toolchain unavailable")

    nv = 500
    # varied magnitudes exercise %.8g fixed and exponent notation
    verts = rng.standard_normal((nv, 3)) * np.array([1.0, 1e-6, 1e4])
    tris = rng.integers(0, nv, (800, 3)).astype(np.int64)
    native_write_obj(verts, tris, str(tmp_path / "n.obj"))
    with open(tmp_path / "p.obj", "w") as f:
        for v in verts:
            f.write(f"v {v[0]:.8g} {v[1]:.8g} {v[2]:.8g}\n")
        for t in tris:
            f.write(f"f {t[0]+1} {t[1]+1} {t[2]+1}\n")
    a = (tmp_path / "n.obj").read_bytes()
    b = (tmp_path / "p.obj").read_bytes()
    assert a == b


def test_render_mesh(tmp_path):
    from ishapediting_tpu.geometry.render import render_mesh

    mesh = grid_to_mesh(sphere_grid(32, 0.5))
    img = render_mesh(mesh, size=128, save_path=str(tmp_path / "r.png"))
    assert img.shape == (128, 128, 3) and img.dtype == np.uint8
    # sphere silhouette: center is shaded, corners stay background white
    assert (img[64, 64] < 250).any()
    assert (img[2, 2] == 255).all()
    assert os.path.exists(tmp_path / "r.png")
    # empty mesh renders clean background
    from ishapediting_tpu.geometry.mesh import TriMesh
    empty = render_mesh(TriMesh(np.zeros((0, 3)), np.zeros((0, 3), np.int64)), size=32)
    assert (empty == 255).all()


def test_native_write_obj_reports_write_failure():
    """A failed fwrite (ENOSPC) must surface as OSError, not a silently
    truncated 'successful' OBJ — /dev/full fails every write, and the mesh
    is large enough (>4 MB of text) to force a mid-stream buffer flush."""
    if not os.path.exists("/dev/full"):
        pytest.skip("/dev/full unavailable")
    try:
        from ishapediting_tpu.native import native_write_obj
    except ImportError:
        pytest.skip("native build unavailable")
    n = 200_000
    verts = np.random.default_rng(0).standard_normal((n, 3))
    tris = np.zeros((1, 3), np.int64)
    with pytest.raises(OSError, match="write_obj failed"):
        native_write_obj(verts, tris, "/dev/full")
