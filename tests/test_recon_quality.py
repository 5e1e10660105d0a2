"""Quality gate for point_cloud_to_mesh on a non-trivial (genus-1) shape.

The reference reconstructs clouds with Open3D screened Poisson
(meshProcess.py:121-157); ours is a kNN signed-field estimator
(geometry/recon.py). This bounds its quality gap on a torus: Chamfer
distance against the analytic surface and topological closedness
(every edge shared by exactly two triangles).
"""

import numpy as np

from ishapediting_tpu.geometry.marching import grid_to_mesh
from ishapediting_tpu.geometry.metrics import chamfer_distance, hausdorff_distance
from ishapediting_tpu.geometry.recon import point_cloud_to_mesh

R_MAJOR, R_MINOR = 0.6, 0.25


def torus_cloud(n: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    u = rng.uniform(0, 2 * np.pi, n)
    v = rng.uniform(0, 2 * np.pi, n)
    cu, su, cv, sv = np.cos(u), np.sin(u), np.cos(v), np.sin(v)
    pts = np.stack(
        [(R_MAJOR + R_MINOR * cv) * cu, (R_MAJOR + R_MINOR * cv) * su, R_MINOR * sv],
        axis=1,
    )
    normals = np.stack([cv * cu, cv * su, sv], axis=1)
    return pts.astype(np.float64), normals.astype(np.float64)


def torus_mesh(res: int = 96):
    x = np.linspace(-1, 1, res)
    X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
    sdf = R_MINOR - np.sqrt((np.sqrt(X**2 + Y**2) - R_MAJOR) ** 2 + Z**2)
    return grid_to_mesh(sdf.astype(np.float32))


def edge_face_counts(mesh):
    tris = np.asarray(mesh.triangles)
    edges = np.concatenate(
        [tris[:, [0, 1]], tris[:, [1, 2]], tris[:, [2, 0]]], axis=0
    )
    edges.sort(axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    return counts


def test_torus_reconstruction_quality():
    pts, normals = torus_cloud(30_000)
    recon = point_cloud_to_mesh(pts, normals, resolution=96, smooth_iterations=3)
    ref = torus_mesh()
    assert len(recon.vertices) > 1000

    cd = chamfer_distance(ref, recon, 20_000)
    hd = hausdorff_distance(ref, recon, 20_000)
    # grid cell is ~0.018 at res 96 over the padded bbox; sub-cell Chamfer
    # means the signed-field estimator reproduced the surface, and a bounded
    # Hausdorff excludes spurious sheets/holes anywhere
    assert cd < 0.02, f"torus chamfer {cd:.4f}"
    assert hd < 0.08, f"torus hausdorff {hd:.4f}"

    # genus-1 topology must survive: the solid torus encloses a hole, so the
    # reconstructed surface must not fill the middle — no reconstructed
    # vertex near the torus axis center
    d_axis = np.linalg.norm(recon.vertices[:, :2], axis=1)
    assert d_axis.min() > R_MAJOR - R_MINOR - 0.06, "torus hole was filled in"


def test_torus_reconstruction_closedness():
    pts, normals = torus_cloud(30_000)
    recon = point_cloud_to_mesh(pts, normals, resolution=64, smooth_iterations=0)
    counts = edge_face_counts(recon)
    closed_frac = float((counts == 2).mean())
    assert closed_frac > 0.99, f"only {closed_frac:.3f} of edges are 2-manifold"


def test_noisy_cloud_still_reconstructs():
    """Jittered points + imperfect normals (the realistic pipeline input)."""
    rng = np.random.default_rng(1)
    pts, normals = torus_cloud(30_000, seed=2)
    pts = pts + rng.normal(0, 0.005, pts.shape)
    normals = normals + rng.normal(0, 0.05, normals.shape)
    recon = point_cloud_to_mesh(pts, normals, resolution=96, smooth_iterations=5)
    cd = chamfer_distance(torus_mesh(), recon, 20_000)
    assert cd < 0.03, f"noisy torus chamfer {cd:.4f}"


def test_poisson_torus_reconstruction_quality():
    """The FFT Poisson estimator must clear the same torus gate as the kNN
    path (the reference's method family — Open3D screened Poisson,
    meshProcess.py:139)."""
    pts, normals = torus_cloud(30_000)
    recon = point_cloud_to_mesh(
        pts, normals, resolution=96, smooth_iterations=3, method="poisson"
    )
    ref = torus_mesh()
    assert len(recon.vertices) > 1000
    cd = chamfer_distance(ref, recon, 20_000)
    hd = hausdorff_distance(ref, recon, 20_000)
    assert cd < 0.02, f"poisson torus chamfer {cd:.4f}"
    assert hd < 0.12, f"poisson torus hausdorff {hd:.4f}"
    counts = edge_face_counts(recon)
    assert (counts == 2).mean() > 0.99


def test_poisson_fills_partial_cloud():
    """The global solve's payoff: a sphere cloud with a whole cap REMOVED
    (z > 0.7R missing) must still reconstruct a closed surface near the
    true sphere — the local kNN estimator cannot see across the hole, the
    Poisson field propagates through it."""
    rng = np.random.default_rng(3)
    v = rng.standard_normal((40_000, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    keep = v[:, 2] < 0.7
    pts, normals = 0.6 * v[keep], v[keep]

    recon = point_cloud_to_mesh(
        pts, normals, resolution=96, smooth_iterations=3, method="poisson"
    )
    assert len(recon.triangles) > 1000
    x = np.linspace(-1, 1, 96)
    X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
    ref = grid_to_mesh((0.6 - np.sqrt(X**2 + Y**2 + Z**2)).astype(np.float32))
    cd = chamfer_distance(ref, recon, 20_000)
    assert cd < 0.03, f"partial-cloud chamfer {cd:.4f} — hole not filled"
    counts = edge_face_counts(recon)
    assert (counts == 2).mean() > 0.99, "reconstruction left boundary edges"


def test_estimate_normals_and_reconstruct_unoriented():
    """Raw cloud (NO normals): kNN-PCA + MST orientation must recover
    outward normals well enough that the Poisson reconstruction clears the
    same torus gate (Hoppe-1992 pipeline; reference relies on Open3D's
    estimate_normals for such clouds)."""
    from ishapediting_tpu.geometry.recon import estimate_normals

    pts, true_normals = torus_cloud(8_000)
    est = estimate_normals(pts, k=16)
    agree = np.einsum("ij,ij->i", est, true_normals)
    # consistently OUTWARD (not just consistent up to a global flip)
    assert np.mean(agree > 0) > 0.97, f"orientation agreement {np.mean(agree > 0):.3f}"
    assert np.mean(np.abs(agree)) > 0.95, "PCA normals inaccurate"

    recon = point_cloud_to_mesh(
        pts, None, resolution=96, smooth_iterations=3, method="poisson"
    )
    ref = torus_mesh()
    cd = chamfer_distance(ref, recon, 20_000)
    assert cd < 0.025, f"unoriented-cloud chamfer {cd:.4f}"
