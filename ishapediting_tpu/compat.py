"""Reference-named convenience facade.

Users migrating from iShapEditing can import the surface they know — same
names, same argument shapes, same semantics — backed by the TPU-native
implementations (reference symbols: meshProcess.py:7-118, visualize.py:36-128,
image_sample.py:138-201).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from ishapediting_tpu.geometry.arap import arap_deform
from ishapediting_tpu.geometry.marching import grid_to_mesh
from ishapediting_tpu.geometry.mesh import TriMesh
from ishapediting_tpu.geometry.metrics import (
    chamfer_distance as calc_chamfer,  # noqa: F401
    hausdorff_distance as calc_hausdorff,  # noqa: F401
    iou as calc_iou,  # noqa: F401
    local_distance as calc_local_distance,  # noqa: F401
)
from ishapediting_tpu.geometry.occupancy import points_occupancy, signed_distance
from ishapediting_tpu.geometry.recon import cloud2mesh  # noqa: F401


def calc_implicit_field(mesh: TriMesh, points: np.ndarray, sdf: bool = True) -> np.ndarray:
    """Occupancy or signed distance at points (reference: meshProcess.py:7-14)."""
    if sdf:
        return signed_distance(mesh, points)
    return points_occupancy(mesh, points)


def calc_mesh_points_normals(mesh, pcd: Optional[np.ndarray] = None, n: int = 2048) -> Dict:
    """Surface samples + normals (reference: meshProcess.py:108-118).

    Normals come from the nearest triangle's face normal."""
    from scipy.spatial import cKDTree

    if isinstance(mesh, str):
        mesh = TriMesh.read(mesh)
    pnt = (
        np.asarray(pcd, np.float32)
        if pcd is not None
        else mesh.sample_points_uniformly(n).astype(np.float32)
    )
    centroids = mesh.vertices[mesh.triangles].mean(axis=1)
    _, tri_idx = cKDTree(centroids).query(pnt)
    normals = mesh.triangle_normals()[tri_idx].astype(np.float32)
    return {"points": pnt, "normals": normals}


def arap(mesh: TriMesh, static_ids, handle_ids, handle_pos, max_iter: int = 50) -> TriMesh:
    """ARAP deform with static + handle constraints
    (reference: meshProcess.py:222-236)."""
    static_pos = [mesh.vertices[i] for i in static_ids]
    constraint_ids = list(static_ids) + list(handle_ids)
    constraint_pos = np.asarray(list(static_pos) + list(handle_pos))
    return arap_deform(mesh, constraint_ids, constraint_pos, max_iter=max_iter)


def _planes_to_nhwc(triplanes: np.ndarray) -> np.ndarray:
    """[3,C,H,H] (reference NCHW) -> [3,H,H,C]; [3,H,H,C] passes through.
    Planes are square spatially, so the layout is identified by which pair
    of trailing dims matches; a full cube (C == H) is ambiguous and treated
    as NHWC (our native layout)."""
    if triplanes.ndim != 4 or triplanes.shape[0] != 3:
        raise ValueError(f"expected [3,...] triplanes, got {triplanes.shape}")
    if triplanes.shape[2] == triplanes.shape[3] != triplanes.shape[1]:
        return triplanes.transpose(0, 2, 3, 1)
    if triplanes.shape[1] != triplanes.shape[2]:
        raise ValueError(
            f"planes are not square in either layout: {triplanes.shape}"
        )
    return triplanes


def create_obj(
    decoder_params: Dict,
    triplanes: np.ndarray,
    res: int = 128,
    output_path: Optional[str] = None,
) -> TriMesh:
    """Triplanes -> mesh (reference: visualize.py:36-105 create_obj /
    create_obj_o3d). ``triplanes``: [3, 32, H, W] (reference NCHW layout) or
    [3, H, W, 32]."""
    import jax.numpy as jnp

    from ishapediting_tpu.ops.triplane import decode_grid

    triplanes = np.asarray(triplanes, np.float32)
    triplanes = _planes_to_nhwc(triplanes)
    grid = np.asarray(decode_grid(decoder_params, jnp.asarray(triplanes), res=res))
    mesh = grid_to_mesh(grid, iso=0.0, to_unit=True)
    if output_path:
        mesh.write(output_path)
    return mesh


def cross_section(
    decoder_params: Dict,
    triplanes: np.ndarray,
    res: int = 512,
    axis: str = "z",
    save_path: Optional[str] = None,
) -> np.ndarray:
    """Binary occupancy cross-section at the mid-plane
    (reference: visualize.py:10-33). Returns [res, res] uint8; optionally
    saves a matplotlib figure."""
    import jax.numpy as jnp

    from ishapediting_tpu.ops.triplane import decode_points_chunked

    triplanes = np.asarray(triplanes, np.float32)
    triplanes = _planes_to_nhwc(triplanes)
    xx = np.linspace(-1, 1, res, dtype=np.float32)
    a, b = np.meshgrid(xx, xx, indexing="ij")
    zeros = np.zeros_like(a)
    if axis == "z":
        coords = np.stack([a, b, zeros], -1)
    elif axis == "y":
        coords = np.stack([a, zeros, b], -1)
    else:
        coords = np.stack([zeros, a, b], -1)
    logits = np.asarray(
        decode_points_chunked(
            decoder_params, jnp.asarray(triplanes), jnp.asarray(coords.reshape(-1, 3))
        )
    )
    img = (logits.reshape(res, res) > 0).astype(np.uint8)
    if save_path:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.figure(figsize=(8, 8))
        plt.imshow(img)
        plt.savefig(save_path)
        plt.close()
    return img


def noise2shape(
    model_dir: Optional[str] = None,
    num_samples: int = 8,
    batch_size: int = 8,
    num_steps: int = 256,
    use_ddim: bool = False,
    seed: int = 0,
    engine=None,
) -> np.ndarray:
    """Batch unconditional sampling returning unnormalized triplanes NHWC
    [num_samples, H, W, 96] (reference: image_sample.py:138-201 returns
    NHWC after permute at :189-190)."""
    import jax

    from ishapediting_tpu.config import PipelineConfig
    from ishapediting_tpu.edit.engine import DragEngine
    from ishapediting_tpu.parallel.mesh import make_mesh
    from ishapediting_tpu.parallel.sampling import sample_sharded

    if engine is None:
        config = (
            PipelineConfig().with_ddim(num_steps)
            if use_ddim
            else PipelineConfig().with_steps(num_steps)
        )
        engine = DragEngine.from_model_dir(model_dir, config=config)
    n_dev = len(jax.devices())
    usable = max(1, min(n_dev, batch_size))
    while batch_size % usable:
        usable -= 1
    mesh = make_mesh(usable)
    samples = []
    remaining = num_samples
    i = 0
    while remaining > 0:
        n = min(batch_size, remaining)
        m = mesh if n % mesh.shape["data"] == 0 else make_mesh(1)
        out = sample_sharded(
            engine.sched,
            None,
            m,
            batch_size=n,
            latent_shape=engine.config.latent_shape,
            rng=jax.random.PRNGKey(seed + i),
            use_ddim=use_ddim,
            model_fn_p=engine.model_fn_p(feat=False),
            params=engine.unet_params,
        )
        samples.append(np.asarray(out))
        remaining -= n
        i += 1
    arr = np.concatenate(samples, axis=0)[:num_samples]
    return arr * engine.stats.half_range + engine.stats.middle
