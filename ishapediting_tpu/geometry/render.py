"""Headless mesh rendering (the GUI's save-picture capability without
Open3D; reference: main.py:345-367 renders with a white background).

A compact NumPy z-buffer rasterizer with Lambertian shading — enough for
documentation shots, edit before/after comparisons, and CI artifacts.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from ishapediting_tpu.geometry.mesh import TriMesh


def _look_at(eye: np.ndarray, center: np.ndarray, up: np.ndarray) -> np.ndarray:
    f = center - eye
    f = f / np.linalg.norm(f)
    s = np.cross(f, up)
    s = s / np.linalg.norm(s)
    u = np.cross(s, f)
    m = np.eye(4)
    m[0, :3], m[1, :3], m[2, :3] = s, u, -f
    m[:3, 3] = -m[:3, :3] @ eye
    return m


def render_mesh(
    mesh: TriMesh,
    size: int = 512,
    eye: Tuple[float, float, float] = (1.8, 1.4, 1.8),
    center: Tuple[float, float, float] = (0.0, 0.0, 0.0),
    up: Tuple[float, float, float] = (0.0, 1.0, 0.0),
    fov_deg: float = 40.0,
    color: Tuple[float, float, float] = (0.62, 0.72, 0.85),
    light_dir: Tuple[float, float, float] = (-1.0, -1.0, -1.0),
    background: Tuple[float, float, float] = (1.0, 1.0, 1.0),
    save_path: Optional[str] = None,
) -> np.ndarray:
    """Rasterize ``mesh`` to an RGB uint8 image [size, size, 3]."""
    v = np.asarray(mesh.vertices, np.float64)
    tris = np.asarray(mesh.triangles, np.int64)
    img = np.ones((size, size, 3), np.float64) * np.asarray(background)
    if len(tris) == 0:
        out = (img * 255).astype(np.uint8)
        if save_path:
            from PIL import Image

            Image.fromarray(out).save(save_path)
        return out

    view = _look_at(np.asarray(eye, float), np.asarray(center, float), np.asarray(up, float))
    vh = np.concatenate([v, np.ones((len(v), 1))], axis=1) @ view.T
    # perspective
    f = 1.0 / np.tan(np.radians(fov_deg) / 2)
    z = -vh[:, 2]
    px = (vh[:, 0] * f / np.maximum(z, 1e-9) * 0.5 + 0.5) * (size - 1)
    py = (1.0 - (vh[:, 1] * f / np.maximum(z, 1e-9) * 0.5 + 0.5)) * (size - 1)

    # face shading in world space
    n = np.cross(v[tris[:, 1]] - v[tris[:, 0]], v[tris[:, 2]] - v[tris[:, 0]])
    nn = n / np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-12)
    ld = -np.asarray(light_dir, float)
    ld = ld / np.linalg.norm(ld)
    lam = np.abs(nn @ ld)  # double-sided
    shade = 0.25 + 0.75 * lam  # ambient + diffuse

    zbuf = np.full((size, size), np.inf)
    # rasterize back-to-front-ish: process all triangles with z-buffer
    order = np.argsort(-z[tris].mean(axis=1))  # far first (z-buffer fixes rest)
    base_color = np.asarray(color)
    for ti in order:
        i0, i1, i2 = tris[ti]
        xs = np.array([px[i0], px[i1], px[i2]])
        ys = np.array([py[i0], py[i1], py[i2]])
        zs = np.array([z[i0], z[i1], z[i2]])
        if np.any(zs <= 1e-9):
            continue
        x_min, x_max = int(max(0, xs.min())), int(min(size - 1, np.ceil(xs.max())))
        y_min, y_max = int(max(0, ys.min())), int(min(size - 1, np.ceil(ys.max())))
        if x_min > x_max or y_min > y_max:
            continue
        gx, gy = np.meshgrid(
            np.arange(x_min, x_max + 1), np.arange(y_min, y_max + 1)
        )
        d = (ys[1] - ys[2]) * (xs[0] - xs[2]) + (xs[2] - xs[1]) * (ys[0] - ys[2])
        if abs(d) < 1e-12:
            continue
        w0 = ((ys[1] - ys[2]) * (gx - xs[2]) + (xs[2] - xs[1]) * (gy - ys[2])) / d
        w1 = ((ys[2] - ys[0]) * (gx - xs[2]) + (xs[0] - xs[2]) * (gy - ys[2])) / d
        w2 = 1.0 - w0 - w1
        inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)
        if not inside.any():
            continue
        depth = w0 * zs[0] + w1 * zs[1] + w2 * zs[2]
        yy = gy[inside]
        xx = gx[inside]
        dd = depth[inside]
        closer = dd < zbuf[yy, xx]
        yy, xx, dd = yy[closer], xx[closer], dd[closer]
        zbuf[yy, xx] = dd
        img[yy, xx] = base_color * shade[ti]

    out = (np.clip(img, 0, 1) * 255).astype(np.uint8)
    if save_path:
        from PIL import Image

        Image.fromarray(out).save(save_path)
    return out
