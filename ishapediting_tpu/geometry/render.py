"""Headless mesh rendering (the GUI's save-picture capability without
Open3D; reference: main.py:345-367 renders with a white background).

A compact NumPy z-buffer rasterizer with Lambertian shading — enough for
documentation shots, edit before/after comparisons, CI artifacts, and the
headless GUI backend (gui/headless.py), which also needs the normalized
depth buffer for the reference's depth-unproject picking path
(reference: main.py:488-527).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

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


def render_scene(
    geoms: Sequence[Tuple[np.ndarray, np.ndarray, Optional[Tuple[float, float, float]]]],
    width: int = 512,
    height: int = 512,
    eye: Tuple[float, float, float] = (1.8, 1.4, 1.8),
    center: Tuple[float, float, float] = (0.0, 0.0, 0.0),
    up: Tuple[float, float, float] = (0.0, 1.0, 0.0),
    fov_deg: float = 40.0,
    near: float = 0.05,
    far: float = 20.0,
    light_dir: Tuple[float, float, float] = (-1.0, -1.0, -1.0),
    background: Tuple[float, float, float] = (1.0, 1.0, 1.0),
) -> Tuple[np.ndarray, np.ndarray]:
    """Rasterize a list of ``(vertices, triangles, color)`` geometries.

    Returns ``(rgb, depth)`` where ``rgb`` is uint8 [height, width, 3] and
    ``depth`` is float32 [height, width] normalized to [0, 1] between
    ``near``/``far`` view-space planes, with exactly 1.0 where nothing was
    hit — the same contract Open3D's ``render_to_depth_image`` exposes, so
    the GUI's background test ``depth == 1.0`` works unchanged.
    """
    img = np.ones((height, width, 3), np.float64) * np.asarray(background)
    depth_img = np.ones((height, width), np.float32)

    # merge geometries into one face soup with per-face base colors
    default_color = np.array([0.62, 0.72, 0.85])
    verts, faces, face_colors = [], [], []
    off = 0
    for entry in geoms:
        v, t, c = entry
        v = np.asarray(v, np.float64)
        t = np.asarray(t, np.int64)
        if len(v) == 0 or len(t) == 0:
            continue
        verts.append(v)
        faces.append(t + off)
        col = default_color if c is None else np.asarray(c, np.float64)
        face_colors.append(np.broadcast_to(col, (len(t), 3)))
        off += len(v)
    if not verts:
        return (np.clip(img, 0, 1) * 255).astype(np.uint8), depth_img
    v = np.concatenate(verts, axis=0)
    tris = np.concatenate(faces, axis=0)
    base_colors = np.concatenate(face_colors, axis=0)

    view = _look_at(np.asarray(eye, float), np.asarray(center, float), np.asarray(up, float))
    vh = np.concatenate([v, np.ones((len(v), 1))], axis=1) @ view.T
    # perspective (aspect-corrected horizontally)
    f = 1.0 / np.tan(np.radians(fov_deg) / 2)
    aspect = width / height
    z = -vh[:, 2]
    zc = np.maximum(z, 1e-9)
    px = (vh[:, 0] * f / (zc * aspect) * 0.5 + 0.5) * (width - 1)
    py = (1.0 - (vh[:, 1] * f / zc * 0.5 + 0.5)) * (height - 1)

    # face shading in world space
    n = np.cross(v[tris[:, 1]] - v[tris[:, 0]], v[tris[:, 2]] - v[tris[:, 0]])
    nn = n / np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-12)
    ld = -np.asarray(light_dir, float)
    ld = ld / np.linalg.norm(ld)
    lam = np.abs(nn @ ld)  # double-sided
    shade = 0.25 + 0.75 * lam  # ambient + diffuse

    zbuf = np.full((height, width), np.inf)
    order = np.argsort(-z[tris].mean(axis=1))  # far first (z-buffer fixes rest)
    for ti in order:
        i0, i1, i2 = tris[ti]
        xs = np.array([px[i0], px[i1], px[i2]])
        ys = np.array([py[i0], py[i1], py[i2]])
        zs = np.array([z[i0], z[i1], z[i2]])
        if np.any(zs <= 1e-9):
            continue
        x_min, x_max = int(max(0, xs.min())), int(min(width - 1, np.ceil(xs.max())))
        y_min, y_max = int(max(0, ys.min())), int(min(height - 1, np.ceil(ys.max())))
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
        img[yy, xx] = base_colors[ti] * shade[ti]

    hit = np.isfinite(zbuf)
    depth_img[hit] = np.clip((zbuf[hit] - near) / max(far - near, 1e-9), 0.0, 1.0 - 1e-6)
    return (np.clip(img, 0, 1) * 255).astype(np.uint8), depth_img


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
    out, _ = render_scene(
        [(np.asarray(mesh.vertices), np.asarray(mesh.triangles), color)],
        width=size,
        height=size,
        eye=eye,
        center=center,
        up=up,
        fov_deg=fov_deg,
        light_dir=light_dir,
        background=background,
    )
    if save_path:
        from PIL import Image

        Image.fromarray(out).save(save_path)
    return out
