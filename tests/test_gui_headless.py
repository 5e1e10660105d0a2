"""Headless GUI backend: real rasterized rendering, camera math, and the
full depth-unproject pick path with NO test overrides — the GUI exercised
the way a user drives it (reference picking: main.py:488-527)."""

import numpy as np
import pytest

from tests.fake_open3d import install_fake_open3d

install_fake_open3d()  # must precede the gui import

import ishapediting_tpu.gui.app as gui_app  # noqa: E402
from ishapediting_tpu.geometry.mesh import TriMesh  # noqa: E402
from ishapediting_tpu.geometry.render import render_scene  # noqa: E402
from ishapediting_tpu.gui.headless import (  # noqa: E402
    AxisAlignedBoundingBox,
    Camera,
    SyntheticMouseEvent,
    TriangleMesh,
)


def test_render_scene_depth_contract():
    """Depth is 1.0 exactly on background, < 1.0 on the surface; the color
    buffer is shaded where the depth says something was hit."""
    sph = TriangleMesh.create_sphere(0.5)
    rgb, depth = render_scene(
        [(sph.vertices, sph.triangles, (0.8, 0.2, 0.2))],
        width=96,
        height=64,
        eye=(0, 0, 2.5),
        center=(0, 0, 0),
        fov_deg=40,
        near=0.5,
        far=5.0,
    )
    assert rgb.shape == (64, 96, 3) and depth.shape == (64, 96)
    assert depth.dtype == np.float32
    center_d = depth[32, 48]
    assert center_d < 1.0  # sphere hit
    assert depth[0, 0] == 1.0  # background
    # front of the sphere is at z = 2.0 -> normalized (2.0-0.5)/4.5 = 1/3
    np.testing.assert_allclose(center_d, (2.5 - 0.5 - 0.5) / 4.5, atol=0.02)
    assert (rgb[32, 48] != [255, 255, 255]).any()
    np.testing.assert_array_equal(rgb[0, 0], [255, 255, 255])
    # hit mask agrees between the two buffers
    assert ((depth < 1.0) == (rgb != 255).any(axis=-1)).mean() > 0.99


def test_camera_project_unproject_roundtrip():
    cam = Camera()
    cam.frame_bounds(60, AxisAlignedBoundingBox([-1, -1, -1], [1, 1, 1]), np.zeros(3))
    rng = np.random.default_rng(0)
    pts = rng.uniform(-0.8, 0.8, (32, 3))
    w, h = 640, 480
    proj = cam.project(pts, w, h)
    for p, (px, py, d) in zip(pts, proj):
        back = cam.unproject(px, py, d, w, h)
        np.testing.assert_allclose(back, p, atol=1e-9)


def test_pick_through_real_render(tmp_path):
    """Ctrl-click on the RENDERED mesh — no depth/unproject overrides —
    must land on (and snap to) the clicked vertex."""
    app = gui_app.App(models_root=str(tmp_path))
    v = np.array(
        [[0, 0, 0], [0.6, 0, 0], [0, 0.6, 0], [0, 0, 0.6], [0.4, 0.4, 0.4]],
        np.float64,
    )
    f = np.array([[0, 1, 2], [0, 1, 3], [1, 2, 4], [2, 3, 4], [1, 3, 4]], np.int32)
    app.update_mesh(TriMesh(v, f))

    cam = app._scene.scene.camera
    w, h = app._scene.scene.render_size
    # click the centroid of the most camera-facing triangle (robust to the
    # one-pixel rounding a vertex click is subject to)
    cent = v[f].mean(axis=1)
    facing = (cent - cam.center) @ (cam.eye - cam.center)
    click_world = cent[int(np.argmax(facing))]
    expected = v[int(np.argmin(np.linalg.norm(v - click_world, axis=1)))]
    px, py, _ = cam.project(click_world, w, h)[0]
    res = app._mouse_event(SyntheticMouseEvent(x=int(round(px)), y=int(round(py))))
    assert res == gui_app.gui.Widget.EventCallbackResult.HANDLED
    assert len(app.source_pnt) == 1
    np.testing.assert_allclose(app.source_pnt[0], expected, atol=1e-12)

    # background click: depth == 1.0 -> ignored
    app._mouse_event(SyntheticMouseEvent(x=1, y=1))
    assert len(app.source_pnt) == 1 and len(app.target_pnt) == 0


def test_save_picture_renders_real_image(tmp_path):
    pytest.importorskip("PIL")
    from PIL import Image

    app = gui_app.App(models_root=str(tmp_path))
    v = np.array([[0, 0, 0], [0.8, 0, 0], [0, 0.8, 0], [0, 0, 0.8]], np.float64)
    f = np.array([[0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3]], np.int32)
    app.update_mesh(TriMesh(v, f))
    app._save_pic_btn.click()
    out = tmp_path / "shot.png"
    app.window.dialog.on_done(str(out))
    img = np.asarray(Image.open(out))
    assert img.shape == (480, 640, 3)
    # some surface pixels, white background at the corner
    assert (img != 255).any()
    np.testing.assert_array_equal(img[0, 0], [255, 255, 255])
