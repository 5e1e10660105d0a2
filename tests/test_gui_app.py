"""GUI logic tests against a fully faked open3d (tests/fake_open3d.py).

Covers the non-render logic of gui/app.py (reference: main.py:12-631):
widget/callback wiring, mouse-pick depth-unproject + vertex snap, overlay
bookkeeping, arrow orientation math, EditLog provenance writing, the
depth-masked white-background picture save, and engine interaction
(create/stop/reset) with worker threads made synchronous.
"""

import os
import sys
import threading

import numpy as np
import pytest

from tests.fake_open3d import FakeMouseEvent, install_fake_open3d

install_fake_open3d()  # must precede the gui import

import ishapediting_tpu.gui.app as gui_app  # noqa: E402
from ishapediting_tpu.gui.app import App  # noqa: E402
from ishapediting_tpu.geometry.mesh import TriMesh  # noqa: E402


class _SyncThread:
    """threading.Thread replacement that runs the target synchronously."""

    def __init__(self, target=None, daemon=None, args=(), kwargs=None):
        self._target, self._args, self._kwargs = target, args, kwargs or {}

    def start(self):
        self._target(*self._args, **self._kwargs)

    def join(self, timeout=None):
        pass


@pytest.fixture
def sync_threads(monkeypatch):
    monkeypatch.setattr(gui_app.threading, "Thread", _SyncThread)


@pytest.fixture
def app(tmp_path):
    models = tmp_path / "models"
    (models / "chairs").mkdir(parents=True)
    return App(models_root=str(models))


def tri_mesh():
    v = np.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1], [0.5, 0.5, 0.5]], np.float64
    )
    f = np.array([[0, 1, 2], [0, 1, 3], [1, 2, 4]], np.int32)
    return TriMesh(v, f)


def test_construction_wires_all_widgets(app):
    assert app._model_combo.items == ["chairs"]
    for btn in (
        app._create_btn, app._load_btn, app._inv_btn, app._start_btn,
        app._stop_btn, app._reset_btn, app._clear_pnt_btn,
        app._save_mesh_btn, app._save_pic_btn,
    ):
        assert btn.on_clicked is not None
    # reference GUI defaults (main.py:102,105)
    assert app._grads_scale_edit.text_value == "1200"
    assert app._lambda_edit.text_value == "0.4"
    assert app._radius_edit.text_value == "12"
    assert app._scene.on_mouse is not None


def test_layout_splits_scene_and_panel(app):
    class Ctx:
        class theme:
            font_size = 14

    app.window.content_rect = gui_app.gui.Rect(0, 0, 1280, 800)
    app._on_layout(Ctx)
    assert app._scene.frame.width == 1280 - 16 * 14
    assert app._panel.frame.x == 1280 - 16 * 14


def test_buttons_require_engine(app):
    app._create_btn.click()
    assert app._status.text == "select a model first"
    app._inv_btn.click()
    assert app._status.text == "select a model first"


def test_update_mesh_adds_geometry_and_kdtree(app):
    mesh = tri_mesh()
    app.update_mesh(mesh)
    assert "mesh" in app._scene.scene.geometry
    assert app._scene.camera_setup is not None
    assert app._kdtree is not None
    # camera not re-set when update_camera=False
    app._scene.camera_setup = None
    app.update_mesh(mesh, update_camera=False)
    assert app._scene.camera_setup is None


def test_mouse_pick_snaps_to_vertex_and_alternates(app):
    mesh = tri_mesh()
    app.update_mesh(mesh)
    # depth buffer: valid hit everywhere except 1.0 background
    app._scene.scene.scene.depth_image = np.full((480, 640), 0.5, np.float32)
    # unproject returns a point near vertex 4
    app._scene.scene.camera.unproject_result = np.array([0.52, 0.48, 0.51])

    ev = FakeMouseEvent(x=100, y=120)
    res = app._mouse_event(ev)
    assert res == gui_app.gui.Widget.EventCallbackResult.HANDLED
    assert len(app.source_pnt) == 1 and len(app.target_pnt) == 0
    np.testing.assert_array_equal(app.source_pnt[0], mesh.vertices[4])
    assert "src0" in app.drag_geometry

    # second pick -> target + arrow overlay
    app._scene.scene.camera.unproject_result = np.array([0.9, 0.05, 0.02])
    app._mouse_event(ev)
    assert len(app.target_pnt) == 1
    np.testing.assert_array_equal(app.target_pnt[0], mesh.vertices[1])
    assert "tgt0" in app.drag_geometry and "arrow0" in app.drag_geometry

    # background click (depth == 1.0) is ignored
    app._scene.scene.scene.depth_image = np.ones((480, 640), np.float32)
    app._mouse_event(ev)
    assert len(app.source_pnt) == 1  # unchanged

    # without CTRL the event is ignored
    res = app._mouse_event(FakeMouseEvent(x=1, y=1, ctrl=False))
    assert res == gui_app.gui.Widget.EventCallbackResult.IGNORED


def test_clear_points_removes_overlays(app):
    app.update_mesh(tri_mesh())
    app.source_pnt.append(np.zeros(3))
    app.target_pnt.append(np.ones(3) * 0.2)
    app._redraw_points()
    assert app.drag_geometry
    app._clear_points()
    assert not app.drag_geometry and not app.source_pnt and not app.target_pnt


def test_make_arrow_orientation():
    """The arrow's +z axis must rotate onto the drag direction."""
    src = np.array([0.1, 0.2, 0.3])
    dst = np.array([0.4, -0.1, 0.5])
    arrow = App._make_arrow(src, dst)
    rotations = [p for k, p in arrow.transforms if k == "rotate"]
    assert len(rotations) == 1
    direction = (dst - src) / np.linalg.norm(dst - src)
    np.testing.assert_allclose(rotations[0] @ [0, 0, 1], direction, atol=1e-8)
    # translated to start at src
    translates = [p for k, p in arrow.transforms if k == "translate"]
    np.testing.assert_allclose(translates[-1], src)
    # degenerate drag -> no arrow
    assert App._make_arrow(src, src) is None
    # z-aligned drag needs no rotation and must not crash
    arrow = App._make_arrow(np.zeros(3), np.array([0, 0, 0.5]))
    assert arrow is not None


def test_save_mesh_writes_editlog(app, tmp_path):
    app.update_mesh(tri_mesh())
    app.source_pnt = [np.array([0.1, 0.2, 0.3])]
    app.target_pnt = [np.array([0.4, 0.5, 0.6])]
    app._save_mesh_btn.click()
    dialog = app.window.dialog
    assert dialog is not None and dialog.mode == gui_app.gui.FileDialog.SAVE
    out = tmp_path / "edited.obj"
    dialog.on_done(str(out))
    assert out.exists()
    log = (tmp_path / "EditLog").read_text()
    assert "Edit01:" in log
    assert "[0.1, 0.2, 0.3]" in log and "[0.4, 0.5, 0.6]" in log
    assert "Scale:1200" in log and "Lambda:0.4" in log
    # window dialog closed
    assert app.window.dialog is None


def test_save_picture_masks_background_white(app, tmp_path):
    pytest.importorskip("PIL")
    from PIL import Image

    app._scene.scene.scene.color_image = np.full((2, 2, 3), 10, np.uint8)
    depth = np.array([[1.0, 0.5], [0.2, 1.0]], np.float32)
    app._scene.scene.scene.depth_image = depth
    app._save_pic_btn.click()
    out = tmp_path / "shot.png"
    app.window.dialog.on_done(str(out))
    img = np.asarray(Image.open(out))
    np.testing.assert_array_equal(img[0, 0], [255, 255, 255])
    np.testing.assert_array_equal(img[1, 1], [255, 255, 255])
    np.testing.assert_array_equal(img[0, 1], [10, 10, 10])


class _FakeEngine:
    def __init__(self):
        self.train_flag = True
        self.w = None
        self.mesh = tri_mesh()
        self.mesh0 = tri_mesh()
        self.reset_called = False
        self.cleared = False

    def reset_params(self):
        self.reset_called = True

    def clear_params(self):
        self.cleared = True


def test_stop_and_reset(app):
    eng = _FakeEngine()
    app.engine = eng
    app._stop_btn.click()
    assert eng.train_flag is False
    app.source_pnt = [np.zeros(3)]
    app._reset_btn.click()
    assert eng.reset_called and not app.source_pnt


def test_start_requires_points_and_latent(app, sync_threads):
    eng = _FakeEngine()
    app.engine = eng
    app._start_btn.click()
    assert app._status.text == "pick matching source/target points first"
    app.source_pnt = [np.zeros(3)]
    app.target_pnt = [np.ones(3) * 0.1]
    app._start_btn.click()  # engine.w is None
    assert app._status.text == 'click "Create Mesh" or "Inversion" first'


def test_create_mesh_with_real_engine(app, sync_threads):
    """Full create-mesh path against the real tiny DragEngine."""
    from ishapediting_tpu.edit.engine import DragEngine
    from tests.test_engine import TINY_PIPELINE

    app.engine = DragEngine(TINY_PIPELINE, seed=0)
    app._latent_edit.text_value = "3"
    app._create_btn.click()
    assert app._status.text == "mesh created"
    assert app.mesh is not None and "mesh" in app._scene.scene.geometry
    assert app.engine.w is not None

    # radius field propagates into the engine config on Start
    app.source_pnt = [app.mesh.vertices[0].astype(np.float64)]
    app.target_pnt = [app.mesh.vertices[0] + np.array([0.15, 0, 0])]
    app._radius_edit.text_value = "3"
    app._grads_scale_edit.text_value = "20"
    app._lambda_edit.text_value = "0.2"
    app._start_btn.click()
    assert app.engine.config.edit.r1 == 3
    # status surfaces the per-step guidance diagnostics on completion
    assert app._status.text.startswith("edit done (motion loss ")
    assert app._progress.value > 0.99

    # fast editing: the Steps field routes edit_steps into drag_edit
    app._edit_steps_edit.text_value = "3"
    app._start_btn.click()
    assert app.engine.last_phase_walls["edit_steps"] == 3
    app._edit_steps_edit.text_value = ""
    app._start_btn.click()
    assert (
        app.engine.last_phase_walls["edit_steps"]
        == app.engine.config.edit.w_time
    )
