"""A minimal in-memory fake of the open3d API surface used by gui/app.py.

Install with ``install_fake_open3d()`` BEFORE importing
``ishapediting_tpu.gui.app``. Every widget is a plain recording object;
``post_to_main_thread`` executes immediately on the calling thread so tests
are deterministic; the scene records added/removed geometry by name.
"""

from __future__ import annotations

import sys
import types

import numpy as np


# --------------------------------------------------------------------------
# geometry
# --------------------------------------------------------------------------


class Vector3dVector(np.ndarray):
    def __new__(cls, data):
        return np.asarray(data, dtype=np.float64).view(cls)


class Vector3iVector(np.ndarray):
    def __new__(cls, data):
        return np.asarray(data, dtype=np.int32).view(cls)


class AxisAlignedBoundingBox:
    def __init__(self, lo, hi):
        self.lo, self.hi = np.asarray(lo), np.asarray(hi)

    def get_center(self):
        return (self.lo + self.hi) / 2


class TriangleMesh:
    def __init__(self):
        self.vertices = np.zeros((0, 3))
        self.triangles = np.zeros((0, 3), np.int32)
        self.color = None
        self.transforms = []  # record of (kind, payload)

    # factories -------------------------------------------------------------
    @staticmethod
    def create_sphere(radius=1.0):
        m = TriangleMesh()
        m.vertices = radius * np.array(
            [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1]],
            np.float64,
        )
        m.triangles = np.array([[0, 2, 4], [1, 3, 5]], np.int32)
        m.kind = "sphere"
        return m

    @staticmethod
    def create_arrow(
        cylinder_radius=1.0, cone_radius=1.5, cylinder_height=5.0, cone_height=4.0
    ):
        m = TriangleMesh()
        # a stick along +z of the given total height (enough for math checks)
        h = cylinder_height + cone_height
        m.vertices = np.array([[0, 0, 0], [0, 0, h], [cone_radius, 0, cylinder_height]])
        m.triangles = np.array([[0, 1, 2]], np.int32)
        m.kind = "arrow"
        return m

    # ops ---------------------------------------------------------------------
    def translate(self, offset):
        self.vertices = self.vertices + np.asarray(offset, np.float64)
        self.transforms.append(("translate", np.asarray(offset, np.float64)))
        return self

    def rotate(self, R, center=None):
        c = np.zeros(3) if center is None else np.asarray(center)
        self.vertices = (self.vertices - c) @ np.asarray(R).T + c
        self.transforms.append(("rotate", np.asarray(R)))
        return self

    def paint_uniform_color(self, color):
        self.color = list(color)
        return self

    def compute_vertex_normals(self):
        return self

    def get_axis_aligned_bounding_box(self):
        if len(self.vertices) == 0:
            return AxisAlignedBoundingBox(np.zeros(3), np.zeros(3))
        return AxisAlignedBoundingBox(self.vertices.min(0), self.vertices.max(0))


def get_rotation_matrix_from_axis_angle(axis_angle):
    """Rodrigues formula — matches open3d's convention."""
    aa = np.asarray(axis_angle, np.float64)
    angle = np.linalg.norm(aa)
    if angle < 1e-12:
        return np.eye(3)
    k = aa / angle
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * (K @ K)


# --------------------------------------------------------------------------
# gui widgets (recording stubs)
# --------------------------------------------------------------------------


class _Widget:
    def __init__(self, *a, **k):
        self.children = []
        self.frame = None

    def add_child(self, c):
        self.children.append(c)


class Label(_Widget):
    def __init__(self, text=""):
        super().__init__()
        self.text = text


class Button(_Widget):
    def __init__(self, text=""):
        super().__init__()
        self.text = text
        self.on_clicked = None

    def set_on_clicked(self, fn):
        self.on_clicked = fn

    def click(self):
        assert self.on_clicked is not None
        return self.on_clicked()


class TextEdit(_Widget):
    def __init__(self):
        super().__init__()
        self.text_value = ""


class Combobox(_Widget):
    def __init__(self):
        super().__init__()
        self.items = []
        self.on_selection_changed = None

    def add_item(self, name):
        self.items.append(name)

    def set_on_selection_changed(self, fn):
        self.on_selection_changed = fn


class ProgressBar(_Widget):
    def __init__(self):
        super().__init__()
        self.value = 0.0


class Vert(_Widget):
    pass


class Horiz(_Widget):
    pass


class Margins:
    def __init__(self, *a):
        pass


class Rect:
    def __init__(self, x=0, y=0, width=0, height=0):
        self.x, self.y, self.width, self.height = x, y, width, height

    def get_right(self):
        return self.x + self.width


class _Camera:
    def __init__(self):
        self.unproject_result = np.zeros(3)
        self.calls = []

    def unproject(self, x, y, depth, w, h):
        self.calls.append((x, y, depth, w, h))
        return self.unproject_result


class _LowLevelScene:
    def __init__(self):
        self.sun = None
        self.depth_image = None  # np array the next depth render returns
        self.color_image = None

    def set_sun_light(self, *a):
        self.sun = a

    def enable_sun_light(self, flag):
        pass

    def render_to_depth_image(self, cb):
        cb(self.depth_image)

    def render_to_image(self, cb):
        cb(self.color_image)


class Open3DScene:
    """Doubles as rendering.Open3DScene; gui SceneWidget.scene."""

    def __init__(self, renderer=None):
        self.geometry = {}
        self.background = None
        self.scene = _LowLevelScene()
        self.camera = _Camera()
        self.camera_setup = None

    def set_background(self, color):
        self.background = color

    def clear_geometry(self):
        self.geometry.clear()

    def add_geometry(self, name, geom, mat):
        self.geometry[name] = geom

    def remove_geometry(self, name):
        self.geometry.pop(name, None)

    def setup_camera(self, fov, bounds, center):
        self.camera_setup = (fov, bounds, center)


class SceneWidget(_Widget):
    def __init__(self):
        super().__init__()
        self.scene = None
        self.on_mouse = None
        self.frame = Rect(0, 0, 640, 480)
        self.camera_setup = None

    def set_on_mouse(self, fn):
        self.on_mouse = fn

    def setup_camera(self, fov, bounds, center):
        self.camera_setup = (fov, bounds, center)


class FileDialog(_Widget):
    OPEN = 0
    SAVE = 1

    def __init__(self, mode, title, theme):
        super().__init__()
        self.mode = mode
        self.on_done = None
        self.on_cancel = None

    def add_filter(self, *a):
        pass

    def set_on_cancel(self, fn):
        self.on_cancel = fn

    def set_on_done(self, fn):
        self.on_done = fn


class _Theme:
    font_size = 14


class _Window:
    def __init__(self, title, width, height):
        self.title = title
        self.theme = _Theme()
        self.content_rect = Rect(0, 0, width, height)
        self.children = []
        self.renderer = object()
        self.on_layout = None
        self.dialog = None

    def add_child(self, c):
        self.children.append(c)

    def set_on_layout(self, fn):
        self.on_layout = fn

    def show_dialog(self, d):
        self.dialog = d

    def close_dialog(self):
        self.dialog = None


class _AppInstance:
    def __init__(self):
        self.windows = []
        self.posted = []

    def initialize(self):
        pass

    def create_window(self, title, width, height):
        w = _Window(title, width, height)
        self.windows.append(w)
        return w

    def post_to_main_thread(self, window, fn):
        # synchronous execution keeps tests deterministic
        self.posted.append(fn)
        fn()

    def run(self):
        pass


class Application:
    instance = _AppInstance()


class MouseEvent:
    class Type:
        BUTTON_DOWN = 1
        BUTTON_UP = 2
        DRAG = 3


class KeyModifier:
    CTRL = 1
    SHIFT = 2


class Widget:
    class EventCallbackResult:
        HANDLED = 1
        IGNORED = 0


class FakeMouseEvent:
    """Helper for tests (not part of open3d)."""

    def __init__(self, x, y, etype=MouseEvent.Type.BUTTON_DOWN, ctrl=True):
        self.x, self.y = x, y
        self.type = etype
        self._ctrl = ctrl

    def is_modifier_down(self, mod):
        return self._ctrl if mod == KeyModifier.CTRL else False


class MaterialRecord:
    def __init__(self):
        self.shader = None


# --------------------------------------------------------------------------
# module assembly
# --------------------------------------------------------------------------


def install_fake_open3d():
    """Create fake open3d module tree in sys.modules; returns the root."""
    o3d = types.ModuleType("open3d")
    geometry = types.ModuleType("open3d.geometry")
    geometry.TriangleMesh = TriangleMesh
    geometry.AxisAlignedBoundingBox = AxisAlignedBoundingBox
    geometry.get_rotation_matrix_from_axis_angle = get_rotation_matrix_from_axis_angle
    utility = types.ModuleType("open3d.utility")
    utility.Vector3dVector = Vector3dVector
    utility.Vector3iVector = Vector3iVector

    vis = types.ModuleType("open3d.visualization")
    gui_mod = types.ModuleType("open3d.visualization.gui")
    for name, obj in [
        ("Application", Application),
        ("SceneWidget", SceneWidget),
        ("Vert", Vert),
        ("Horiz", Horiz),
        ("Margins", Margins),
        ("Label", Label),
        ("Button", Button),
        ("TextEdit", TextEdit),
        ("Combobox", Combobox),
        ("ProgressBar", ProgressBar),
        ("Rect", Rect),
        ("FileDialog", FileDialog),
        ("MouseEvent", MouseEvent),
        ("KeyModifier", KeyModifier),
        ("Widget", Widget),
    ]:
        setattr(gui_mod, name, obj)
    rend_mod = types.ModuleType("open3d.visualization.rendering")
    rend_mod.Open3DScene = Open3DScene
    rend_mod.MaterialRecord = MaterialRecord

    o3d.geometry = geometry
    o3d.utility = utility
    o3d.visualization = vis
    vis.gui = gui_mod
    vis.rendering = rend_mod

    sys.modules["open3d"] = o3d
    sys.modules["open3d.geometry"] = geometry
    sys.modules["open3d.utility"] = utility
    sys.modules["open3d.visualization"] = vis
    sys.modules["open3d.visualization.gui"] = gui_mod
    sys.modules["open3d.visualization.rendering"] = rend_mod
    return o3d
