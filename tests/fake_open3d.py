"""Back-compat shim: the fake open3d grew into a real headless backend at
``ishapediting_tpu.gui.headless`` (true rasterized rendering + camera
unprojection). Tests keep importing from here.
"""

from ishapediting_tpu.gui.headless import (  # noqa: F401
    Application,
    AxisAlignedBoundingBox,
    Button,
    Camera,
    Combobox,
    FileDialog,
    KeyModifier,
    Label,
    Margins,
    MaterialRecord,
    MouseEvent,
    Open3DScene,
    ProgressBar,
    Rect,
    SceneWidget,
    SyntheticMouseEvent,
    TriangleMesh,
    Vector3dVector,
    Vector3iVector,
    Widget,
    get_rotation_matrix_from_axis_angle,
    install_headless_open3d,
)

FakeMouseEvent = SyntheticMouseEvent
install_fake_open3d = install_headless_open3d
