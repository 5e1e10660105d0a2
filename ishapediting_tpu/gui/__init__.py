"""Interactive GUI (optional; requires open3d).

The headless engine (edit/engine.py) covers every capability; this package
adds the reference's interactive click-and-drag front end (reference:
main.py) on top of it. Import is lazy so the core framework has no Open3D
dependency.
"""

def launch(*args, **kwargs):  # pragma: no cover - requires open3d + display
    from ishapediting_tpu.gui.app import App

    App(*args, **kwargs).run()
