"""Headless GUI demo: drive the full interactive app without open3d.

Runs the exact GUI code path a user would exercise (reference: main.py):
create a mesh from a latent, ctrl-click a source and a target handle point
on the RENDERED surface (true depth-unproject picking through the headless
backend's rasterizer + camera), run the drag edit with live progress, and
save the before/after screenshots plus the mesh + EditLog provenance file.

Usage:
    python examples/gui_demo.py --out /tmp/gui_demo [--png docs/gui_demo.png]

Everything runs on CPU with the tiny same-topology preset, so this doubles
as a fast end-to-end exercise of the GUI layer in CI.
"""

import argparse
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")  # env var alone is overridden by
# the axon plugin (docs/PERF.md); the GUI demo never needs the chip.

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ishapediting_tpu.gui.headless import (
    SyntheticMouseEvent,
    install_headless_open3d,
)

install_headless_open3d()  # must precede the gui import

import ishapediting_tpu.gui.app as gui_app  # noqa: E402
from ishapediting_tpu.config import preset  # noqa: E402
from ishapediting_tpu.edit.engine import DragEngine  # noqa: E402


class _SyncThread:
    """Run GUI worker threads synchronously so the script is a straight line."""

    def __init__(self, target=None, daemon=None, args=(), kwargs=None):
        self._target, self._args, self._kwargs = target, args, kwargs or {}

    def start(self):
        self._target(*self._args, **self._kwargs)

    def join(self, timeout=None):
        pass


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/gui_demo")
    ap.add_argument("--png", default=None, help="optional combined before/after png")
    ap.add_argument("--seed", type=int, default=3)
    ap.add_argument("--scale", type=float, default=20.0)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    gui_app.threading.Thread = _SyncThread

    app = gui_app.App(models_root=os.path.join(args.out, "no_models"))
    app.engine = DragEngine(preset("tiny"), seed=0)

    # --- Create Mesh -------------------------------------------------------
    app._latent_edit.text_value = str(args.seed)
    app._create_btn.click()
    assert app._status.text == "mesh created", app._status.text
    print(f"[gui_demo] mesh created: {len(app.mesh.vertices)} vertices")

    def screenshot(path):
        app._save_pic_btn.click()
        app.window.dialog.on_done(path)
        print(f"[gui_demo] wrote {path}")

    before_png = os.path.join(args.out, "before.png")
    screenshot(before_png)

    # --- pick source/target by clicking the rendered surface ----------------
    cam = app._scene.scene.camera
    w, h = app._scene.scene.render_size
    verts = app.mesh.vertices
    view_dir = cam.eye - cam.center
    # click triangle centroids (robust: a rounded vertex pixel can fall off
    # the surface) — frontmost for the source, a far frontmost for the target
    cent = verts[app.mesh.triangles].mean(axis=1)
    facing = (cent - cam.center) @ view_dir
    src_v = cent[int(np.argmax(facing))]
    cand = np.argsort(facing)[-max(20, len(cent) // 5):]
    tgt_v = cent[cand[int(np.argmax(np.linalg.norm(cent[cand] - src_v, axis=1)))]]

    for v in (src_v, tgt_v):
        px, py, _ = cam.project(v, w, h)[0]
        ev = SyntheticMouseEvent(x=int(round(px)), y=int(round(py)))
        app._mouse_event(ev)
    assert len(app.source_pnt) == 1 and len(app.target_pnt) == 1, (
        f"picking failed: {len(app.source_pnt)} sources, "
        f"{len(app.target_pnt)} targets (clicked off-surface?)"
    )
    snap_d = np.linalg.norm(app.source_pnt[0] - src_v)
    print(
        f"[gui_demo] picked source {np.round(app.source_pnt[0], 3)} "
        f"(snapped {snap_d:.3f} from the click), "
        f"target {np.round(app.target_pnt[0], 3)}"
    )

    # --- drag edit -----------------------------------------------------------
    app._grads_scale_edit.text_value = str(args.scale)
    app._lambda_edit.text_value = "0.2"
    app._radius_edit.text_value = "2"
    app._start_btn.click()
    # status carries the per-step guidance diagnostics on completion
    assert app._status.text.startswith("edit done (motion loss "), app._status.text
    print(f"[gui_demo] {app._status.text}, progress={app._progress.value:.2f}")

    after_png = os.path.join(args.out, "after.png")
    screenshot(after_png)

    # --- save mesh + EditLog provenance --------------------------------------
    app._save_mesh_btn.click()
    mesh_path = os.path.join(args.out, "edited.obj")
    app.window.dialog.on_done(mesh_path)
    log_path = os.path.join(args.out, "EditLog")
    assert os.path.isfile(mesh_path) and os.path.isfile(log_path)
    print(f"[gui_demo] wrote {mesh_path} and EditLog:")
    print("    " + open(log_path).read().strip().replace("\n", "\n    "))

    if args.png:
        from PIL import Image

        a = np.asarray(Image.open(before_png))
        b = np.asarray(Image.open(after_png))
        Image.fromarray(np.concatenate([a, b], axis=1)).save(args.png)
        print(f"[gui_demo] wrote {args.png}")


if __name__ == "__main__":
    main()
