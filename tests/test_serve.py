"""Edit server (cli/serve.py): protocol handling + full engine flow through
the JSON-lines interface."""

import io
import json

import numpy as np
import pytest

from ishapediting_tpu.cli.serve import EditServer, serve_loop
from ishapediting_tpu.edit.engine import DragEngine
from tests.test_engine import TINY_PIPELINE


@pytest.fixture(scope="module")
def server():
    s = EditServer()
    s.engine = DragEngine(TINY_PIPELINE, seed=0)
    return s


def test_unknown_and_ping():
    s = EditServer()
    assert s.handle({"cmd": "nope"})["ok"] is False
    assert s.handle({})["ok"] is False
    r = s.handle({"cmd": "ping"})
    assert r["ok"] and r["pong"]


def test_status_and_engine_guard():
    s = EditServer()
    assert s.handle({"cmd": "status"})["engine"] is None
    r = s.handle({"cmd": "sample"})
    assert r["ok"] is False and "no engine" in r["error"]


def test_sample_drag_capture_flow(server, tmp_path):
    r = server.handle({"cmd": "sample", "seed": 3})
    assert r["ok"] and r["vertices"] > 0
    st = server.handle({"cmd": "status"})["engine"]
    assert st["has_latent"] and st["has_mesh"]

    events = []
    src = server.engine.mesh.vertices[0].tolist()
    tgt = (np.asarray(src) + [0.15, 0, 0]).tolist()
    r = server.handle(
        {"cmd": "drag", "sources": [src], "targets": [tgt],
         "scale": 20, "cof": 0.2, "chunk": 2},
        emit=events.append,
    )
    assert r["ok"] and r["vertices"] > 0 and not r["stopped_early"]
    # guidance diagnostics ride along in the response
    assert r["motion_loss_first"] > 0 and np.isfinite(r["motion_loss_last"])
    values = [e["value"] for e in events if e.get("event") == "progress"]
    assert values and values[-1] > 0.99

    r = server.handle({"cmd": "save_mesh", "path": str(tmp_path / "m" / "e.obj")})
    assert r["ok"] and (tmp_path / "m" / "e.obj").exists()
    r = server.handle(
        {"cmd": "save_mesh", "path": str(tmp_path / "orig.obj"), "which": "original"}
    )
    assert r["ok"]

    r = server.handle({"cmd": "render", "path": str(tmp_path / "shot.png"), "size": 64})
    assert r["ok"] and (tmp_path / "shot.png").exists()

    r = server.handle({"cmd": "metrics", "points": 2000})
    assert r["ok"] and r["chamfer"] >= 0 and r["hausdorff"] >= 0

    r = server.handle({"cmd": "edit_log", "path": str(tmp_path / "EditLog")})
    assert r["ok"] and r["edit_id"] == "01"
    log = (tmp_path / "EditLog").read_text()
    assert "Edit01:" in log and "Scale:20" in log

    assert server.handle({"cmd": "reset"})["ok"]
    assert server.handle({"cmd": "stop"})["ok"]
    assert server.engine.train_flag is False


def test_drag_edit_steps_passthrough(server):
    # fast editing (framework extension): the request's edit_steps reaches
    # the engine and the walk runs that many guided steps
    server.handle({"cmd": "sample", "seed": 3})
    src = server.engine.mesh.vertices[0].tolist()
    tgt = (np.asarray(src) + [0.15, 0, 0]).tolist()
    r = server.handle(
        {"cmd": "drag", "sources": [src], "targets": [tgt],
         "scale": 20, "cof": 0.2, "chunk": 2, "edit_steps": 3},
    )
    assert r["ok"], r
    assert server.engine.last_phase_walls["edit_steps"] == 3


def test_fit_command_with_fit_steps(server, tmp_path):
    """The fit command runs the real-shape pipeline; fit_steps (fast
    fitting, framework extension) reaches the engine."""
    from ishapediting_tpu.geometry.marching import grid_to_mesh

    x = np.linspace(-1, 1, 24)
    X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
    sphere = grid_to_mesh((0.5 - np.sqrt(X**2 + Y**2 + Z**2)).astype(np.float32))
    mesh_path = tmp_path / "target.obj"
    sphere.write(str(mesh_path))

    server.engine.clear_params()
    r = server.handle(
        {"cmd": "fit", "mesh_path": str(mesh_path),
         "workdir": str(tmp_path), "fit_steps": 4}
    )
    assert r["ok"], r
    assert r["vertices"] >= 0 and (tmp_path / "tri_feat.npy").exists()
    assert server.engine.last_phase_walls["fit_steps"] == 4


def test_drag_validates_points(server):
    server.handle({"cmd": "sample", "seed": 3})
    r = server.handle({"cmd": "drag", "sources": [[0, 0, 0]], "targets": []})
    assert r["ok"] is False and "equal-length" in r["error"]


def test_serve_loop_protocol():
    reqs = "\n".join(
        [
            '{"cmd": "ping"}',
            "not json",
            '{"cmd": "status"}',
            '{"cmd": "quit"}',
            '{"cmd": "ping"}',  # after quit: must not be processed
        ]
    )
    out = io.StringIO()
    serve_loop(io.StringIO(reqs + "\n"), out)
    lines = [json.loads(l) for l in out.getvalue().splitlines()]
    assert lines[0] == {"ok": True, "cmd": "ping", "pong": True}
    assert lines[1]["ok"] is False and "bad json" in lines[1]["error"]
    assert lines[2]["cmd"] == "status"
    assert lines[3]["cmd"] == "quit" and lines[3]["bye"]
    assert len(lines) == 4  # nothing after quit


def test_serve_loop_eof_terminates():
    out = io.StringIO()
    serve_loop(io.StringIO(""), out)  # immediate EOF
    assert out.getvalue() == ""


def test_init_random_tiny():
    s = EditServer()
    r = s.handle({"cmd": "init_random", "preset": "tiny", "seed": 1})
    assert r["ok"] and s.engine is not None
    assert s.engine.config.unet.image_size == 16


def test_morph_command(server, tmp_path):
    events = []
    out = tmp_path / "m"
    r = server.handle(
        {"cmd": "morph", "seed_a": 1, "seed_b": 2, "frames": 3,
         "smooth": 2, "out_dir": str(out)},
        emit=events.append,
    )
    assert r["ok"], r
    assert r["frames"] == 3
    lat = np.load(out / "latents.npy")
    assert lat.shape[0] == 3 and np.isfinite(lat).all()
    assert [e["frame"] for e in events if e.get("event") == "morph_frame"] \
        == [0, 1, 2]
    for k in range(3):
        assert (out / f"frame_{k:02d}.obj").exists()
    # latent-path endpoints: reuse a frame as endpoint A
    np.save(tmp_path / "a.npy", lat[0])
    r = server.handle(
        {"cmd": "morph", "latent_a": str(tmp_path / "a.npy"),
         "seed_b": 2, "frames": 2}
    )
    assert r["ok"] and r["frames"] == 2


def test_generate_command(server, tmp_path):
    """Batch generation over the serve protocol (cli.generate parity):
    per-request sampler/step respacing, streamed events, reference output
    layout."""
    events = []
    out = str(tmp_path / "gen")
    r = server.handle(
        {"cmd": "generate", "num_samples": 3, "batch_size": 2,
         "sampler": "dpm", "num_steps": 6, "seed": 1, "out_dir": out,
         "decode": True, "shape_resolution": 24, "smooth": 0},
        emit=events.append,
    )
    assert r["ok"], r
    assert r["num_samples"] == 3 and r["sampler"] == "dpm"
    assert 2 <= r["realized_steps"] <= 6
    assert len(r["vertices"]) == 3
    import os
    tri = sorted(os.listdir(os.path.join(out, "triplanes")))
    assert tri == ["0.npy", "1.npy", "2.npy"]
    a = np.load(os.path.join(out, "triplanes", "0.npy"))
    cfg = server.engine.config
    assert a.shape == (cfg.latent_shape[2], cfg.latent_shape[0], cfg.latent_shape[1])
    objs = sorted(os.listdir(os.path.join(out, "objects")))
    assert objs == ["0.obj", "1.obj", "2.obj"]
    assert sum(1 for e in events if e.get("event") == "gen_batch") == 2
    assert sum(1 for e in events if e.get("event") == "gen_mesh") == 3

    # bad sampler is a protocol error, not a crash
    r = server.handle({"cmd": "generate", "sampler": "magic"})
    assert r["ok"] is False and "sampler" in r["error"]
