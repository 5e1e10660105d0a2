"""The evaluation CLI (cli/eval.py) — the reference's offline metrics
(meshProcess.py:18-105) exposed as a command."""

import json
import os

import numpy as np

from ishapediting_tpu.cli.edit import write_edit_log
from ishapediting_tpu.cli.eval import main as eval_main
from ishapediting_tpu.geometry.marching import grid_to_mesh


def _sphere_mesh(radius=0.6, center=(0.0, 0.0, 0.0), res=40):
    x = np.linspace(-1, 1, res)
    X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
    grid = radius - np.sqrt(
        (X - center[0]) ** 2 + (Y - center[1]) ** 2 + (Z - center[2]) ** 2
    )
    return grid_to_mesh(grid, to_unit=True)


def test_eval_pair_and_dirs(tmp_path, capsys):
    a = _sphere_mesh()
    b = _sphere_mesh(center=(0.08, 0.0, 0.0))
    da, db = tmp_path / "a", tmp_path / "b"
    da.mkdir(), db.mkdir()
    for d, m in ((da, a), (db, b)):
        m.write(str(d / "s0.obj"))
        m.write(str(d / "s1.obj"))

    out = tmp_path / "report.json"
    rows, summary = eval_main(
        [
            "--dir_a", str(da), "--dir_b", str(db),
            "--metrics", "chamfer", "iou",
            "--point_num", "4000",
            "--out", str(out),
        ]
    )
    assert summary["pairs"] == 2
    # identical-to-shifted sphere: chamfer well above zero, IoU in (0, 1)
    assert 1e-4 < summary["chamfer"] < 0.1
    assert 0.3 < summary["iou"] < 0.98
    report = json.loads(out.read_text())
    assert len(report["rows"]) == 2 and report["summary"]["pairs"] == 2
    # each printed line is valid JSON
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert len(lines) == 3

    # identical meshes: chamfer ~ sampling noise, IoU ~ 1
    rows, summary = eval_main(
        ["--mesh_a", str(da / "s0.obj"), "--mesh_b", str(da / "s1.obj"),
         "--metrics", "chamfer", "iou", "--point_num", "4000"]
    )
    assert summary["chamfer"] < 1e-3
    assert summary["iou"] > 0.97


def test_eval_local_from_edit_log(tmp_path):
    a = _sphere_mesh()
    b = _sphere_mesh(center=(0.10, 0.0, 0.0))
    pa, pb = tmp_path / "a.obj", tmp_path / "b.obj"
    a.write(str(pa)), b.write(str(pb))
    log = tmp_path / "EditLog"
    write_edit_log(
        str(log), "01",
        sources=np.array([[0.6, 0.0, 0.0]]),
        targets=np.array([[0.7, 0.0, 0.0]]),
        scale=600.0, lam=0.2,
    )
    rows, summary = eval_main(
        ["--mesh_a", str(pa), "--mesh_b", str(pb),
         "--metrics", "local", "--edit_log", str(log), "--edit_id", "01",
         "--local_r", "0.15", "--point_num", "4000"]
    )
    assert 0.0 < summary["local_iou"] <= 1.0


def test_solver_sweep_mode(tmp_path):
    """--solver_sweep runs the bench's solver-quality methodology on an
    arbitrary engine (here random tiny) and writes the JSON report."""
    import json

    from ishapediting_tpu.cli.eval import main

    report = main([
        "--solver_sweep", "--random_init", "--preset", "tiny",
        "--budgets", "10", "5", "--sweep_seeds", "1", "--max_attempts", "2",
        "--point_num", "2000", "--out", str(tmp_path / "sweep.json"),
    ])
    assert report["ref"] == "ddim100-dense"
    assert "dpm10" in report and "ddim10" in report and "ddpm100" in report
    on_disk = json.load(open(tmp_path / "sweep.json"))
    assert on_disk == report
