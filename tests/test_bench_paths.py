"""CI coverage for bench.py's product-path section at tiny scale.

The driver runs bench.py once per round on the real chip; a crash inside
``bench_product_paths`` would cost the round's BENCH record. This exercises
the exact code path (engine init, decoder-bias surface calibration,
inversion, replay drag, fit, phase table) on CPU with the tiny preset.
"""

import numpy as np
import pytest

from ishapediting_tpu.config import preset


def test_bench_product_paths_tiny():
    import bench

    cfg = preset("tiny")
    out = bench.bench_product_paths(
        flops_fwd=1e9, cfg=cfg, remat=False
    )
    for key in (
        "edit_wall_s",
        "edit_wall_cold_s",
        "inversion_wall_s",
        "inversion_wall_cold_s",
        "fit_wall_s",
        "fit_wall_cold_s",
        "mesh_decode_wall_s",
        "decode_device_s",
        "grid_fetch_s",
    ):
        assert key in out and np.isfinite(out[key]) and out[key] >= 0, key
    # the calibrated decoder must actually produce a surface
    assert out["mesh_verts"] > 0
    # mesh-tail micro-bench: device and host marching agree on the sphere
    assert out["mesh_tail_tris"] > 0
    assert out["mesh_tail_tris"] == out["mesh_tail_tris_host"]
    assert out["mesh_tail_device_s"] >= 0 and out["mesh_tail_host_s"] >= 0
    pt = out["phase_tflops"]
    for key in ("drag_step", "inversion", "fit_step", "decode_grid"):
        # tiny-scale TF/s rounds to 0.0 at one decimal; finiteness and
        # non-negativity are the structural contract
        assert np.isfinite(pt[key]) and pt[key] >= 0, key


def test_bench_product_paths_deadline_truncates():
    """An exhausted budget skips the remaining phases but still returns a
    well-formed partial dict (protects the driver BENCH record from a hard
    external timeout)."""
    import time

    import bench

    cfg = preset("tiny")
    out = bench.bench_product_paths(
        flops_fwd=1e9, cfg=cfg, remat=False, deadline=time.perf_counter() - 1.0
    )
    assert out["product_truncated"] == "inversion"
    assert "inversion_wall_s" not in out and "edit_wall_s" not in out
    assert "decode_grid" in out["phase_tflops"]


@pytest.mark.slow
def test_bench_quality_subprocess():
    """The quality block the driver bench embeds: the CPU subprocess must
    return the BASELINE.md quantity-(d) metrics from the committed gate
    asset, with inversion replay near-perfect and guidance effective."""
    import bench

    out = bench.bench_quality_subprocess()
    assert "quality" in out, out.get("quality_error")
    q = out["quality"]
    assert q["inversion_replay_cd"] < 1e-3
    assert q["inversion_replay_iou"] > 0.98
    assert q["motion_loss_reduction"] >= 0.5 * q["recorded_reduction"]
    assert q["edit_locality_iou"] >= 0.5
