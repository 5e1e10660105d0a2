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
        "fast_edit_wall_s",
        "fast_edit_wall_cold_s",
        "inversion_wall_s",
        "inversion_wall_cold_s",
        "fit_wall_s",
        "fit_wall_cold_s",
        "fast_fit_wall_s",
        "fast_fit_wall_cold_s",
        "mesh_decode_wall_s",
        "decode_device_s",
        "grid_fetch_s",
    ):
        assert key in out and np.isfinite(out[key]) and out[key] >= 0, key
    # every product path records its mesh walls (fit's surface differs
    # from the edit/inversion latents, so an outlier must be attributable)
    assert "fit_mesh_walls" in out and isinstance(out["fit_mesh_walls"], dict)
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
    # CI pin for the bench's DPM-quality claim: half the steps, <= error
    assert q["solver"]["dpm_half_rms"] <= q["solver"]["ddim_rms"]
    assert q["solver"]["dpm_half_steps"] <= q["solver"]["ddim_steps"] // 2 + 1


def test_backend_unavailable_predicate():
    """The bench entrypoint re-execs ONLY on the tunnel backend-init outage
    signature — a program error must surface immediately, not retry for
    minutes under the driver's capture timeout."""
    import bench

    wedge = RuntimeError(
        "Unable to initialize backend 'axon': UNAVAILABLE: TPU backend "
        "setup/compile error (Unavailable)."
    )
    assert bench._backend_unavailable(wedge)
    assert bench._backend_unavailable(
        RuntimeError("UNAVAILABLE: TPU backend setup/compile error")
    )
    assert not bench._backend_unavailable(ValueError("shape mismatch"))
    assert not bench._backend_unavailable(RuntimeError("INTERNAL: bad HLO"))


def _run_guard_script(tmp_path, body, extra_env=None, timeout=120):
    import json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "drive.py"
    script.write_text(
        "import sys\n"
        f"sys.path.insert(0, {repo!r})\n"
        "import bench\n" + body + "bench._guarded_main()\n"
    )
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"  # also disables the tunnel probe
    env["ISHAPE_BENCH_RETRY_WAIT_S"] = "0"
    env.pop("ISHAPE_BENCH_ATTEMPT", None)
    env.pop("ISHAPE_BENCH_EPOCH0", None)
    env.update(extra_env or {})
    r = subprocess.run(
        [sys.executable, str(script)],
        capture_output=True,
        text=True,
        timeout=timeout,
        env=env,
    )
    json_lines = [
        json.loads(l) for l in r.stdout.splitlines() if l.startswith("{")
    ]
    return r, json_lines


def test_bench_guard_reexec_emits_degraded_json(tmp_path):
    """The __main__ guard re-execs ONCE on the backend-outage signature,
    emits a degraded-but-parseable JSON line before every re-exec and on the
    final failure — rc=124-with-no-JSON (BENCH_r03) must be impossible.
    Driven as a real subprocess because os.execv replaces the process."""
    r, json_lines = _run_guard_script(
        tmp_path,
        "def boom():\n"
        "    raise RuntimeError(\n"
        "        \"Unable to initialize backend 'axon': UNAVAILABLE: \"\n"
        "        'TPU backend setup/compile error (Unavailable).')\n"
        "bench.main = boom\n",
    )
    assert r.returncode != 0  # program gave up; rc signals the raise
    assert r.stderr.count("re-exec") == 1
    assert "attempt 1/2" in r.stderr
    # one degraded line per attempt: before the re-exec + at the final raise
    assert len(json_lines) == 2
    for rec in json_lines:
        assert rec["metric"] == "triplane_samples_per_sec_ddim50"
        assert rec["value"] is None
        assert "UNAVAILABLE" in rec["error"]


def test_bench_guard_program_error_still_emits_json(tmp_path):
    """A genuine program error must NOT retry for minutes — it surfaces
    immediately — but the degraded JSON line still lands first."""
    r, json_lines = _run_guard_script(
        tmp_path,
        "def boom():\n"
        "    raise ValueError('shape mismatch somewhere')\n"
        "bench.main = boom\n",
    )
    assert r.returncode != 0
    assert "re-exec" not in r.stderr
    assert len(json_lines) == 1
    assert json_lines[0]["value"] is None
    assert "shape mismatch" in json_lines[0]["error"]


def test_bench_guard_global_deadline_emits_json(tmp_path):
    """If main() hangs past the global budget, the deadline guard emits a
    degraded JSON line (carrying any partial measurements) and exits 0."""
    r, json_lines = _run_guard_script(
        tmp_path,
        "import time\n"
        "def hang():\n"
        "    bench._PARTIAL['value'] = 3.9\n"
        "    bench._PARTIAL['detail'] = {'compile_s': 12.0}\n"
        "    time.sleep(600)\n"
        "bench.main = hang\n",
        extra_env={"ISHAPE_BENCH_BUDGET_S": "50"},  # guard fires at ~5s left
    )
    assert r.returncode == 0
    assert len(json_lines) == 1
    rec = json_lines[0]
    assert "budget expired" in rec["error"]
    # partial headline measurements ride along on the degraded record
    assert rec["value"] == 3.9
    assert rec["detail"]["compile_s"] == 12.0


def test_bench_guard_deadline_survives_interim_probe_emission(tmp_path):
    """A first-probe failure emits an INTERIM degraded line (the run is
    still going for a real record) — it must NOT disarm the deadline
    guard: if the retried probe succeeds and main() then hangs past the
    budget, the guard still bails with a FINAL line and exits 0. Before
    the final= split, the interim emission set _JSON_EMITTED and the
    guard treated the null-value probe notice as 'record already safe',
    leaving a hung process for the driver's external kill — the exact
    client-kill that wedges the tunnel."""
    r, json_lines = _run_guard_script(
        tmp_path,
        "import time\n"
        "calls = []\n"
        "def flaky_probe(cap):\n"
        "    calls.append(cap)\n"
        "    return len(calls) > 1  # dead once, then alive\n"
        "bench._probe_tunnel = flaky_probe\n"
        "def hang():\n"
        "    bench._PARTIAL['value'] = 3.9\n"
        "    time.sleep(600)\n"
        "bench.main = hang\n",
        # env JAX_PLATFORMS != cpu so the probe path is active; probes are
        # stubbed, so no backend is ever touched
        extra_env={"JAX_PLATFORMS": "axon", "ISHAPE_BENCH_BUDGET_S": "50"},
    )
    assert r.returncode == 0
    assert len(json_lines) == 2  # interim probe notice + final deadline bail
    assert "retrying once" in json_lines[0]["error"]
    final = json_lines[-1]
    assert "budget expired" in final["error"]
    assert final["value"] == 3.9  # partial headline rides the final record


def test_probe_tunnel_alive_and_wedged():
    """The liveness probe returns True on a healthy backend (CPU here) and
    False when the child can't finish before its self-deadline — without
    ever hard-killing the child (a killed tunnel client wedges the server,
    which is the exact failure the probe detects)."""
    import os

    import bench

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    assert bench._probe_tunnel(120.0)
    # a 0-second self-deadline fires before jax import completes: the child
    # exits 7 on its own timer, never killed from outside
    assert not bench._probe_tunnel(0.0)


def test_bench_guard_dead_tunnel_salvages_quality(tmp_path):
    """With the tunnel dead all round (both probes fail), the guard still
    emits a degraded JSON line carrying the CPU-measured quality block, and
    exits 0 — the round lands evidence even with no chip."""
    r, json_lines = _run_guard_script(
        tmp_path,
        "bench._probe_tunnel = lambda cap: False\n"
        "bench.bench_quality_subprocess = (\n"
        "    lambda timeout_s: {'quality': {'salvaged': True}})\n"
        "def never(*a, **k):\n"
        "    raise AssertionError('main must not run with a dead tunnel')\n"
        "bench.main = never\n",
        # env JAX_PLATFORMS != cpu so the probe path is active; the probes
        # are stubbed, so no backend is ever touched
        extra_env={"JAX_PLATFORMS": "axon"},
        timeout=180,
    )
    assert r.returncode == 0
    assert len(json_lines) == 2  # first-probe degraded + final salvage
    final = json_lines[-1]
    assert "wedged all round" in final["error"]
    assert final["detail"]["quality"] == {"salvaged": True}


def test_bench_guard_success_passthrough(tmp_path):
    """A healthy main() prints exactly one real JSON line; the guard adds
    nothing."""
    r, json_lines = _run_guard_script(
        tmp_path,
        "def ok():\n"
        "    import json\n"
        "    print(json.dumps({'metric': 'triplane_samples_per_sec_ddim50',\n"
        "                      'value': 4.0, 'unit': 's', 'vs_baseline': 1.0,\n"
        "                      'detail': {}}), flush=True)\n"
        "    bench._JSON_EMITTED.set()\n"
        "bench.main = ok\n",
    )
    assert r.returncode == 0
    assert len(json_lines) == 1
    assert json_lines[0]["value"] == 4.0


def test_bench_product_paths_fail_soft(monkeypatch):
    """A mid-bench failure returns partial results + product_error instead
    of raising — protects the already-measured headline metric."""
    import bench
    import ishapediting_tpu.edit.engine as engine_mod

    def boom(*a, **k):
        raise RuntimeError("tunnel died mid-bench")

    monkeypatch.setattr(engine_mod, "DragEngine", boom)
    out = bench.bench_product_paths(1e12)
    assert out["product_error"].startswith("RuntimeError: tunnel died")
