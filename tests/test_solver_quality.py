"""Mesh-level solver-quality gate for the fewer-step headline claim.

The bench reports DPM-Solver++(2M) at 25 (and fewer) steps as a throughput
co-headline on the strength of "holds DDIM-50 quality". This test pins that
claim where users feel it — the extracted surface, not latent RMS: on the
committed toy checkpoint, the mesh decoded from a dpm25/dpm16 sample must
sit at least as close (Chamfer, with seed-noise margin) to the dense-chain
probability-flow ODE solution as the ddim50 mesh does, and must not lose
volumetric IoU. Recorded sweep (tools/bench_quality.py, 3 seeds): ddim50
cd 4.5e-05 / iou 0.80; dpm25 cd 1.5e-05 / iou 0.93; dpm16 cd 1.7e-05 /
iou 0.92; dpm12 cd 2.8e-05 / iou 0.85.

Solver family under test: reference gaussian_diffusion.py:534-847
(DDPM/DDIM) vs the framework's DPM-Solver++(2M) extension
(core/diffusion.py::dpm_solver_sample_loop) on the lambda-uniform grid
(core/schedule.py::lambda_uniform_timesteps).
"""

import os

import numpy as np
import pytest

from tests.test_edit_gate import _unflatten

ASSET = os.path.join(os.path.dirname(__file__), "assets", "edit_gate.npz")

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def sweep():
    if not os.path.exists(ASSET):
        pytest.skip("edit_gate.npz asset not built")
    from tools.bench_quality import solver_mesh_sweep
    from tools.make_edit_gate_asset import _engine_from_parts

    npz = np.load(ASSET)
    engine = _engine_from_parts(
        _unflatten(npz, "ema"),
        _unflatten(npz, "dec"),
        npz["half_range"],
        npz["middle"],
    )
    return solver_mesh_sweep(engine, n_seeds=2)


def test_sweep_found_surfaces(sweep):
    assert sweep["seeds"] >= 1, "no toy-prior seed decoded a surface"


@pytest.mark.parametrize("solver", ["dpm25", "dpm16"])
def test_dpm_holds_ddim50_mesh_parity(sweep, solver):
    d50, dpm = sweep["ddim50"], sweep[solver]
    assert dpm["empty"] == 0, f"{solver} decoded an empty mesh"
    assert d50["cd_mean"] is not None and dpm["cd_mean"] is not None
    # recorded margin is ~3x in dpm's favor; 1.5x absorbs seed/XLA drift
    assert dpm["cd_mean"] <= d50["cd_mean"] * 1.5, (
        f"{solver} mesh CD {dpm['cd_mean']} worse than ddim50 "
        f"{d50['cd_mean']} — fewer-step headline claim broken"
    )
    assert dpm["iou_mean"] >= d50["iou_mean"] - 0.05


def test_dpm12_stays_usable(sweep):
    """dpm12 is not a headline claim but must stay in the same fidelity
    class (recorded: cd 2.8e-05 vs ddim50 4.5e-05)."""
    d50, d12 = sweep["ddim50"], sweep["dpm12"]
    assert d12["empty"] == 0
    assert d12["cd_mean"] <= d50["cd_mean"] * 3.0
