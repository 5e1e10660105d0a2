"""Fast (window-respaced) drag editing — framework extension.

The reference walks every one of the ``w_time`` guided steps
(drag_utils.py:336-399); ``drag_edit(edit_steps=k)`` respaces the edit
window to ``k`` kept steps the same way DDIM respacing keeps generation
steps. These tests pin the schedule math (cumulative alphas must match the
engine's chain exactly at kept positions), the feature-row mapping, the
engine path end-to-end on the tiny pipeline, and the guard rails.
"""

import dataclasses

import numpy as np
import pytest
import jax.numpy as jnp

from ishapediting_tpu.core.schedule import (
    make_schedule,
    respaced_schedule_from_keep,
    named_beta_schedule,
    space_timesteps,
)
from ishapediting_tpu.edit.engine import DragEngine
from tests.test_engine import TINY_PIPELINE


@pytest.fixture(scope="module")
def engine():
    eng = DragEngine(TINY_PIPELINE, seed=0)
    eng.update_latent_params(seed=3)
    return eng


SRC = np.array([[0.2, 0.0, 0.0]], np.float32)
TGT = np.array([[0.4, 0.0, 0.0]], np.float32)


# ---------------------------------------------------------------------------
# Schedule math
# ---------------------------------------------------------------------------


def test_fast_schedule_matches_chain_at_kept_positions():
    eng = DragEngine(TINY_PIPELINE, seed=0)
    w_time = TINY_PIPELINE.edit.w_time  # 6 on a 10-step chain
    sched_fast, positions = eng._fast_edit_schedule(3)
    assert sched_fast.num_timesteps == 3 + (eng.sched.num_timesteps - w_time)
    assert len(positions) == 3
    assert positions[0] == 0 and positions[-1] == w_time - 1
    acp_fast = np.asarray(sched_fast.alphas_cumprod)
    acp_full = np.asarray(eng.sched.alphas_cumprod)
    # kept window positions reproduce the engine chain's cumulative alphas
    np.testing.assert_allclose(acp_fast[:3], acp_full[positions], rtol=1e-6)
    # positions above the window are untouched (identity continuation)
    np.testing.assert_allclose(
        acp_fast[3:], acp_full[w_time:], rtol=1e-6
    )
    # the model sees original-chain timesteps at the kept positions
    tmap_full = np.asarray(eng.sched.timestep_map)
    tmap_fast = np.asarray(sched_fast.timestep_map)
    np.testing.assert_array_equal(tmap_fast[:3], tmap_full[positions])


def test_fast_schedule_cached_per_count():
    eng = DragEngine(TINY_PIPELINE, seed=0)
    s1, _ = eng._fast_edit_schedule(3)
    s2, _ = eng._fast_edit_schedule(3)
    assert s1 is s2
    s3, _ = eng._fast_edit_schedule(4)
    assert s3 is not s1


def test_respaced_schedule_from_keep_equals_make_schedule():
    # keeping a "ddim5"-spaced set through the explicit-keep constructor
    # must reproduce make_schedule's respacing bit-for-bit
    base = named_beta_schedule("linear", 100)
    keep = space_timesteps(100, "ddim5")
    a = respaced_schedule_from_keep(base, keep)
    b = make_schedule(100, "linear", "ddim5")
    np.testing.assert_array_equal(
        np.asarray(a.betas), np.asarray(b.betas)
    )
    np.testing.assert_array_equal(
        np.asarray(a.timestep_map), np.asarray(b.timestep_map)
    )


def test_fast_schedule_count_bounds():
    eng = DragEngine(TINY_PIPELINE, seed=0)
    with pytest.raises(ValueError):
        eng._fast_edit_schedule(1)
    with pytest.raises(ValueError):
        eng._fast_edit_schedule(TINY_PIPELINE.edit.w_time)


# ---------------------------------------------------------------------------
# Engine path
# ---------------------------------------------------------------------------


def test_fast_edit_runs_and_changes_latent(engine):
    w_before = np.asarray(engine.w)
    progress = []
    mesh = engine.drag_edit(
        SRC, TGT, scale=100.0, cof=0.2, chunk=2, edit_steps=3,
        progress_callback=progress.append,
    )
    assert mesh is engine.mesh
    assert progress and progress[-1] == pytest.approx(1.0, abs=1e-6)
    np.testing.assert_array_equal(np.asarray(engine.w), w_before)
    # one (motion, mask) diagnostic pair per FAST step
    losses = engine.last_drag_losses
    assert losses["motion"].shape == (3,)
    assert np.all(np.isfinite(losses["motion"]))
    assert np.all(losses["motion"] > 0)
    assert engine.last_phase_walls["edit_steps"] == 3
    assert np.isfinite(np.asarray(engine.edited_latent)).all()


def test_full_edit_unaffected_by_feature(engine):
    # the default path still walks all w_time steps and reports that
    engine.drag_edit(SRC, TGT, scale=100.0, cof=0.2, chunk=2)
    w_time = TINY_PIPELINE.edit.w_time
    assert engine.last_drag_losses["motion"].shape == (w_time,)
    assert engine.last_phase_walls["edit_steps"] == w_time


def test_fast_edit_config_default(engine):
    # config.edit.edit_steps supplies the default; per-call arg overrides
    cfg = dataclasses.replace(
        TINY_PIPELINE,
        edit=dataclasses.replace(TINY_PIPELINE.edit, edit_steps=3),
    )
    eng = DragEngine(cfg, seed=0)
    eng.update_latent_params(seed=3)
    eng.drag_edit(SRC, TGT, scale=100.0, cof=0.2, chunk=2)
    assert eng.last_drag_losses["motion"].shape == (3,)
    eng.drag_edit(SRC, TGT, scale=100.0, cof=0.2, chunk=2,
                  edit_steps=cfg.edit.w_time)  # >= w_time = full walk
    assert eng.last_drag_losses["motion"].shape == (cfg.edit.w_time,)


def test_fast_edit_rejects_recorded_noise_modes(engine):
    for mode in ("replay", "fixed_variance"):
        with pytest.raises(ValueError, match="resample"):
            engine.drag_edit(
                SRC, TGT, scale=100.0, cof=0.2, chunk=2,
                edit_steps=3, noise_mode=mode,
            )


@pytest.mark.slow
def test_fast_edit_guidance_effect_gate():
    """Fast editing at 2/3 of w_time keeps guidance effective.

    Same asset + measure as tests/test_edit_gate.py but resample-mode
    (the only mode fast editing supports) and averaged over 8 fixed drag
    seeds — the toy prior's instance variance is high, so single-seed
    reductions swing ±30% (docs/PERF.md "Fast editing": mean +10.7%,
    min +1.2% at 8/12 steps). Gates sit well under the recorded values
    to absorb fp drift while still catching a sign/wiring/feature-row
    regression."""
    import os

    from tools.make_edit_gate_asset import _engine_from_parts
    from tests.test_edit_gate import ASSET, _unflatten

    if not os.path.exists(ASSET):
        pytest.skip("edit_gate.npz asset not built")
    npz = np.load(ASSET)
    eng = _engine_from_parts(
        _unflatten(npz, "ema"),
        _unflatten(npz, "dec"),
        npz["half_range"],
        npz["middle"],
    )
    eng.latent_inversion(jnp.asarray(npz["latent0"][None]), seed=0)
    mesh0 = eng.mesh0
    handle = mesh0.vertices[np.argmax(mesh0.vertices[:, 0])].astype(
        np.float32
    )
    target = handle + np.array([0.25, 0, 0], np.float32)
    scale, cof = float(npz["scale"]), float(npz["cof"])
    steps = 2 * eng.config.edit.w_time // 3  # 8 of 12

    reds = []
    for seed in range(8):
        kw = dict(seed=seed, chunk=4, noise_mode="resample",
                  edit_steps=steps)
        eng.drag_edit(handle[None], target[None], scale=0.0, cof=0.0, **kw)
        motion0 = float(eng.last_drag_losses["motion"][-1])
        eng.drag_edit(handle[None], target[None], scale=scale, cof=cof, **kw)
        motion = float(eng.last_drag_losses["motion"][-1])
        reds.append(1.0 - motion / motion0)
    assert np.mean(reds) > 0.03, (
        f"fast-edit guidance effect regressed: mean reduction "
        f"{np.mean(reds):+.1%} (recorded +10.7%)"
    )
    assert min(reds) > -0.05, (
        f"fast-edit guidance destabilized a seed: min reduction "
        f"{min(reds):+.1%} (recorded +1.2%)"
    )


def test_fast_edit_cooperative_stop(engine):
    # stop after the first chunk: the remaining fast steps must finish
    # unguided on the fast schedule and still produce a final-level latent
    calls = []

    def stop_after_first(frac):
        calls.append(frac)
        engine.train_flag = False

    mesh = engine.drag_edit(
        SRC, TGT, scale=100.0, cof=0.2, chunk=2, edit_steps=4,
        progress_callback=stop_after_first,
    )
    assert len(calls) == 1  # stopped after one chunk
    assert mesh is engine.mesh
    assert np.isfinite(np.asarray(engine.edited_latent)).all()
    # only the guided steps that actually ran are reported
    assert engine.last_drag_losses["motion"].shape == (2,)
