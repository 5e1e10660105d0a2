"""End-to-end engine tests on a miniature pipeline (CPU, tiny UNet)."""

import dataclasses
import os

import numpy as np
import pytest
import jax.numpy as jnp

from ishapediting_tpu.config import (
    DiffusionConfig,
    EditConfig,
    FitConfig,
    PipelineConfig,
    UNetConfig,
)
from ishapediting_tpu.edit.engine import (
    DragEngine,
    latent_from_nchw,
    latent_to_nchw,
)

TINY_PIPELINE = PipelineConfig(
    unet=UNetConfig(
        image_size=16,
        in_channels=6,
        model_channels=16,
        out_channels=12,
        num_res_blocks=1,
        attention_ds=(2,),
        channel_mult=(1, 2),
        num_head_channels=8,
        dropout=0.0,
        compute_dtype="float32",
    ),
    diffusion=DiffusionConfig(base_steps=100, timestep_respacing="10"),
    edit=EditConfig(w_time=6, feat_layer=1, shape_resolution=16, r1=1,
                    feat_store_dtype="float32"),
    fit=FitConfig(points_size=2000, batch_points=500, opt_epochs=1),
    plane_channels=2,
)


@pytest.fixture(scope="module")
def engine():
    return DragEngine(TINY_PIPELINE, seed=0)


def test_update_latent_params_caches_state(engine):
    x0 = engine.update_latent_params(seed=3)
    assert x0.shape == (1, 16, 16, 6)
    assert engine.w is not None and engine.w0 is not None
    w_time = TINY_PIPELINE.edit.w_time
    assert engine.feature_guidance.shape[0] == w_time
    assert engine.feature_guidance.shape[1] == 3
    assert engine.mesh is not None and engine.mesh0 is not None


def test_drag_edit_runs_and_changes_latent(engine):
    engine.update_latent_params(seed=3)
    w_before = np.asarray(engine.w)
    progress = []
    src = np.array([[0.2, 0.0, 0.0]])
    tgt = np.array([[0.4, 0.0, 0.0]])
    mesh = engine.drag_edit(
        src, tgt, scale=100.0, cof=0.2, chunk=2,
        progress_callback=progress.append,
    )
    assert mesh is engine.mesh
    assert progress and progress[-1] == pytest.approx(1.0, abs=1e-6)
    # w itself must be untouched (reset_params can restore)
    np.testing.assert_array_equal(np.asarray(engine.w), w_before)
    # per-step guidance diagnostics: one finite (motion, mask) pair per step
    losses = engine.last_drag_losses
    w_time = TINY_PIPELINE.edit.w_time
    assert losses["motion"].shape == (w_time,)
    assert losses["mask"].shape == (w_time,)
    assert np.all(np.isfinite(losses["motion"]))
    assert np.all(losses["motion"] > 0)  # feature mismatch is never exactly 0


def test_drag_edit_scale_change_no_retrace(engine):
    engine.update_latent_params(seed=3)
    src = np.array([[0.2, 0.0, 0.0]])
    tgt = np.array([[0.4, 0.0, 0.0]])
    engine.drag_edit(src, tgt, scale=100.0, cof=0.2, chunk=3)
    n_jitted = len(engine._jit_cache)
    engine.drag_edit(src, tgt, scale=200.0, cof=0.4, chunk=3)
    assert len(engine._jit_cache) == n_jitted  # same compiled fns reused


def test_drag_edit_stop_flag(engine):
    engine.update_latent_params(seed=3)
    src = np.array([[0.2, 0.0, 0.0]])
    tgt = np.array([[0.4, 0.0, 0.0]])
    ticks = []

    def cb(p):
        ticks.append(p)
        engine.train_flag = False  # request stop after first chunk

    engine.drag_edit(src, tgt, scale=100.0, cof=0.2, chunk=2, progress_callback=cb)
    assert len(ticks) == 1  # stopped early, finished unguided
    # diagnostics only cover the guided steps actually run (one chunk)
    assert engine.last_drag_losses["motion"].shape == (2,)


def test_reset_and_clear(engine):
    engine.update_latent_params(seed=3)
    engine.reset_params()
    assert engine.w is engine.w0
    engine.clear_params()
    assert engine.w is None and engine.mesh is None
    with pytest.raises(RuntimeError):
        engine.drag_edit(np.zeros((1, 3)), np.ones((1, 3)))


def test_latent_inversion_replay(engine):
    x0 = engine.update_latent_params(seed=5)
    engine.latent_inversion(jnp.asarray(x0))
    w_time = TINY_PIPELINE.edit.w_time
    assert engine.feature_guidance.shape[0] == w_time
    assert engine.variance_noise.shape[0] == w_time
    assert engine.w.shape == (1, 16, 16, 6)
    # the inversion's replayed sample decodes the same mesh as x0
    assert engine.mesh is not None


def test_w_time_validated_at_editing_entry_points():
    """w_time past the respaced chain raises loudly at the EDITING entry
    points (jitted gathers into timestep_map and coefficient arrays CLAMP
    silently, so an oversized w_time would corrupt generation, feature
    alignment, and replay with no visible failure) — while a
    generation-only engine with the same config still constructs and
    samples (cli.generate --use_dpm carries an unused w_time=170)."""
    import dataclasses

    cfg = dataclasses.replace(
        TINY_PIPELINE,
        diffusion=dataclasses.replace(
            TINY_PIPELINE.diffusion, timestep_respacing="4"
        ),  # 4 respaced steps < w_time=6
    )
    engine = DragEngine(cfg, seed=0)  # construction is fine
    with pytest.raises(ValueError, match="w_time"):
        engine.update_latent_params(seed=1)
    with pytest.raises(ValueError, match="w_time"):
        engine.latent_inversion(
            jnp.zeros((1,) + cfg.latent_shape, jnp.float32)
        )
    # generation-only surface stays usable
    mesh = engine.get_mesh(smooth=0)
    assert mesh.vertices.shape[1] == 3


def test_inversion_chunk_config_plumbing(engine):
    """EditConfig.inversion_chunk reaches ddpm_inversion and any value
    reproduces the default bit-exactly (the backward evaluations are
    independent — core/diffusion.py replay identity)."""
    x0 = engine.update_latent_params(seed=5)
    engine.latent_inversion(jnp.asarray(x0), seed=9)
    w_ref = np.asarray(engine.w)
    vn_ref = np.asarray(engine.variance_noise)

    cfg5 = dataclasses.replace(
        TINY_PIPELINE,
        edit=dataclasses.replace(TINY_PIPELINE.edit, inversion_chunk=5),
    )
    eng5 = DragEngine(cfg5, seed=0)
    eng5.update_latent_params(seed=5)
    eng5.latent_inversion(jnp.asarray(x0), seed=9)
    np.testing.assert_array_equal(np.asarray(eng5.w), w_ref)
    np.testing.assert_array_equal(np.asarray(eng5.variance_noise), vn_ref)


def test_fit_real_shape_roundtrip(engine, tmp_path):
    """Fit a sphere mesh -> latent -> inversion; checks the full real-shape
    pipeline incl. the tri_feat.npy cache contract."""
    from ishapediting_tpu.geometry.marching import grid_to_mesh

    x = np.linspace(-1, 1, 24)
    X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
    sphere = grid_to_mesh((0.5 - np.sqrt(X**2 + Y**2 + Z**2)).astype(np.float32))

    engine.fit_real_shape(mesh=sphere, path=str(tmp_path), seed=0)
    assert os.path.exists(tmp_path / "tri_feat.npy")
    assert os.path.exists(tmp_path / "mesh_recon.obj")
    cached = np.load(tmp_path / "tri_feat.npy")
    assert cached.shape == (1, 6, 16, 16)  # NCHW reference contract
    assert engine.w is not None and engine.feature_guidance is not None

    # reload from cache path (reference: drag_utils.py:403-409)
    engine.clear_params()
    engine.fit_real_shape(tri_feat_path=str(tmp_path / "tri_feat.npy"))
    assert engine.mesh is not None and engine.w is not None


def test_fit_real_shape_fast(engine, tmp_path):
    """fit_steps (fast fitting, framework extension): the guided fit runs on
    a respaced chain, the follow-up inversion still runs the full chain, and
    the phase walls record the realized step count."""
    from ishapediting_tpu.geometry.marching import grid_to_mesh

    x = np.linspace(-1, 1, 24)
    X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
    sphere = grid_to_mesh((0.5 - np.sqrt(X**2 + Y**2 + Z**2)).astype(np.float32))

    engine.clear_params()
    engine.fit_real_shape(mesh=sphere, path=str(tmp_path), seed=0, fit_steps=4)
    walls = engine.last_phase_walls
    assert walls["path"] == "fit" and walls["fit_steps"] == 4
    assert os.path.exists(tmp_path / "tri_feat.npy")
    cached = np.load(tmp_path / "tri_feat.npy")
    assert cached.shape == (1, 6, 16, 16) and np.isfinite(cached).all()
    # inversion state (feature cache, replay noises) is full-chain as usual
    w_time = TINY_PIPELINE.edit.w_time
    assert engine.feature_guidance.shape[0] == w_time
    assert engine.mesh is not None and engine.w is not None

    # fit_steps >= num_timesteps falls back to the full chain
    engine.clear_params()
    engine.fit_real_shape(mesh=sphere, path=str(tmp_path), seed=0,
                          fit_steps=engine.sched.num_timesteps + 5)
    assert engine.last_phase_walls["fit_steps"] == engine.sched.num_timesteps

    with pytest.raises(ValueError):
        engine.fit_real_shape(mesh=sphere, path=str(tmp_path), fit_steps=1)


def test_fit_direct(engine, tmp_path):
    from ishapediting_tpu.geometry.marching import grid_to_mesh

    x = np.linspace(-1, 1, 24)
    X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
    sphere = grid_to_mesh((0.5 - np.sqrt(X**2 + Y**2 + Z**2)).astype(np.float32))
    latent = engine.fit_real_shape_direct(mesh=sphere, path=str(tmp_path), seed=0)
    assert latent.shape == (1, 16, 16, 6)
    assert os.path.exists(tmp_path / "tri_feat_opt.npy")
    assert os.path.exists(tmp_path / "mesh_opt.obj")


def test_latent_nchw_roundtrip(rng):
    x = rng.standard_normal((1, 8, 8, 6)).astype(np.float32)
    back = latent_from_nchw(latent_to_nchw(x))
    np.testing.assert_array_equal(x, back)
    assert latent_to_nchw(x).shape == (1, 6, 8, 8)


def test_drag_noise_modes_and_replay_identity(engine):
    """noise_mode variants (reference's commented case-1/replay modes,
    drag_utils.py:342-346,388-396). With scale=0 the 'replay' mode must
    reproduce the inversion trajectory exactly -> identical mesh."""
    x0 = engine.update_latent_params(seed=11)
    with pytest.raises(RuntimeError):
        engine.drag_edit(
            np.array([[0.2, 0, 0]]), np.array([[0.3, 0, 0]]),
            noise_mode="replay",
        )
    engine.latent_inversion(jnp.asarray(x0))

    src = np.array([[0.2, 0.0, 0.0]])
    tgt = np.array([[0.3, 0.0, 0.0]])
    engine.drag_edit(src, tgt, scale=0.0, cof=0.2, noise_mode="replay", chunk=3)
    # zero-scale replay must walk the exact inversion trajectory back to x0
    np.testing.assert_allclose(engine.edited_latent, x0, atol=1e-4)

    # the other modes run and produce valid meshes
    for mode in ("fixed_variance", "resample"):
        m = engine.drag_edit(src, tgt, scale=50.0, cof=0.2, noise_mode=mode, chunk=3)
        assert np.isfinite(m.vertices).all()
    with pytest.raises(ValueError):
        engine.drag_edit(src, tgt, noise_mode="bogus")


def test_predict_xstart_config_path():
    """DiffusionConfig.predict_xstart wires the x0->eps adapter through the
    engine (previously a dead flag)."""
    cfg = dataclasses.replace(
        TINY_PIPELINE,
        diffusion=dataclasses.replace(TINY_PIPELINE.diffusion, predict_xstart=True),
    )
    eng = DragEngine(cfg, seed=0)
    x0 = eng.update_latent_params(seed=1)
    assert x0.shape == (1, 16, 16, 6)
    assert np.isfinite(x0).all()


def test_bf16_feature_store(engine):
    """EditConfig.feat_store_dtype='bfloat16' halves the guidance-feature
    cache; the drag result must stay close to the fp32-store run (losses
    compute in fp32 either way)."""
    src = np.array([[0.3, 0.0, 0.0]])
    tgt = np.array([[0.45, 0.0, 0.0]])

    engine.update_latent_params(seed=3)
    engine.drag_edit(src, tgt, scale=50.0, cof=0.2, chunk=3)
    w_fp32 = np.asarray(engine.edited_latent)
    ref_latent = np.asarray(engine.latent_code)

    cfg16 = dataclasses.replace(
        TINY_PIPELINE, edit=dataclasses.replace(TINY_PIPELINE.edit,
                                                feat_store_dtype="bfloat16")
    )
    eng16 = DragEngine(cfg16, seed=0)
    eng16.update_latent_params(latent=ref_latent, seed=3)
    assert eng16.feature_guidance.dtype == jnp.bfloat16
    eng16.drag_edit(src, tgt, scale=50.0, cof=0.2, chunk=3)
    w_bf16 = np.asarray(eng16.edited_latent)
    assert np.isfinite(w_bf16).all()
    # same trajectory up to bf16 feature quantization in the guidance grad
    assert np.max(np.abs(w_bf16 - w_fp32)) < 0.15
    assert np.corrcoef(w_bf16.ravel(), w_fp32.ravel())[0, 1] > 0.99

    # inversion path stores bf16 features too, and replay stays exact
    lat = np.asarray(eng16.latent_code)
    eng16.latent_inversion(lat, seed=1)
    assert eng16.feature_guidance.dtype == jnp.bfloat16


def test_phase_wall_attribution(engine, tmp_path):
    """Every public product call attributes its wall-clock: device scan vs
    mesh tail (engine.last_phase_walls), and get_mesh records its own
    breakdown (engine.last_mesh_walls). bench.py surfaces both in the
    driver detail, so the keys and invariants here are load-bearing."""
    x0 = engine.update_latent_params(seed=11)

    engine.latent_inversion(jnp.asarray(x0), seed=1)
    walls = engine.last_phase_walls
    assert walls["path"] == "inversion"
    assert walls["device_s"] >= 0 and walls["mesh_s"] >= 0
    assert walls["total_s"] >= walls["device_s"]
    mesh_walls = engine.last_mesh_walls
    assert mesh_walls["impl"] in ("host", "device")
    assert mesh_walls["n_verts"] == len(engine.mesh.vertices)
    if mesh_walls["impl"] == "host":  # CPU always takes the host path
        for key in ("decode_device_s", "grid_fetch_s", "march_host_s",
                    "smooth_s", "total_s"):
            assert mesh_walls[key] >= 0

    src = np.array([[0.2, 0.0, 0.0]], np.float32)
    tgt = np.array([[0.4, 0.0, 0.0]], np.float32)
    engine.drag_edit(src, tgt, scale=50.0, cof=0.2, chunk=3)
    assert engine.last_phase_walls["path"] == "drag"
    assert engine.last_phase_walls["device_s"] >= 0

    from ishapediting_tpu.geometry.marching import grid_to_mesh

    x = np.linspace(-1, 1, 20)
    X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
    sphere = grid_to_mesh((0.5 - np.sqrt(X**2 + Y**2 + Z**2)).astype(np.float32))
    engine.fit_real_shape(mesh=sphere, path=str(tmp_path), seed=0)
    walls = engine.last_phase_walls
    assert walls["path"] == "fit"
    for key in ("points_s", "guided_s", "inversion_device_s", "mesh_s"):
        assert walls[key] >= 0
    assert walls["total_s"] >= walls["guided_s"]


def test_engine_base_sched_carries_rescale_flag():
    """predict_xstart + rescale_timesteps: the engine's base schedule (used
    by xstart_model_adapter to invert the model-timestep rescale) must carry
    the SAME rescale flag as the respaced chain — otherwise the adapter's
    inversion branch never fires and base-coefficient gathers silently clamp
    (core/diffusion.py::xstart_model_adapter)."""
    import dataclasses

    cfg = dataclasses.replace(
        TINY_PIPELINE,
        diffusion=dataclasses.replace(
            TINY_PIPELINE.diffusion,
            predict_xstart=True,
            rescale_timesteps=True,
        ),
    )
    eng = DragEngine(cfg, seed=0)
    assert eng._base_sched is not None
    assert eng._base_sched.rescale_timesteps is True
    assert eng.sched.rescale_timesteps is True
    # the adapted model path must produce finite output end-to-end
    x0 = eng.update_latent_params(seed=1)
    assert np.isfinite(np.asarray(x0)).all()


def test_decode_latent_grid_slab_fetch_identical(engine, monkeypatch):
    """ISHAPE_FETCH_SLABS>1 (the tunnel's concurrent slab fetch, default 4
    on the axon runtime since round 5) must return byte-identical grids to
    the single fetch."""
    import jax

    latent = jax.random.normal(
        jax.random.PRNGKey(11), (1,) + engine.config.latent_shape
    )
    monkeypatch.setenv("ISHAPE_FETCH_SLABS", "1")
    single = engine.decode_latent_grid(latent, res=16)
    monkeypatch.setenv("ISHAPE_FETCH_SLABS", "4")
    slabbed = engine.decode_latent_grid(latent, res=16)
    np.testing.assert_array_equal(single, slabbed)
