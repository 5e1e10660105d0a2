"""Batched multi-shape drag editing on the virtual 8-device mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ishapediting_tpu.edit.batch import (
    build_batched_problems,
    drag_edit_batched,
    fit_real_shapes_batched,
    invert_batched,
    stack_problems,
)
from ishapediting_tpu.edit.drag import build_drag_problem, drag_edit_scan
from ishapediting_tpu.edit.engine import DragEngine
from ishapediting_tpu.parallel.mesh import make_mesh
from tests.test_engine import TINY_PIPELINE


@pytest.fixture(scope="module")
def engine():
    return DragEngine(TINY_PIPELINE, seed=0)


def test_stack_problems_handle_mismatch():
    p1 = build_drag_problem(
        np.zeros((1, 3)), np.ones((1, 3)) * 0.1, r1=1, voxel_size=0.1, feat_width=8
    )
    p2 = build_drag_problem(
        np.zeros((2, 3)), np.ones((2, 3)) * 0.1, r1=1, voxel_size=0.1, feat_width=8
    )
    with pytest.raises(ValueError):
        stack_problems([p1, p2])


def test_batched_matches_per_shape(engine):
    """vmapped batched edit must equal independent per-shape edits."""
    w_time = TINY_PIPELINE.edit.w_time
    edit_cfg = TINY_PIPELINE.edit
    n = 2

    ws, feats, problems, singles = [], [], [], []
    for i in range(n):
        engine.update_latent_params(seed=20 + i)
        ws.append(np.asarray(engine.w))
        feats.append(np.asarray(engine.feature_guidance))
        src = np.array([[0.1 * (i + 1), 0.0, 0.0]], np.float32)
        tgt = src + np.array([[0.15, 0.0, 0.0]], np.float32)
        singles.append((src, tgt))
        problems.append(
            build_drag_problem(
                src, tgt, r1=edit_cfg.r1, voxel_size=edit_cfg.voxel_size,
                feat_width=feats[-1].shape[-2],
            )
        )

    stacked = stack_problems(problems)
    rng = jax.random.PRNGKey(0)
    model_fn_p = engine.model_fn_p(feat=True)
    out = drag_edit_batched(
        engine.sched,
        model_fn_p,
        engine.unet_params,
        jnp.asarray(np.stack(ws)),
        jnp.asarray(np.stack(feats)),
        stacked,
        rng,
        w_time=w_time,
        scale=50.0,
        cof=0.2,
    )
    assert out.shape == (n, 1, 16, 16, 6)

    # reference: per-shape scan with the same per-shape rng
    keys = jax.random.split(rng, n)
    for i in range(n):
        ref = drag_edit_scan(
            engine.sched,
            lambda x, t: model_fn_p(engine.unet_params, x, t),
            problems[i],
            jnp.asarray(ws[i]),
            jnp.asarray(feats[i]),
            keys[i],
            w_time=w_time,
            scale=50.0,
            cof=0.2,
        )
        np.testing.assert_allclose(
            np.asarray(out[i]), np.asarray(ref), atol=2e-4
        )


def test_batched_fast_edit_matches_single_scan(engine):
    """Fast editing (edit_positions): the batched walk on the window-
    respaced schedule must equal the single-shape scan over the same fast
    schedule with the feature rows gathered by hand — pinning both the
    row-gather order and the schedule handoff (framework extension,
    docs/PERF.md 'Fast editing')."""
    from ishapediting_tpu.core.schedule import (
        fast_edit_schedule,
        named_beta_schedule,
    )

    w_time = TINY_PIPELINE.edit.w_time  # 6
    edit_cfg = TINY_PIPELINE.edit
    engine.update_latent_params(seed=31)
    w = np.asarray(engine.w)
    feats = np.asarray(engine.feature_guidance)
    src = np.array([[0.2, 0.0, 0.0]], np.float32)
    tgt = src + np.array([[0.15, 0.0, 0.0]], np.float32)
    problem = build_drag_problem(
        src, tgt, r1=edit_cfg.r1, voxel_size=edit_cfg.voxel_size,
        feat_width=feats.shape[-2],
    )
    base = named_beta_schedule(
        TINY_PIPELINE.diffusion.noise_schedule,
        TINY_PIPELINE.diffusion.base_steps,
    )
    sched_fast, positions = fast_edit_schedule(
        engine.sched, base, w_time, 3,
        rescale_timesteps=TINY_PIPELINE.diffusion.rescale_timesteps,
    )
    n_steps = len(positions)

    rng = jax.random.PRNGKey(7)
    model_fn_p = engine.model_fn_p(feat=True)
    out = drag_edit_batched(
        sched_fast,
        model_fn_p,
        engine.unet_params,
        jnp.asarray(w[None]),
        jnp.asarray(feats[None]),
        stack_problems([problem]),
        rng,
        w_time=w_time,
        scale=50.0,
        cof=0.2,
        edit_positions=positions,
    )
    assert np.isfinite(np.asarray(out)).all()

    # single-shape reference: same fast schedule, rows gathered by hand.
    # drag_edit_scan consumes features[k] at fast t = n_steps-1-k, whose
    # guidance lives at full-cache row w_time-1-positions[t] — the same
    # order drag_edit_batched gathers internally.
    rows = w_time - 1 - positions[::-1]
    feats_fast = feats[rows].copy()
    key = jax.random.split(rng, 1)[0]
    ref = drag_edit_scan(
        sched_fast,
        lambda x, t: model_fn_p(engine.unet_params, x, t),
        problem,
        jnp.asarray(w),
        jnp.asarray(feats_fast),
        key,
        w_time=n_steps,
        scale=50.0,
        cof=0.2,
    )
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref), atol=2e-4)


def test_batched_fast_edit_rejects_recorded_noise(engine):
    from ishapediting_tpu.core.schedule import (
        fast_edit_schedule,
        named_beta_schedule,
    )

    w_time = TINY_PIPELINE.edit.w_time
    base = named_beta_schedule(
        TINY_PIPELINE.diffusion.noise_schedule,
        TINY_PIPELINE.diffusion.base_steps,
    )
    sched_fast, positions = fast_edit_schedule(engine.sched, base, w_time, 3)
    with pytest.raises(ValueError, match="resample"):
        drag_edit_batched(
            sched_fast, engine.model_fn_p(feat=True), engine.unet_params,
            jnp.zeros((1, 1, 16, 16, 6)),
            jnp.zeros((1, w_time, 3, 8, 8, 4)),
            stack_problems([
                build_drag_problem(
                    np.zeros((1, 3), np.float32),
                    np.ones((1, 3), np.float32) * 0.1,
                    r1=TINY_PIPELINE.edit.r1,
                    voxel_size=TINY_PIPELINE.edit.voxel_size,
                    feat_width=8,
                )
            ]),
            jax.random.PRNGKey(0),
            w_time=w_time, scale=20.0, cof=0.2, noise_mode="replay",
            edit_positions=positions,
        )


def test_batched_sharded_over_mesh(engine):
    """Shapes shard over the data axis of an 8-device mesh."""
    w_time = TINY_PIPELINE.edit.w_time
    edit_cfg = TINY_PIPELINE.edit
    engine.update_latent_params(seed=33)
    w = np.asarray(engine.w)
    feats = np.asarray(engine.feature_guidance)
    n = 8

    problems = build_batched_problems(
        [np.array([[0.1, 0, 0]])] * n,
        [np.array([[0.2, 0, 0]])] * n,
        r1=edit_cfg.r1,
        voxel_size=edit_cfg.voxel_size,
        feat_width=feats.shape[-2],
    )
    mesh = make_mesh(8)
    out = drag_edit_batched(
        engine.sched,
        engine.model_fn_p(feat=True),
        engine.unet_params,
        jnp.asarray(np.repeat(w[None], n, 0)),
        jnp.asarray(np.repeat(feats[None], n, 0)),
        problems,
        jax.random.PRNGKey(1),
        w_time=w_time,
        scale=50.0,
        cof=0.2,
        mesh=mesh,
    )
    assert out.shape == (n, 1, 16, 16, 6)
    assert np.isfinite(np.asarray(out)).all()


def test_batched_inversion_replay_identity(engine):
    """N latents inverted in one program: the recorded variance_noise must
    reproduce every x0 exactly, and an inversion-anchored batched drag with
    scale=0 in "replay" mode must reconstruct each latent through the full
    drag loop (the real-shape editing path, sharded)."""
    w_time = TINY_PIPELINE.edit.w_time
    edit_cfg = TINY_PIPELINE.edit
    n = 4
    latents = jax.random.uniform(
        jax.random.PRNGKey(5), (n, 16, 16, 6), jnp.float32, -1, 1
    )
    model_fn_p = engine.model_fn_p(feat=True)
    inv = invert_batched(
        engine.sched,
        model_fn_p,
        engine.unet_params,
        latents,
        jax.random.PRNGKey(6),
        w_time=w_time,
    )
    # replay identity, per shape, exact
    np.testing.assert_array_equal(np.asarray(inv["sample"]), np.asarray(latents))
    assert inv["w"].shape == (n, 1, 16, 16, 6)
    assert inv["features"].shape[:2] == (n, w_time)
    assert inv["variances"].shape == (n, w_time, 1, 16, 16, 6)

    mesh = make_mesh(4)
    problems = build_batched_problems(
        [np.array([[0.1, 0, 0]])] * n,
        [np.array([[0.25, 0, 0]])] * n,
        r1=edit_cfg.r1,
        voxel_size=edit_cfg.voxel_size,
        feat_width=inv["features"].shape[-2],
    )
    out_zero = drag_edit_batched(
        engine.sched,
        model_fn_p,
        engine.unet_params,
        inv["w"],
        inv["features"],
        problems,
        jax.random.PRNGKey(7),
        w_time=w_time,
        scale=0.0,
        cof=0.2,
        mesh=mesh,
        noise_mode="replay",
        variances_batch=inv["variances"],
        variance_noise_batch=inv["variance_noise"],
    )
    # scale=0 replay walks mean + variance_noise exactly -> recovers x0
    np.testing.assert_allclose(
        np.asarray(out_zero[:, 0]), np.asarray(latents), atol=1e-5
    )

    out_drag = drag_edit_batched(
        engine.sched,
        model_fn_p,
        engine.unet_params,
        inv["w"],
        inv["features"],
        problems,
        jax.random.PRNGKey(7),
        w_time=w_time,
        scale=50.0,
        cof=0.2,
        mesh=mesh,
        noise_mode="replay",
        variances_batch=inv["variances"],
        variance_noise_batch=inv["variance_noise"],
    )
    assert np.isfinite(np.asarray(out_drag)).all()
    # the guidance actually moved every latent away from the reconstruction
    for i in range(n):
        assert float(jnp.abs(out_drag[i, 0] - latents[i]).max()) > 1e-4


def test_batched_fixed_variance_mode(engine):
    """noise_mode="fixed_variance" (case-1 edit mode) runs batched and
    differs from plain resample output."""
    w_time = TINY_PIPELINE.edit.w_time
    edit_cfg = TINY_PIPELINE.edit
    n = 2
    latents = jax.random.uniform(
        jax.random.PRNGKey(8), (n, 16, 16, 6), jnp.float32, -1, 1
    )
    model_fn_p = engine.model_fn_p(feat=True)
    inv = invert_batched(
        engine.sched,
        model_fn_p,
        engine.unet_params,
        latents,
        jax.random.PRNGKey(9),
        w_time=w_time,
    )
    problems = build_batched_problems(
        [np.array([[0.1, 0, 0]])] * n,
        [np.array([[0.2, 0, 0]])] * n,
        r1=edit_cfg.r1,
        voxel_size=edit_cfg.voxel_size,
        feat_width=inv["features"].shape[-2],
    )
    kwargs = dict(
        w_time=w_time, scale=20.0, cof=0.2,
        variances_batch=inv["variances"],
        variance_noise_batch=inv["variance_noise"],
    )
    out_fv = drag_edit_batched(
        engine.sched, model_fn_p, engine.unet_params, inv["w"],
        inv["features"], problems, jax.random.PRNGKey(10),
        noise_mode="fixed_variance", **kwargs,
    )
    assert out_fv.shape == (n, 1, 16, 16, 6)
    assert np.isfinite(np.asarray(out_fv)).all()
    with pytest.raises(ValueError):
        drag_edit_batched(
            engine.sched, model_fn_p, engine.unet_params, inv["w"],
            inv["features"], problems, jax.random.PRNGKey(10),
            w_time=w_time, scale=20.0, cof=0.2, noise_mode="replay",
        )


def test_batched_real_shape_fit(engine):
    """fit_real_shapes_batched: N real meshes -> N latents in one program
    (contract; quality is gated by the single-shape slow test)."""
    from ishapediting_tpu.geometry.marching import grid_to_mesh

    x = np.linspace(-1, 1, 24)
    X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
    meshes = [
        grid_to_mesh((r - np.sqrt(X**2 + Y**2 + Z**2)).astype(np.float32))
        for r in (0.5, 0.62)
    ]
    mf = engine.model_fn_p(feat=False)
    latents = fit_real_shapes_batched(
        engine.sched,
        mf,
        engine.unet_params,
        engine.decoder_params,
        meshes,
        engine.half_range,
        engine.middle,
        jax.random.PRNGKey(11),
        latent_shape=TINY_PIPELINE.latent_shape,
        fit_cfg=TINY_PIPELINE.fit,
        mesh=make_mesh(2),
    )
    assert latents.shape == (2, 16, 16, 6)
    assert np.isfinite(np.asarray(latents)).all()
    # the two shapes must produce distinct latents (independent BCE terms)
    assert float(jnp.abs(latents[0] - latents[1]).max()) > 1e-3


def test_build_batched_problems_pads_handles():
    problems = build_batched_problems(
        [np.zeros((1, 3)), np.zeros((3, 3))],
        [np.full((1, 3), 0.1), np.full((3, 3), 0.1)],
        r1=1, voxel_size=0.1, feat_width=8,
    )
    assert problems.patch_grid.shape[:3] == (2, 3, 3)  # padded to 3 handles


def test_batched_per_shape_scale_cof(engine):
    """Per-shape [N] scale/cof arrays: each shape must match an independent
    edit run at its own strength (EditLog entries keep their own
    Scale/Lambda in the batch CLI)."""
    w_time = TINY_PIPELINE.edit.w_time
    edit_cfg = TINY_PIPELINE.edit
    scales, cofs = [30.0, 90.0], [0.1, 0.4]

    ws, feats, problems = [], [], []
    for i in range(2):
        engine.update_latent_params(seed=40 + i)
        ws.append(np.asarray(engine.w))
        feats.append(np.asarray(engine.feature_guidance))
        src = np.array([[0.1 * (i + 1), 0.0, 0.0]], np.float32)
        tgt = src + np.array([[0.15, 0.0, 0.0]], np.float32)
        problems.append(
            build_drag_problem(
                src, tgt, r1=edit_cfg.r1, voxel_size=edit_cfg.voxel_size,
                feat_width=feats[-1].shape[-2],
            )
        )

    rng = jax.random.PRNGKey(7)
    model_fn_p = engine.model_fn_p(feat=True)
    out = drag_edit_batched(
        engine.sched,
        model_fn_p,
        engine.unet_params,
        jnp.asarray(np.stack(ws)),
        jnp.asarray(np.stack(feats)),
        stack_problems(problems),
        rng,
        w_time=w_time,
        scale=np.asarray(scales, np.float32),
        cof=np.asarray(cofs, np.float32),
    )
    keys = jax.random.split(rng, 2)
    for i in range(2):
        ref = drag_edit_scan(
            engine.sched,
            lambda x, t: model_fn_p(engine.unet_params, x, t),
            problems[i],
            jnp.asarray(ws[i]),
            jnp.asarray(feats[i]),
            keys[i],
            w_time=w_time,
            scale=scales[i],
            cof=cofs[i],
        )
        np.testing.assert_allclose(np.asarray(out[i]), np.asarray(ref), atol=2e-4)


def test_batched_w_time_out_of_range_raises(engine):
    """The batched entry points must fail as loudly as the single-shape
    engine on an over-long edit window (the silent failure mode is a
    clamped XLA gather — see core.schedule.validate_w_time)."""
    sched = engine.sched  # 10 respaced steps in TINY_PIPELINE
    model_fn_p = engine.model_fn_p(feat=True)
    rng = jax.random.PRNGKey(0)
    lat = jnp.zeros((2,) + TINY_PIPELINE.latent_shape)
    with pytest.raises(ValueError, match="w_time"):
        invert_batched(
            sched, model_fn_p, engine.unet_params, lat, rng, w_time=170
        )

    w_time = TINY_PIPELINE.edit.w_time
    feat_w = 8
    p = build_drag_problem(
        np.zeros((1, 3), np.float32), np.full((1, 3), 0.1, np.float32),
        r1=1, voxel_size=0.1, feat_width=feat_w,
    )
    stacked = stack_problems([p, p])
    w_b = jnp.zeros((2, 1) + TINY_PIPELINE.latent_shape)
    feats_ok = jnp.zeros((2, w_time, 3, feat_w, feat_w, 2))
    with pytest.raises(ValueError, match="w_time"):
        drag_edit_batched(
            sched, model_fn_p, engine.unet_params, w_b, feats_ok,
            stacked, rng, w_time=170, scale=1.0, cof=0.1,
        )
    # row-count mismatch between the feature cache and w_time
    with pytest.raises(ValueError, match="rows"):
        drag_edit_batched(
            sched, model_fn_p, engine.unet_params, w_b,
            feats_ok[:, :-1], stacked, rng, w_time=w_time,
            scale=1.0, cof=0.1,
        )
    # fast-edit positions outside the recorded window
    with pytest.raises(ValueError, match="edit_positions"):
        drag_edit_batched(
            sched, model_fn_p, engine.unet_params, w_b, feats_ok,
            stacked, rng, w_time=w_time, scale=1.0, cof=0.1,
            edit_positions=np.array([0, w_time], np.int32),
        )
