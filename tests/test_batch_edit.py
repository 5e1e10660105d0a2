"""Batched multi-shape drag editing on the virtual 8-device mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ishapediting_tpu.edit.batch import (
    build_batched_problems,
    drag_edit_batched,
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
    model_fn_p = engine._model_fn_p(feat=True)
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
        engine._model_fn_p(feat=True),
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


def test_build_batched_problems_pads_handles():
    problems = build_batched_problems(
        [np.zeros((1, 3)), np.zeros((3, 3))],
        [np.full((1, 3), 0.1), np.full((3, 3), 0.1)],
        r1=1, voxel_size=0.1, feat_width=8,
    )
    assert problems.patch_grid.shape[:3] == (2, 3, 3)  # padded to 3 handles
