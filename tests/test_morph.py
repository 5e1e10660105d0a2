"""Latent-space morphing (edit/morph.py, framework extension) + the DDIM
reverse-ODE encode loop it is built on."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ishapediting_tpu.core.diffusion import (
    ddim_reverse_sample_loop,
    ddim_sample_loop,
)
from ishapediting_tpu.core.schedule import make_schedule
from ishapediting_tpu.edit.morph import morph_latents, slerp
from tests.test_diffusion import SHAPE, toy_model


def test_ddim_reverse_loop_roundtrip():
    """encode(x0) -> decode must approximately reproduce x0 (order-1 ODE
    discretization error); this is the property that makes the encoding a
    usable embedding. The reference ships only the single reverse step as
    dead code (gaussian_diffusion.py:718-761)."""
    sched = make_schedule(1000, "linear", "100")
    x0 = jax.random.normal(jax.random.PRNGKey(3), SHAPE) * 0.5
    xT = jax.jit(
        lambda x: ddim_reverse_sample_loop(
            sched, toy_model, x, clip_denoised=False
        )
    )(x0)
    back = ddim_sample_loop(
        sched, toy_model, xT, jax.random.PRNGKey(0), clip_denoised=False
    )
    err = float(jnp.max(jnp.abs(back - x0)))
    assert err < 0.1, err
    # a denser grid shrinks the discretization error (true ODE inverse)
    sched_fine = make_schedule(1000, "linear", "")
    xT_f = ddim_reverse_sample_loop(
        sched_fine, toy_model, x0, clip_denoised=False
    )
    back_f = ddim_sample_loop(
        sched_fine, toy_model, xT_f, jax.random.PRNGKey(0),
        clip_denoised=False,
    )
    assert float(jnp.max(jnp.abs(back_f - x0))) < err


def test_slerp_endpoints_and_norm():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((4, 4, 2)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((4, 4, 2)), jnp.float32)
    out = slerp(a, b, jnp.asarray([0.0, 0.5, 1.0]))
    assert out.shape == (3, 4, 4, 2)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(a), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out[2]), np.asarray(b), atol=1e-5)
    # equal-norm endpoints -> interpolant norm stays on the shell (the
    # property that motivates slerp over lerp for Gaussian noise)
    bn = b / jnp.linalg.norm(b) * jnp.linalg.norm(a)
    mid = slerp(a, bn, jnp.asarray(0.5))
    assert float(jnp.linalg.norm(mid)) == pytest.approx(
        float(jnp.linalg.norm(a)), rel=1e-4
    )
    # (anti-)parallel endpoints fall back to lerp, no NaNs
    same = slerp(a, a, jnp.asarray([0.25]))
    np.testing.assert_allclose(np.asarray(same[0]), np.asarray(a), atol=1e-5)
    # a zero endpoint must not produce NaNs (clamped norms), and the
    # endpoints still hit exactly
    z = jnp.zeros_like(a)
    zo = slerp(z, b, jnp.asarray([0.0, 0.5, 1.0]))
    assert np.isfinite(np.asarray(zo)).all()
    np.testing.assert_allclose(np.asarray(zo[0]), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(zo[2]), np.asarray(b), atol=1e-5)


def test_morph_latents_endpoints_are_roundtrips():
    sched = make_schedule(1000, "linear", "25")
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.standard_normal(SHAPE[1:]), jnp.float32) * 0.4
    b = jnp.asarray(rng.standard_normal(SHAPE[1:]), jnp.float32) * 0.4
    frames = morph_latents(
        sched, toy_model, a, b, (0.0, 0.5, 1.0), clip_denoised=False
    )
    assert frames.shape == (3,) + SHAPE[1:]
    assert np.isfinite(np.asarray(frames)).all()
    # endpoint frames equal each input's own encode->decode round trip
    for x, k in ((a, 0), (b, 2)):
        xT = ddim_reverse_sample_loop(
            sched, toy_model, x[None], clip_denoised=False
        )
        rt = ddim_sample_loop(
            sched, toy_model, xT, jax.random.PRNGKey(0), clip_denoised=False
        )
        np.testing.assert_allclose(
            np.asarray(frames[k]), np.asarray(rt[0]), atol=1e-4
        )
    # the middle frame is a genuinely new shape, not either endpoint
    assert float(jnp.abs(frames[1] - frames[0]).max()) > 1e-3
    assert float(jnp.abs(frames[1] - frames[2]).max()) > 1e-3


def test_engine_morph_and_cli(tmp_path):
    import ishapediting_tpu.cli.morph as cli_morph
    from tests.test_engine import TINY_PIPELINE
    from ishapediting_tpu.edit.engine import DragEngine

    eng = DragEngine(TINY_PIPELINE, seed=0)
    la = eng.sample_latent(seed=1)
    lb = eng.sample_latent(seed=2)
    assert la.shape == (1,) + TINY_PIPELINE.latent_shape
    frames = eng.morph(la, lb, n=3)
    assert frames.shape == (3,) + TINY_PIPELINE.latent_shape
    assert np.isfinite(frames).all()

    out = tmp_path / "morph"
    cli_morph.main([
        "--random_init", "--preset", "tiny", "--seed_a", "1", "--seed_b",
        "2", "--frames", "3", "--shape_resolution", "16", "--smooth", "2",
        "--out", str(out),
    ])
    lat = np.load(out / "latents.npy")
    assert lat.shape == (3,) + TINY_PIPELINE.latent_shape
    for k in range(3):
        assert os.path.exists(out / f"frame_{k:02d}.obj")

    # triplane-npy endpoints: physical NCHW triplane of latent A must morph
    # to (nearly) the same frames as the seed path at alpha=0
    from ishapediting_tpu.edit.fit import latent_to_planes

    planes = np.asarray(
        latent_to_planes(
            jnp.asarray(la), eng.half_range, eng.middle
        )
    ).transpose(0, 3, 1, 2)  # [3, C, H, W] NCHW
    tri_path = tmp_path / "a_tri.npy"
    np.save(tri_path, planes)
    out2 = tmp_path / "morph2"
    cli_morph.main([
        "--random_init", "--preset", "tiny", "--tri_a", str(tri_path),
        "--seed_b", "2", "--frames", "2", "--skip_decode",
        "--out", str(out2),
    ])
    lat2 = np.load(out2 / "latents.npy")
    np.testing.assert_allclose(lat2[0], lat[0], atol=1e-3)


def test_engine_morph_sharded_matches_single():
    """Frame decode sharded one-trajectory-per-device must equal the
    single-device result (GSPMD layout only, same math)."""
    from tests.test_engine import TINY_PIPELINE
    from ishapediting_tpu.edit.engine import DragEngine
    from ishapediting_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs the multi-device CPU mesh")
    eng = DragEngine(TINY_PIPELINE, seed=0)
    la = eng.sample_latent(seed=1)
    lb = eng.sample_latent(seed=2)
    n = len(jax.devices())
    single = eng.morph(la, lb, n=n)
    sharded = eng.morph(la, lb, n=n, mesh=make_mesh(n))
    np.testing.assert_allclose(sharded, single, atol=1e-5)
