"""Diffusion-core property tests with a cheap analytic model."""

import numpy as np
import jax
import jax.numpy as jnp

from ishapediting_tpu.core.diffusion import (
    ddim_reverse_sample,
    ddim_sample,
    ddim_sample_loop,
    ddpm_inversion,
    p_mean_variance,
    p_sample,
    p_sample_guidance,
    p_sample_loop,
    predict_eps_from_xstart,
    predict_xstart_from_eps,
    q_posterior_mean_variance,
    q_sample,
    sample_loop_with_features,
)
from ishapediting_tpu.core.schedule import extract, make_schedule

SHAPE = (1, 8, 8, 6)


def toy_model(x, t_orig):
    """Deterministic pseudo-model: eps = tanh(x), var_values = -x/2."""
    eps = jnp.tanh(x) * 0.1
    var_values = jnp.clip(-x * 0.5, -1, 1)
    out = jnp.concatenate([eps, var_values], axis=-1)
    feat = jnp.tile(x * 2.0, (1, 1, 1, 2))  # [B,8,8,12] fake feature
    return out, feat


def test_q_sample_closed_form():
    sched = make_schedule(100, "linear", "")
    x0 = jnp.ones(SHAPE)
    noise = jnp.full(SHAPE, 0.5)
    t = jnp.array([40])
    out = q_sample(sched, x0, t, noise)
    ab = np.asarray(sched.alphas_cumprod)[40]
    np.testing.assert_allclose(
        np.asarray(out), np.sqrt(ab) + 0.5 * np.sqrt(1 - ab), rtol=1e-5
    )


def test_eps_xstart_roundtrip():
    sched = make_schedule(100, "linear", "")
    x = jax.random.normal(jax.random.PRNGKey(0), SHAPE)
    eps = jax.random.normal(jax.random.PRNGKey(1), SHAPE)
    t = jnp.array([17])
    x0 = predict_xstart_from_eps(sched, x, t, eps)
    eps2 = predict_eps_from_xstart(sched, x, t, x0)
    np.testing.assert_allclose(np.asarray(eps), np.asarray(eps2), atol=1e-4)


def test_learned_range_interpolation():
    """LEARNED_RANGE: var_values=-1 -> posterior variance, +1 -> beta
    (reference: gaussian_diffusion.py:272-279)."""
    sched = make_schedule(100, "linear", "")
    t = jnp.array([30])

    def model_lo(x, t_orig):
        return jnp.concatenate([jnp.zeros_like(x), -jnp.ones_like(x)], -1), None

    def model_hi(x, t_orig):
        return jnp.concatenate([jnp.zeros_like(x), jnp.ones_like(x)], -1), None

    x = jnp.zeros(SHAPE)
    lo = p_mean_variance(sched, model_lo, x, t)
    hi = p_mean_variance(sched, model_hi, x, t)
    np.testing.assert_allclose(
        np.asarray(lo.variance).ravel()[0],
        np.asarray(sched.posterior_variance)[30],
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(hi.variance).ravel()[0], np.asarray(sched.betas)[30], rtol=1e-5
    )


def test_p_sample_t0_no_noise():
    sched = make_schedule(100, "linear", "")
    x = jax.random.normal(jax.random.PRNGKey(0), SHAPE)
    t = jnp.array([0])
    out1 = p_sample(sched, toy_model, x, t, jax.random.PRNGKey(1))
    out2 = p_sample(sched, toy_model, x, t, jax.random.PRNGKey(2))
    np.testing.assert_array_equal(np.asarray(out1["sample"]), np.asarray(out2["sample"]))


def test_p_sample_guidance_variance_noise_override():
    sched = make_schedule(100, "linear", "")
    x = jax.random.normal(jax.random.PRNGKey(0), SHAPE)
    t = jnp.array([10])
    vn = jnp.full(SHAPE, 0.123)
    out = p_sample_guidance(sched, toy_model, x, t, variance_noise=vn)
    mv = p_mean_variance(sched, toy_model, x, t)
    np.testing.assert_allclose(
        np.asarray(out["sample"]), np.asarray(mv.mean + vn), atol=1e-6
    )


def test_ddim_deterministic_and_loop_runs():
    sched = make_schedule(1000, "linear", "ddim10")
    assert sched.num_timesteps == 10
    x = jax.random.normal(jax.random.PRNGKey(0), SHAPE)
    s1 = ddim_sample(sched, toy_model, x, jnp.array([5]))
    s2 = ddim_sample(sched, toy_model, x, jnp.array([5]))
    np.testing.assert_array_equal(np.asarray(s1["sample"]), np.asarray(s2["sample"]))
    out = ddim_sample_loop(sched, toy_model, x, jax.random.PRNGKey(1))
    assert out.shape == SHAPE
    assert np.isfinite(np.asarray(out)).all()


def test_ddim_reverse_then_forward_approx_identity():
    """One reverse-ODE step then one forward DDIM step should roughly return
    the input for a smooth model."""
    sched = make_schedule(1000, "linear", "ddim50")
    x = 0.1 * jax.random.normal(jax.random.PRNGKey(0), SHAPE)
    t = jnp.array([20])
    fwd = ddim_reverse_sample(sched, toy_model, x, t, clip_denoised=False)
    back = ddim_sample(sched, toy_model, fwd["sample"], t + 1, clip_denoised=False)
    np.testing.assert_allclose(
        np.asarray(back["sample"]), np.asarray(x), atol=0.05
    )


def test_p_sample_loop_runs_and_is_seed_deterministic():
    sched = make_schedule(1000, "linear", "20")
    x_T = jax.random.normal(jax.random.PRNGKey(0), SHAPE)
    a = p_sample_loop(sched, toy_model, x_T, jax.random.PRNGKey(7))
    b = p_sample_loop(sched, toy_model, x_T, jax.random.PRNGKey(7))
    c = p_sample_loop(sched, toy_model, x_T, jax.random.PRNGKey(8))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.abs(np.asarray(a) - np.asarray(c)).max() > 0


def test_sample_loop_with_features():
    sched = make_schedule(1000, "linear", "20")
    w_time = 12
    x_T = jax.random.normal(jax.random.PRNGKey(0), SHAPE)
    out = sample_loop_with_features(
        sched,
        toy_model,
        x_T,
        jax.random.PRNGKey(1),
        w_time=w_time,
        feat_postprocess=lambda f: f * 1.0,
    )
    assert out["sample"].shape == SHAPE
    assert out["w"].shape == SHAPE
    assert out["features"].shape == (w_time, 1, 8, 8, 12)


def test_ddpm_inversion_replay_identity():
    """The recorded variance_noise must reproduce x0 exactly
    (reference: gaussian_diffusion.py:512-532; SURVEY.md §4a)."""
    sched = make_schedule(1000, "linear", "20")
    x0 = jnp.clip(jax.random.normal(jax.random.PRNGKey(0), SHAPE), -1, 1)
    steps = 15
    out = ddpm_inversion(
        sched,
        toy_model,
        x0,
        jax.random.PRNGKey(3),
        steps=steps,
        feat_postprocess=lambda f: f,
        chunk=4,
    )
    np.testing.assert_array_equal(np.asarray(out["sample"]), np.asarray(x0))
    assert out["features"].shape[0] == steps
    assert out["variance_noise"].shape == (steps, 1) + SHAPE[1:]
    assert out["variances"].shape == (steps, 1) + SHAPE[1:]
    assert out["latent"].shape == SHAPE

    # Manual replay: x_{t-1} = mean(x_t, t) + variance_noise[k], k = steps-1-t
    img = out["latent"]
    for k in range(steps):
        t = steps - 1 - k
        mv = p_mean_variance(sched, toy_model, img, jnp.array([t]))
        img = mv.mean + out["variance_noise"][k]
    np.testing.assert_allclose(np.asarray(img), np.asarray(x0), atol=1e-5)


def test_inversion_chunk_invariance():
    sched = make_schedule(1000, "linear", "20")
    x0 = jnp.clip(jax.random.normal(jax.random.PRNGKey(0), SHAPE), -1, 1)
    a = ddpm_inversion(
        sched, toy_model, x0, jax.random.PRNGKey(3), steps=10,
        feat_postprocess=lambda f: f, chunk=3,
    )
    b = ddpm_inversion(
        sched, toy_model, x0, jax.random.PRNGKey(3), steps=10,
        feat_postprocess=lambda f: f, chunk=10,
    )
    np.testing.assert_allclose(
        np.asarray(a["variance_noise"]), np.asarray(b["variance_noise"]), atol=1e-6
    )


def test_guided_sample_loop_update_rule():
    """guided_sample_loop must apply x_{t-1} = sample + variance * grad with
    per-step rng fold_in(rng, t) — compared against an explicit Python loop
    over the same guidance closure (reference rule: drag_utils.py:443-463)."""
    from ishapediting_tpu.core.diffusion import guided_sample_loop

    sched = make_schedule(1000, "linear", "20")
    t_start = 7
    rng = jax.random.PRNGKey(5)
    x_T = jax.random.normal(jax.random.PRNGKey(0), SHAPE)

    def guidance(x, tb, step_rng):
        out = p_sample_guidance(sched, toy_model, x, tb, step_rng)
        grad = 0.3 * jnp.tanh(x)  # stand-in for a differentiated loss
        return grad, out["sample"], out["variance"]

    got = guided_sample_loop(sched, x_T, rng, guidance_fn=guidance, t_start=t_start)

    x = x_T.astype(jnp.float32)
    for t in range(t_start - 1, -1, -1):
        tb = jnp.full((1,), t, jnp.int32)
        grad, sample, variance = guidance(x, tb, jax.random.fold_in(rng, t))
        x = sample + variance * grad
    np.testing.assert_allclose(np.asarray(got), np.asarray(x), atol=1e-6)


def test_sample_partial():
    from ishapediting_tpu.core.diffusion import sample_partial

    sched = make_schedule(1000, "linear", "20")
    x = jax.random.normal(jax.random.PRNGKey(0), SHAPE)
    out = sample_partial(
        sched, toy_model, x, jax.random.PRNGKey(1),
        t_start=10, t_stop=4, capture_features=True,
    )
    assert out["sample"].shape == SHAPE
    assert out["features"].shape[0] == 6
    assert out["pred_xstart"].shape[0] == 6
    # ddim variant deterministic
    a = sample_partial(sched, toy_model, x, jax.random.PRNGKey(2),
                       t_start=10, use_ddim=True)
    b = sample_partial(sched, toy_model, x, jax.random.PRNGKey(3),
                       t_start=10, use_ddim=True)
    np.testing.assert_array_equal(np.asarray(a["sample"]), np.asarray(b["sample"]))
