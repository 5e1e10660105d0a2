import numpy as np

from ishapediting_tpu.core.schedule import (
    make_schedule,
    named_beta_schedule,
    space_timesteps,
)


def test_linear_betas_endpoints():
    betas = named_beta_schedule("linear", 1000)
    assert betas.shape == (1000,)
    np.testing.assert_allclose(betas[0], 0.0001)
    np.testing.assert_allclose(betas[-1], 0.02)


def test_cosine_betas_bounded():
    betas = named_beta_schedule("cosine", 1000)
    assert (betas > 0).all() and (betas <= 0.999).all()


def test_space_timesteps_ddim():
    steps = space_timesteps(1000, "ddim50")
    assert steps == set(range(0, 1000, 20))


def test_space_timesteps_even():
    steps = space_timesteps(1000, "200")
    assert len(steps) == 200
    assert 0 in steps and 999 in steps


def test_respaced_alphas_match_base():
    """Respacing must preserve cumulative alpha at each kept original step
    (the SpacedDiffusion invariant, reference respace.py:71-85)."""
    base = make_schedule(1000, "linear", "")
    sp = make_schedule(1000, "linear", "200")
    tmap = np.asarray(sp.timestep_map)
    assert sp.num_timesteps == 200
    assert (np.diff(tmap) > 0).all()
    np.testing.assert_allclose(
        np.asarray(sp.alphas_cumprod),
        np.asarray(base.alphas_cumprod)[tmap],
        rtol=1e-6,
    )


def test_posterior_identities():
    sched = make_schedule(100, "linear", "")
    betas = np.asarray(sched.betas, dtype=np.float64)
    abar = np.cumprod(1 - betas)
    abar_prev = np.append(1.0, abar[:-1])
    expect_var = betas * (1 - abar_prev) / (1 - abar)
    np.testing.assert_allclose(
        np.asarray(sched.posterior_variance), expect_var, rtol=1e-5
    )


def test_full_schedule_has_identity_map():
    sched = make_schedule(100, "linear", "")
    np.testing.assert_array_equal(np.asarray(sched.timestep_map), np.arange(100))
