"""Training-step + multi-device sharding tests on the virtual 8-CPU mesh."""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from ishapediting_tpu.config import UNetConfig
from ishapediting_tpu.core.losses import (
    discretized_gaussian_log_likelihood,
    normal_kl,
    training_losses,
    update_ema,
)
from ishapediting_tpu.core.schedule import make_schedule
from ishapediting_tpu.models.unet import init_unet_params
from ishapediting_tpu.parallel.mesh import (
    make_mesh,
    replicate,
    shard_batch,
    shard_params_tp,
)
from ishapediting_tpu.parallel.sampling import sample_sharded
from ishapediting_tpu.train.trainer import (
    init_train_state,
    make_optimizer,
    make_train_step,
)
from tests.test_diffusion import toy_model

TINY = UNetConfig(
    image_size=8,
    in_channels=6,
    model_channels=32,
    out_channels=12,
    num_res_blocks=1,
    attention_ds=(2,),
    channel_mult=(1, 2),
    num_head_channels=16,
    dropout=0.1,
    compute_dtype="float32",
)


def test_normal_kl_matches_closed_form():
    kl = normal_kl(jnp.array(0.0), jnp.array(0.0), jnp.array(1.0), jnp.array(0.0))
    assert float(kl) == pytest.approx(0.5)
    kl_same = normal_kl(jnp.array(1.3), jnp.array(-0.2), jnp.array(1.3), jnp.array(-0.2))
    assert float(kl_same) == pytest.approx(0.0, abs=1e-7)


def test_discretized_ll_is_valid_log_prob(rng):
    x = jnp.asarray(rng.uniform(-1, 1, (4, 8)).astype(np.float32))
    ll = discretized_gaussian_log_likelihood(
        x, means=jnp.zeros_like(x), log_scales=jnp.full_like(x, -2.0)
    )
    assert np.isfinite(np.asarray(ll)).all()
    assert (np.asarray(ll) <= 0).all()


def test_training_losses_terms():
    sched = make_schedule(100, "linear", "")
    x0 = jnp.clip(jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 6)), -1, 1)
    t = jnp.array([3, 50])
    terms = training_losses(sched, toy_model, x0, t, jax.random.PRNGKey(1))
    assert terms["loss"].shape == (2,)
    assert np.isfinite(np.asarray(terms["loss"])).all()
    np.testing.assert_allclose(
        np.asarray(terms["loss"]),
        np.asarray(terms["mse"] + terms["vb"]),
        rtol=1e-6,
    )


def test_update_ema():
    ema = {"a": {"w": jnp.zeros(3)}}
    params = {"a": {"w": jnp.ones(3)}}
    out = update_ema(ema, params, 0.9)
    np.testing.assert_allclose(np.asarray(out["a"]["w"]), 0.1, rtol=1e-6)


def test_train_step_reduces_loss():
    sched = make_schedule(100, "linear", "")
    params = init_unet_params(jax.random.PRNGKey(0), TINY)
    opt = make_optimizer(2e-4)
    step = jax.jit(make_train_step(TINY, sched, opt, remat=False))
    state = init_train_state(params, opt)
    batch = jnp.clip(jax.random.normal(jax.random.PRNGKey(1), (4, 8, 8, 6)), -1, 1)
    losses = []
    for i in range(8):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert int(state.step) == 8
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # same batch -> loss must drop


def test_mesh_shapes():
    mesh = make_mesh(8, model_parallel=2)
    assert mesh.shape == {"data": 4, "model": 2}
    mesh1 = make_mesh(8)
    assert mesh1.shape == {"data": 8, "model": 1}


def test_sample_sharded_matches_single_device():
    sched = make_schedule(1000, "linear", "10")
    mesh = make_mesh(8)
    out = sample_sharded(
        sched,
        toy_model,
        mesh,
        batch_size=8,
        latent_shape=(8, 8, 6),
        rng=jax.random.PRNGKey(0),
        use_ddim=True,
    )
    assert out.shape == (8, 8, 8, 6)
    # DDIM is deterministic: per-trajectory result equals unsharded run
    from ishapediting_tpu.core.diffusion import ddim_sample_loop

    x_T = jax.random.normal(jax.random.PRNGKey(0), (8, 8, 8, 6), jnp.float32)
    ref = ddim_sample_loop(sched, toy_model, x_T, jax.random.fold_in(jax.random.PRNGKey(0), 1))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_entry_compiles_tiny():
    """entry() returns a jittable fn; compile-check on a reduced config by
    reusing the same code path (full-size is the driver's job)."""
    import __graft_entry__ as ge

    fn, args = ge.entry()
    lowered = jax.jit(fn).lower(*args)
    assert lowered is not None


def test_calc_bpd_loop():
    from ishapediting_tpu.core.losses import calc_bpd_loop

    sched = make_schedule(1000, "linear", "10")
    x0 = jnp.clip(jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 6)), -1, 1)
    out = calc_bpd_loop(sched, toy_model, x0, jax.random.PRNGKey(1))
    assert out["vb"].shape == (2, 10)
    assert out["total_bpd"].shape == (2,)
    assert np.isfinite(np.asarray(out["total_bpd"])).all()
    assert (np.asarray(out["prior_bpd"]) >= 0).all()


def test_initialize_distributed_fallback_logged(caplog):
    """No-kwargs auto-detection failure degrades to single-process but is
    LOGGED (never silent — SURVEY §5.8). The explicit-kwargs re-raise branch
    is not driven here: ``jax.distributed.initialize`` blocks retrying an
    unreachable coordinator for minutes before failing."""
    import logging

    from ishapediting_tpu.parallel.mesh import initialize_distributed

    # the suite has long since touched the backend, so initialize() fails —
    # exactly the fallback path we want to observe
    with caplog.at_level(logging.WARNING, logger="ishapediting_tpu.parallel.mesh"):
        initialize_distributed()
    assert any(
        "continuing single-process" in r.getMessage() for r in caplog.records
    )
