"""Diffusion training losses (reference: losses.py:12-77,
gaussian_diffusion.py:849-957).

The reference ships the loss machinery without a training script; we provide
both so the framework can train/fine-tune triplane DDPMs on TPU
(train/trainer.py). Everything is fp32: these are scalar-ish reductions, not
the hot path.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from ishapediting_tpu.core.diffusion import (
    ModelFn,
    q_posterior_mean_variance,
    q_sample,
)
from ishapediting_tpu.core.schedule import Schedule, extract


def mean_flat(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(x, axis=tuple(range(1, x.ndim)))


def normal_kl(mean1, logvar1, mean2, logvar2) -> jnp.ndarray:
    """KL(N1 || N2) in nats (reference: losses.py:12-39)."""
    return 0.5 * (
        -1.0
        + logvar2
        - logvar1
        + jnp.exp(logvar1 - logvar2)
        + jnp.square(mean1 - mean2) * jnp.exp(-logvar2)
    )


def approx_standard_normal_cdf(x):
    """(reference: losses.py:42-47)"""
    return 0.5 * (
        1.0 + jnp.tanh(jnp.sqrt(2.0 / jnp.pi) * (x + 0.044715 * x ** 3))
    )


def discretized_gaussian_log_likelihood(x, *, means, log_scales) -> jnp.ndarray:
    """Log-likelihood of a discretized Gaussian on [-1,1] data quantized to
    255 bins (reference: losses.py:50-77)."""
    centered_x = x - means
    inv_stdv = jnp.exp(-log_scales)
    plus_in = inv_stdv * (centered_x + 1.0 / 255.0)
    cdf_plus = approx_standard_normal_cdf(plus_in)
    min_in = inv_stdv * (centered_x - 1.0 / 255.0)
    cdf_min = approx_standard_normal_cdf(min_in)
    log_cdf_plus = jnp.log(jnp.clip(cdf_plus, min=1e-12))
    log_one_minus_cdf_min = jnp.log(jnp.clip(1.0 - cdf_min, min=1e-12))
    cdf_delta = cdf_plus - cdf_min
    log_probs = jnp.where(
        x < -0.999,
        log_cdf_plus,
        jnp.where(
            x > 0.999,
            log_one_minus_cdf_min,
            jnp.log(jnp.clip(cdf_delta, min=1e-12)),
        ),
    )
    return log_probs


def vb_terms_bpd(
    sched: Schedule,
    model_fn: ModelFn,
    x_start: jnp.ndarray,
    x_t: jnp.ndarray,
    t: jnp.ndarray,
    *,
    frozen_out: Optional[jnp.ndarray] = None,
    clip_denoised: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Per-step variational-bound term in bits
    (reference: gaussian_diffusion.py:849-882)."""
    from ishapediting_tpu.core.diffusion import p_mean_variance

    true_mean, _, true_log_var = q_posterior_mean_variance(sched, x_start, x_t, t)
    if frozen_out is not None:
        fn = lambda x, t_orig: (frozen_out, None)
    else:
        fn = model_fn
    out = p_mean_variance(sched, fn, x_t, t, clip_denoised=clip_denoised)
    kl = mean_flat(normal_kl(true_mean, true_log_var, out.mean, out.log_variance))
    kl = kl / jnp.log(2.0)
    decoder_nll = -discretized_gaussian_log_likelihood(
        x_start, means=out.mean, log_scales=0.5 * out.log_variance
    )
    decoder_nll = mean_flat(decoder_nll) / jnp.log(2.0)
    output = jnp.where(t == 0, decoder_nll, kl)
    return {"output": output, "pred_xstart": out.pred_xstart}


def training_losses(
    sched: Schedule,
    model_fn: ModelFn,
    x_start: jnp.ndarray,
    t: jnp.ndarray,
    rng: jax.Array,
    *,
    vb_weight_rescaled: bool = True,
) -> Dict[str, jnp.ndarray]:
    """Hybrid eps-MSE + rescaled-VLB loss for LEARNED_RANGE models
    (reference: gaussian_diffusion.py:884-957, RESCALED_MSE branch). Returns
    per-example terms dict with 'loss', 'mse', 'vb'."""
    noise = jax.random.normal(rng, x_start.shape, jnp.float32)
    x_t = q_sample(sched, x_start, t, noise)
    model_output, _ = model_fn(x_t, sched.timestep_map[t])
    model_output = model_output.astype(jnp.float32)
    c = x_start.shape[-1]
    model_eps, model_var_values = jnp.split(model_output, 2, axis=-1)

    # variance learned via VLB with frozen mean (detached eps)
    frozen = jnp.concatenate(
        [jax.lax.stop_gradient(model_eps), model_var_values], axis=-1
    )
    vb = vb_terms_bpd(
        sched, model_fn, x_start, x_t, t, frozen_out=frozen, clip_denoised=False
    )["output"]
    if vb_weight_rescaled:
        vb = vb * sched.num_timesteps / 1000.0

    mse = mean_flat(jnp.square(noise - model_eps))
    return {"loss": mse + vb, "mse": mse, "vb": vb}


def prior_bpd(sched: Schedule, x_start: jnp.ndarray) -> jnp.ndarray:
    """Prior KL term in bits/dim (reference: gaussian_diffusion.py:959-975)."""
    b = x_start.shape[0]
    t = jnp.full((b,), sched.num_timesteps - 1, jnp.int32)
    nd = x_start.ndim
    qt_mean = extract(sched.sqrt_alphas_cumprod, t, nd) * x_start
    qt_log_var = extract(sched.log_one_minus_alphas_cumprod, t, nd)
    kl = normal_kl(qt_mean, qt_log_var, 0.0, 0.0)
    return mean_flat(kl) / jnp.log(2.0)


def calc_bpd_loop(
    sched: Schedule,
    model_fn: ModelFn,
    x_start: jnp.ndarray,
    rng: jax.Array,
    *,
    clip_denoised: bool = True,
) -> Dict[str, jnp.ndarray]:
    """Full variational bound in bits/dim over every timestep, as one scan
    (reference: gaussian_diffusion.py:977-1032). Returns total_bpd,
    prior_bpd, vb [B, T], xstart_mse [B, T], mse [B, T]."""
    from ishapediting_tpu.core.diffusion import predict_eps_from_xstart

    b = x_start.shape[0]

    def step(_, t):
        tb = jnp.full((b,), t, jnp.int32)
        noise = jax.random.normal(
            jax.random.fold_in(rng, t), x_start.shape, jnp.float32
        )
        x_t = q_sample(sched, x_start, tb, noise)
        out = vb_terms_bpd(
            sched, model_fn, x_start, x_t, tb, clip_denoised=clip_denoised
        )
        xstart_mse = mean_flat(jnp.square(out["pred_xstart"] - x_start))
        eps = predict_eps_from_xstart(sched, x_t, tb, out["pred_xstart"])
        mse = mean_flat(jnp.square(eps - noise))
        return None, (out["output"], xstart_mse, mse)

    ts = jnp.arange(sched.num_timesteps - 1, -1, -1)
    _, (vb, xstart_mse, mse) = jax.lax.scan(step, None, ts)
    vb = vb.T  # [B, T]
    pb = prior_bpd(sched, x_start)
    return {
        "total_bpd": vb.sum(axis=1) + pb,
        "prior_bpd": pb,
        "vb": vb,
        "xstart_mse": xstart_mse.T,
        "mse": mse.T,
    }


def update_ema(ema_params, params, rate: float = 0.9999):
    """EMA of parameters (reference: nn.py:54-64)."""
    return jax.tree.map(
        lambda e, p: e * rate + p * (1.0 - rate), ema_params, params
    )
