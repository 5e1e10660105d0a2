"""Diffusion processes as pure functions + ``lax.scan`` trajectory loops.

Covers the reference's GaussianDiffusion/SpacedDiffusion surface
(reference: gaussian_diffusion.py:101-847, respace.py:62-127) redesigned for
XLA: every step is a pure function of ``(x_t, t, rng)`` closed over a
``Schedule`` of fp32 coefficient arrays; full trajectories are single jitted
scans, not Python loops. Carries stay fp32 even when the UNet torso runs
bf16, which keeps the DDPM-inversion replay identity exact (SURVEY.md §7.3).

The model function contract everywhere is::

    model_fn(x_nhwc, t_original) -> (out [B,H,W,2C], feat or None)

with ``t_original`` already mapped through ``Schedule.timestep_map``
(done internally here; callers pass respaced ``t``).

TPU-first highlight: ``ddpm_inversion`` exploits the replay identity
``x_{t-1} = mean_t + (x_{t-1} - mean_t)`` (reference: gaussian_diffusion.py:
512-532) — the backward pass has *no sequential dependence*, so instead of
``steps`` serial UNet calls we batch all steps through the UNet in parallel
chunks. Identical math, minutes -> seconds.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ishapediting_tpu.core.schedule import Schedule, extract, model_timesteps

ModelFn = Callable[[jnp.ndarray, jnp.ndarray], Tuple[jnp.ndarray, Optional[jnp.ndarray]]]


# ---------------------------------------------------------------------------
# q process
# ---------------------------------------------------------------------------


def q_sample(sched: Schedule, x_start: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray) -> jnp.ndarray:
    """Sample q(x_t | x_0) (reference: gaussian_diffusion.py:188-206)."""
    nd = x_start.ndim
    return (
        extract(sched.sqrt_alphas_cumprod, t, nd) * x_start
        + extract(sched.sqrt_one_minus_alphas_cumprod, t, nd) * noise
    )


def q_posterior_mean_variance(sched: Schedule, x_start, x_t, t):
    """q(x_{t-1} | x_t, x_0) (reference: gaussian_diffusion.py:208-230)."""
    nd = x_t.ndim
    mean = (
        extract(sched.posterior_mean_coef1, t, nd) * x_start
        + extract(sched.posterior_mean_coef2, t, nd) * x_t
    )
    var = extract(sched.posterior_variance, t, nd)
    log_var = extract(sched.posterior_log_variance_clipped, t, nd)
    return mean, var, log_var


def predict_xstart_from_eps(sched: Schedule, x_t, t, eps):
    nd = x_t.ndim
    return (
        extract(sched.sqrt_recip_alphas_cumprod, t, nd) * x_t
        - extract(sched.sqrt_recipm1_alphas_cumprod, t, nd) * eps
    )


def predict_eps_from_xstart(sched: Schedule, x_t, t, pred_xstart):
    nd = x_t.ndim
    return (
        extract(sched.sqrt_recip_alphas_cumprod, t, nd) * x_t - pred_xstart
    ) / extract(sched.sqrt_recipm1_alphas_cumprod, t, nd)


# ---------------------------------------------------------------------------
# p process (one step)
# ---------------------------------------------------------------------------


def xstart_model_adapter(base_sched: Schedule, model_fn: ModelFn) -> ModelFn:
    """Adapt an x0-prediction model (DiffusionConfig.predict_xstart=True,
    reference ModelMeanType.START_X) to the epsilon contract every sampler
    here uses: eps = (sqrt(1/abar_t) x_t - x0) / sqrt(1/abar_t - 1).

    ``base_sched`` must be the full (non-respaced) schedule so its arrays are
    indexed by the original timesteps the model receives."""
    assert base_sched.num_timesteps == base_sched.original_num_steps, (
        "pass the full base schedule (timestep_respacing='')"
    )

    def fn(x, t_model):
        out, feat = model_fn(x, t_model)
        # invert model_timesteps' rescale: with rescale_timesteps=True the
        # model receives t_orig * (1000/base_steps) as float — using that
        # value raw as a gather index silently clamps to the last entry of
        # the base coefficient arrays for nearly every step (XLA out-of-
        # bounds gathers clamp, no error)
        if base_sched.rescale_timesteps:
            t_orig = jnp.round(
                t_model * (base_sched.original_num_steps / 1000.0)
            ).astype(jnp.int32)
        else:
            t_orig = t_model.astype(jnp.int32)
        x0_pred, var_values = jnp.split(out.astype(jnp.float32), 2, axis=-1)
        nd = x.ndim
        eps = (
            extract(base_sched.sqrt_recip_alphas_cumprod, t_orig, nd)
            * x.astype(jnp.float32)
            - x0_pred
        ) / extract(base_sched.sqrt_recipm1_alphas_cumprod, t_orig, nd)
        return jnp.concatenate([eps, var_values], axis=-1), feat

    return fn


class PMeanVar(NamedTuple):
    mean: jnp.ndarray
    variance: jnp.ndarray
    log_variance: jnp.ndarray
    pred_xstart: jnp.ndarray
    eps: jnp.ndarray  # the model's epsilon prediction (mean half of output)
    feat: Optional[jnp.ndarray]


def p_mean_variance(
    sched: Schedule,
    model_fn: ModelFn,
    x: jnp.ndarray,
    t: jnp.ndarray,
    *,
    clip_denoised: bool = True,
    predict_xstart: bool = False,
) -> PMeanVar:
    """Model -> p(x_{t-1} | x_t) with LEARNED_RANGE variance interpolation
    (reference: gaussian_diffusion.py:232-331). ``t`` is respaced, [B]."""
    nd = x.ndim
    model_output, feat = model_fn(x, model_timesteps(sched, t))
    model_output = model_output.astype(jnp.float32)
    c = x.shape[-1]
    assert model_output.shape[-1] == 2 * c, (model_output.shape, c)
    model_eps, model_var_values = jnp.split(model_output, 2, axis=-1)

    min_log = extract(sched.posterior_log_variance_clipped, t, nd)
    max_log = extract(sched.log_betas, t, nd)
    frac = (model_var_values + 1.0) * 0.5
    model_log_variance = frac * max_log + (1.0 - frac) * min_log
    model_variance = jnp.exp(model_log_variance)

    x32 = x.astype(jnp.float32)
    if predict_xstart:
        pred_xstart = model_eps
    else:
        pred_xstart = predict_xstart_from_eps(sched, x32, t, model_eps)
    if clip_denoised:
        pred_xstart = jnp.clip(pred_xstart, -1.0, 1.0)
    mean, _, _ = q_posterior_mean_variance(sched, pred_xstart, x32, t)
    return PMeanVar(mean, model_variance, model_log_variance, pred_xstart, model_eps, feat)


def _nonzero_mask(t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    return (t != 0).astype(jnp.float32).reshape((-1,) + (1,) * (ndim - 1))


def p_sample(
    sched: Schedule,
    model_fn: ModelFn,
    x: jnp.ndarray,
    t: jnp.ndarray,
    rng: jax.Array,
    *,
    clip_denoised: bool = True,
) -> Dict[str, jnp.ndarray]:
    """Ancestral DDPM step (reference: gaussian_diffusion.py:400-444)."""
    out = p_mean_variance(sched, model_fn, x, t, clip_denoised=clip_denoised)
    noise = jax.random.normal(rng, x.shape, jnp.float32)
    sample = out.mean + _nonzero_mask(t, x.ndim) * jnp.exp(0.5 * out.log_variance) * noise
    return {"sample": sample, "pred_xstart": out.pred_xstart}


def p_sample_guidance(
    sched: Schedule,
    model_fn: ModelFn,
    x: jnp.ndarray,
    t: jnp.ndarray,
    rng: Optional[jax.Array] = None,
    *,
    noise: Optional[jnp.ndarray] = None,
    variance: Optional[jnp.ndarray] = None,
    variance_noise: Optional[jnp.ndarray] = None,
    clip_denoised: bool = True,
) -> Dict[str, Any]:
    """The editing step primitive (reference: gaussian_diffusion.py:446-510).

    Like ``p_sample`` but returns every quantity the editing engine consumes
    (inter_feat, variance, mean, noise) and accepts overrides: a fixed
    ``noise`` draw, a fixed ``variance`` (case-1 edit mode), or a fixed
    ``variance_noise`` (exact replay: sample = mean + variance_noise).
    """
    out = p_mean_variance(sched, model_fn, x, t, clip_denoised=clip_denoised)
    result: Dict[str, Any] = {
        "mean": out.mean,
        "variance": out.variance,
        "pred_xstart": out.pred_xstart,
        "inter_feat": out.feat,
        "model_output": out.eps,
    }
    if variance_noise is not None:
        result["sample"] = out.mean + variance_noise
        return result
    if noise is None:
        assert rng is not None, "need rng when noise is not provided"
        noise = jax.random.normal(rng, x.shape, jnp.float32)
    var = out.variance if variance is None else variance
    result["noise"] = noise
    result["variance"] = var
    result["sample"] = out.mean + _nonzero_mask(t, x.ndim) * jnp.sqrt(var) * noise
    return result


def ddim_sample(
    sched: Schedule,
    model_fn: ModelFn,
    x: jnp.ndarray,
    t: jnp.ndarray,
    rng: Optional[jax.Array] = None,
    *,
    eta: float = 0.0,
    clip_denoised: bool = True,
) -> Dict[str, Any]:
    """DDIM step (reference: gaussian_diffusion.py:654-705)."""
    out = p_mean_variance(sched, model_fn, x, t, clip_denoised=clip_denoised)
    nd = x.ndim
    x32 = x.astype(jnp.float32)
    eps = predict_eps_from_xstart(sched, x32, t, out.pred_xstart)
    alpha_bar = extract(sched.alphas_cumprod, t, nd)
    alpha_bar_prev = extract(sched.alphas_cumprod_prev, t, nd)
    sigma = (
        eta
        * jnp.sqrt((1 - alpha_bar_prev) / (1 - alpha_bar))
        * jnp.sqrt(1 - alpha_bar / alpha_bar_prev)
    )
    mean_pred = (
        out.pred_xstart * jnp.sqrt(alpha_bar_prev)
        + jnp.sqrt(1 - alpha_bar_prev - sigma ** 2) * eps
    )
    if eta != 0.0:
        assert rng is not None
        noise = jax.random.normal(rng, x.shape, jnp.float32)
        sample = mean_pred + _nonzero_mask(t, nd) * sigma * noise
    else:
        sample = mean_pred
    return {
        "sample": sample,
        "pred_xstart": out.pred_xstart,
        "inter_feat": out.feat,
        "model_output": out.eps,
    }


def ddim_reverse_sample(
    sched: Schedule,
    model_fn: ModelFn,
    x: jnp.ndarray,
    t: jnp.ndarray,
    *,
    clip_denoised: bool = True,
) -> Dict[str, Any]:
    """Deterministic DDIM reverse-ODE step x_t -> x_{t+1}
    (reference: gaussian_diffusion.py:718-761)."""
    out = p_mean_variance(sched, model_fn, x, t, clip_denoised=clip_denoised)
    nd = x.ndim
    eps = predict_eps_from_xstart(
        sched, x.astype(jnp.float32), t, out.pred_xstart
    )
    alpha_bar_next = extract(sched.alphas_cumprod_next, t, nd)
    mean_pred = out.pred_xstart * jnp.sqrt(alpha_bar_next) + jnp.sqrt(
        1 - alpha_bar_next
    ) * eps
    return {"sample": mean_pred, "pred_xstart": out.pred_xstart}


# ---------------------------------------------------------------------------
# Trajectory loops (lax.scan)
# ---------------------------------------------------------------------------


def ddim_reverse_sample_loop(
    sched: Schedule,
    model_fn: ModelFn,
    x0: jnp.ndarray,
    *,
    clip_denoised: bool = True,
) -> jnp.ndarray:
    """Deterministic DDIM encode: walk the reverse ODE x_0 -> x_T as one
    ascending scan of ``ddim_reverse_sample`` (the reference ships only the
    single step, gaussian_diffusion.py:718-761, with no loop or caller).
    The round trip ``ddim_sample_loop(ddim_reverse_sample_loop(x0))``
    approximately reproduces x0 (order-1 ODE discretization error — tested
    in tests/test_diffusion.py), which is what makes the encoding a usable
    latent-space embedding (morphing, semantic interpolation)."""

    def step(x, t):
        tb = jnp.full((x.shape[0],), t, jnp.int32)
        out = ddim_reverse_sample(
            sched, model_fn, x, tb, clip_denoised=clip_denoised
        )
        return out["sample"], None

    # ascend t = 0 .. T-2: step t lifts noise level abar[t] -> abar[t+1],
    # ending at abar[T-1] — the level ddim_sample_loop's FIRST step (t=T-1)
    # consumes. Including t=T-1 would lift to alphas_cumprod_next[T-1] == 0
    # and zero the signal term (the boundary convention of the appended
    # array), destroying the encoding.
    ts = jnp.arange(0, sched.num_timesteps - 1)
    x, _ = jax.lax.scan(step, x0.astype(jnp.float32), ts)
    return x


def _scan_steps(step_fn, x0_carry, t_hi: int, t_lo: int):
    """Scan t = t_hi-1 ... t_lo (descending). step_fn(carry, t) -> (carry, y)."""
    ts = jnp.arange(t_hi - 1, t_lo - 1, -1)
    return jax.lax.scan(step_fn, x0_carry, ts)


def p_sample_loop(
    sched: Schedule,
    model_fn: ModelFn,
    x_T: jnp.ndarray,
    rng: jax.Array,
    *,
    clip_denoised: bool = True,
) -> jnp.ndarray:
    """Full ancestral sampling trajectory as one scan
    (reference: gaussian_diffusion.py:534-652)."""

    def step(carry, t):
        x, key = carry
        key, sub = jax.random.split(key)
        tb = jnp.full((x.shape[0],), t, jnp.int32)
        out = p_sample(sched, model_fn, x, tb, sub, clip_denoised=clip_denoised)
        return (out["sample"], key), None

    (x, _), _ = _scan_steps(step, (x_T.astype(jnp.float32), rng), sched.num_timesteps, 0)
    return x


def ddim_sample_loop(
    sched: Schedule,
    model_fn: ModelFn,
    x_T: jnp.ndarray,
    rng: jax.Array,
    *,
    eta: float = 0.0,
    clip_denoised: bool = True,
) -> jnp.ndarray:
    """Full DDIM trajectory as one scan (reference: gaussian_diffusion.py:763-847)."""

    def step(carry, t):
        x, key = carry
        key, sub = jax.random.split(key)
        tb = jnp.full((x.shape[0],), t, jnp.int32)
        out = ddim_sample(
            sched, model_fn, x, tb, sub, eta=eta, clip_denoised=clip_denoised
        )
        return (out["sample"], key), None

    (x, _), _ = _scan_steps(step, (x_T.astype(jnp.float32), rng), sched.num_timesteps, 0)
    return x


def _dpm_solver_tables(sched: Schedule):
    """Per-iteration DPM-Solver++(2M) coefficients, derived host-side in
    float64 from the respaced schedule (one-time, trace-time constants —
    the TPU program only sees four [T] fp32 arrays).

    Iteration i steps the carry from respaced time ``t_i = T-1-i`` toward
    ``t_i - 1`` (final boundary: alpha_bar -> 1, i.e. sigma -> 0; the
    data-prediction formulation stays finite there: a=0, b=1). Returns
    ``(ts, a, b, m)`` with ``x_next = a*x + b*D`` and
    ``D = (1+m)*x0_pred(t_i) - m*x0_pred(t_{i+1 prev iter})``."""
    import numpy as np

    acp = np.asarray(sched.alphas_cumprod, np.float64)
    acp_prev = np.asarray(sched.alphas_cumprod_prev, np.float64)
    ts = np.arange(sched.num_timesteps - 1, -1, -1)
    cur, nxt = acp[ts], acp_prev[ts]
    # lambda = log(alpha/sigma) = 0.5*(log(acp) - log(1-acp)); +inf at the
    # acp=1 boundary (log1p(-1) = -inf) — handled below, not an error
    with np.errstate(divide="ignore"):
        lam_cur = 0.5 * (np.log(cur) - np.log1p(-cur))
        lam_nxt = 0.5 * (np.log(nxt) - np.log1p(-nxt))
    h = lam_nxt - lam_cur  # per-step log-SNR increment; +inf on the last step
    a = np.sqrt((1.0 - nxt) / (1.0 - cur))  # sigma_next / sigma_cur
    b = -np.sqrt(nxt) * np.expm1(-h)  # alpha_next * (1 - e^{-h}); -> 1 at end
    h_prev = np.concatenate([[np.nan], h[:-1]])
    with np.errstate(invalid="ignore"):
        m = h / (2.0 * h_prev)  # = 1/(2 r_i), r_i = h_{i-1}/h_i
    # Uniform-t respacing makes the last pre-boundary log-SNR step much
    # larger than its predecessor (h/h_prev up to ~5 on the linear schedule),
    # and linearly extrapolating x0 across that span destroys convergence
    # (measured on the analytic-posterior model: plain 2M error FLAT in N,
    # capped 2M second-order — tests/test_dpm_solver.py). Cap the history
    # weight at its uniform-lambda value 0.5: never extrapolate harder than
    # an even grid would; the cap only binds on the pathological jumps.
    m[0] = 0.0  # first step has no second history point -> first order
    # "lower-order final": the boundary step has h=inf; a first-order update
    # there is both required (m would be inf) and the standard stability
    # choice for small step counts. Must be zeroed BEFORE the cap below or
    # the cap would turn the infinite weight into a spurious 0.5.
    m[~np.isfinite(m)] = 0.0
    m = np.minimum(m, 0.5)
    return (
        jnp.asarray(ts, jnp.int32),
        jnp.asarray(a, jnp.float32),
        jnp.asarray(b, jnp.float32),
        jnp.asarray(m, jnp.float32),
    )


def dpm_solver_sample_loop(
    sched: Schedule,
    model_fn: ModelFn,
    x_T: jnp.ndarray,
    *,
    clip_denoised: bool = True,
) -> jnp.ndarray:
    """DPM-Solver++(2M) multistep sampler (Lu et al. 2022) — deterministic,
    second-order in the log-SNR step: reaches DDIM-N quality in roughly N/3
    model evaluations.

    Extension beyond the reference sampler family (the reference ships only
    DDPM/DDIM — gaussian_diffusion.py:534-847). TPU-native shape: the
    exponential-integrator coefficients are derived host-side once
    (``_dpm_solver_tables``) and the whole trajectory is a single
    ``lax.scan`` carrying ``(x, prev_x0)`` in fp32. Same epsilon-model
    contract and x0 clipping as every other sampler here; the learned-
    variance half of the model output is ignored (the probability-flow ODE
    has no noise injection). Second-order convergence is pinned by
    tests/test_dpm_solver.py against an analytic-posterior Gaussian model
    and the committed toy checkpoint."""
    ts, a, b, m = _dpm_solver_tables(sched)

    def step(carry, xs):
        x, prev_x0 = carry
        t, a_i, b_i, m_i = xs
        tb = jnp.full((x.shape[0],), t, jnp.int32)
        out, _ = model_fn(x, model_timesteps(sched, tb))
        eps = out.astype(jnp.float32)[..., : x.shape[-1]]
        x0 = predict_xstart_from_eps(sched, x, tb, eps)
        if clip_denoised:
            x0 = jnp.clip(x0, -1.0, 1.0)
        d = (1.0 + m_i) * x0 - m_i * prev_x0
        return (a_i * x + b_i * d, x0), None

    x0_init = jnp.zeros_like(x_T, dtype=jnp.float32)  # unused: m[0] = 0
    (x, _), _ = jax.lax.scan(
        step, (x_T.astype(jnp.float32), x0_init), (ts, a, b, m)
    )
    return x


def sample_loop_with_features(
    sched: Schedule,
    model_fn: ModelFn,
    x_T: jnp.ndarray,
    rng: jax.Array,
    *,
    w_time: int,
    feat_postprocess: Callable[[jnp.ndarray], jnp.ndarray],
    clip_denoised: bool = True,
) -> Dict[str, jnp.ndarray]:
    """Generation with guidance-feature caching (reference: drag_utils.py:252-280).

    Runs T-1..w_time without feature capture, snapshots ``w = x_{w_time}``,
    then runs w_time-1..0 capturing the post-processed intermediate feature at
    every step. Returns dict(sample, w, features[w_time, ...]).
    """

    def step_plain(carry, t):
        x, key = carry
        key, sub = jax.random.split(key)
        tb = jnp.full((x.shape[0],), t, jnp.int32)
        out = p_sample_guidance(sched, model_fn, x, tb, sub, clip_denoised=clip_denoised)
        return (out["sample"], key), None

    def step_feat(carry, t):
        x, key = carry
        key, sub = jax.random.split(key)
        tb = jnp.full((x.shape[0],), t, jnp.int32)
        out = p_sample_guidance(sched, model_fn, x, tb, sub, clip_denoised=clip_denoised)
        return (out["sample"], key), feat_postprocess(out["inter_feat"])

    carry = (x_T.astype(jnp.float32), rng)
    carry, _ = _scan_steps(step_plain, carry, sched.num_timesteps, w_time)
    w = carry[0]
    carry, feats = _scan_steps(step_feat, carry, w_time, 0)
    return {"sample": carry[0], "w": w, "features": feats}


def ddpm_inversion(
    sched: Schedule,
    model_fn: ModelFn,
    x0: jnp.ndarray,
    rng: jax.Array,
    *,
    steps: int,
    feat_postprocess: Callable[[jnp.ndarray], jnp.ndarray],
    clip_denoised: bool = True,
    chunk: int = 8,
) -> Dict[str, jnp.ndarray]:
    """Edit-friendly DDPM inversion (reference: gaussian_diffusion.py:512-532).

    Forward: stochastic chain x_t = sqrt(abar_t/abar_{t-1}) x_{t-1} + ...,
    storing every intermediate. Backward: per step, compute the model mean at
    x_{t+1} and record ``variance_noise_t = x_t - mean_t`` so that replaying
    ``mean + variance_noise`` reproduces x_0 *exactly*.

    Because the replay makes each backward input an already-known x_{t+1},
    the backward UNet evaluations are independent across t: we batch them
    through the model in ``chunk``-sized groups instead of a serial loop.

    ``x0`` may carry a batch axis of any size B — all trajectories invert in
    the same program (the reference is strictly single-shape,
    drag_utils.py:552-566; batching is the TPU-native extension that feeds
    edit/batch.py). Per-trajectory noise derives from ``fold_in(rng, t)``
    split over the batch, so a B=1 call reproduces the single-shape result
    bit-exactly.

    Returns (ordering matches the reference lists, index k <-> t = steps-1-k):
      latent:          x_steps                 [B, ...]
      features:        [steps, B, ...] post-processed inter_feat
      variances:       [steps, B, ...]
      variance_noise:  [steps, B, ...]
      sample:          x_0 (exact by the replay identity)
    """
    nd = x0.ndim
    b = x0.shape[0]

    def fwd_step(x, t):
        tb = jnp.full((x.shape[0],), t, jnp.int32)
        cof = extract(sched.alphas_cumprod, tb, nd) / extract(
            sched.alphas_cumprod_prev, tb, nd
        )
        noise = jax.random.normal(jax.random.fold_in(rng, t), x.shape, jnp.float32)
        x_next = jnp.sqrt(cof) * x + jnp.sqrt(1.0 - cof) * noise
        return x_next, x_next

    x_last, xs = jax.lax.scan(fwd_step, x0.astype(jnp.float32), jnp.arange(steps))
    # x_inter[i] = x_i, i = 0..steps  (x_inter[0] = x0)
    x_inter = jnp.concatenate([x0[None].astype(jnp.float32), xs], axis=0)

    # Backward, batched: for t = 0..steps-1 evaluate the model at x_{t+1}.
    # The model sees a flattened [chunk*B] batch per call.
    def backward_batch(args):
        x_in, tb = args  # [chunk, B, ...], [chunk]
        xf = x_in.reshape((-1,) + x_in.shape[2:])
        tf = jnp.repeat(tb, b)
        out = p_mean_variance(
            sched, model_fn, xf, tf, clip_denoised=clip_denoised
        )
        feats = feat_postprocess(out.feat)
        return (
            out.mean.reshape(x_in.shape),
            out.variance.reshape(x_in.shape),
            feats.reshape((x_in.shape[0], b) + feats.shape[1:]),
        )

    ts = jnp.arange(steps)  # ascending t
    xin = x_inter[1:]  # [steps, B, ...] = x_{t+1} for t ascending
    pad = (-steps) % chunk
    if pad:
        xin = jnp.concatenate([xin, jnp.repeat(xin[-1:], pad, 0)], axis=0)
        ts = jnp.concatenate([ts, jnp.full((pad,), steps - 1, ts.dtype)])
    xin = xin.reshape(steps // chunk + (1 if pad else 0), chunk, *x0.shape)
    ts = ts.reshape(-1, chunk)
    means, variances, feats = jax.lax.map(backward_batch, (xin, ts))
    means = means.reshape((-1,) + x0.shape)[:steps]
    variances = variances.reshape((-1,) + x0.shape)[:steps]
    feats = feats.reshape((-1,) + feats.shape[2:])[:steps]

    variance_noise = x_inter[:steps] - means  # x_t - mean_t, t ascending

    # Reference list ordering is t descending (loop steps-1..0).
    rev = slice(None, None, -1)
    return {
        "latent": x_inter[steps],
        "features": feats[rev],
        "variances": variances[rev],
        "variance_noise": variance_noise[rev],
        "sample": x_inter[0],
    }


def sample_partial(
    sched: Schedule,
    model_fn: ModelFn,
    x: jnp.ndarray,
    rng: jax.Array,
    *,
    t_start: int,
    t_stop: int = 0,
    use_ddim: bool = False,
    eta: float = 0.0,
    clip_denoised: bool = True,
    capture_features: bool = False,
    feat_postprocess: Callable[[jnp.ndarray], jnp.ndarray] = lambda f: f,
) -> Dict[str, jnp.ndarray]:
    """Generic partial-trajectory sampler: run steps t_start-1 .. t_stop,
    optionally capturing per-step intermediate features (covers the
    reference's ``synthesize_latent`` capability, drag_utils.py:61-131).
    Returns dict(sample, pred_xstart, features?).
    """

    def step(carry, t):
        xx, key = carry
        key, sub = jax.random.split(key)
        tb = jnp.full((xx.shape[0],), t, jnp.int32)
        if use_ddim:
            out = ddim_sample(
                sched, model_fn, xx, tb, sub, eta=eta, clip_denoised=clip_denoised
            )
        else:
            out = p_sample_guidance(
                sched, model_fn, xx, tb, sub, clip_denoised=clip_denoised
            )
        ys = (
            feat_postprocess(out["inter_feat"]) if capture_features else None,
            out["pred_xstart"],
        )
        return (out["sample"], key), ys

    carry, (feats, pred_x0) = _scan_steps(
        step, (x.astype(jnp.float32), rng), t_start, t_stop
    )
    result = {"sample": carry[0], "pred_xstart": pred_x0}
    if capture_features:
        result["features"] = feats
    return result


def p_sample_loop_snapshots(
    sched: Schedule,
    model_fn: ModelFn,
    x_T: jnp.ndarray,
    rng: jax.Array,
    *,
    snapshot_steps: Tuple[int, ...],
    use_ddim: bool = False,
    clip_denoised: bool = True,
) -> Dict[str, jnp.ndarray]:
    """Full sampling trajectory that also records x at chosen loop indices —
    the reference's ``save_intermediate`` tensor-dump debugging aid
    (reference: gaussian_diffusion.py:545-601, image_sample.py:70-102).

    ``snapshot_steps`` are LOOP indices (0 = the first denoising step from
    pure noise, matching the reference's ``idx``), static. Rather than
    stacking the whole trajectory (T x B x latent — GBs at 256 steps), the
    scan carries a [K, B, ...] buffer and writes slot k when the loop index
    crosses ``snapshot_steps[k]``; the snapshot taken is the *post-step*
    sample, like the reference's ``final["sample"]``.

    Returns dict(sample, snapshots [K, B, ...]).
    """
    snapshot_steps = tuple(int(s) for s in snapshot_steps)
    num = sched.num_timesteps
    if not all(0 <= s < num for s in snapshot_steps):
        # user-facing (--save_intermediate): a real error, not an assert
        # (asserts vanish under python -O and read as internal bugs)
        raise ValueError(
            f"snapshot_steps must be loop indices in [0, {num}); "
            f"got {snapshot_steps}"
        )
    snap_idx = jnp.asarray(snapshot_steps, jnp.int32)
    buf = jnp.zeros((len(snapshot_steps),) + x_T.shape, jnp.float32)

    def step(carry, t):
        x, key, buf = carry
        key, sub = jax.random.split(key)
        tb = jnp.full((x.shape[0],), t, jnp.int32)
        if use_ddim:
            out = ddim_sample(sched, model_fn, x, tb, sub, clip_denoised=clip_denoised)
        else:
            out = p_sample(sched, model_fn, x, tb, sub, clip_denoised=clip_denoised)
        x = out["sample"]
        loop_idx = num - 1 - t
        mask = (snap_idx == loop_idx).reshape((-1,) + (1,) * x.ndim)
        buf = jnp.where(mask, x[None], buf)
        return (x, key, buf), None

    (x, _, buf), _ = _scan_steps(
        step, (x_T.astype(jnp.float32), rng, buf), num, 0
    )
    return {"sample": x, "snapshots": buf}


def guided_sample_loop(
    sched: Schedule,
    x_T: jnp.ndarray,
    rng: jax.Array,
    *,
    guidance_fn: Callable[
        [jnp.ndarray, jnp.ndarray, jax.Array],
        Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray],
    ],
    t_start: Optional[int] = None,
) -> jnp.ndarray:
    """Classifier-guided sampling loop (reference: drag_utils.py:443-463):
    one ``lax.scan`` applying ``x_{t-1} = sample + variance * grad``.

    ``guidance_fn(x, t_batch, step_rng) -> (grad, sample, variance)`` runs
    one sampling step internally (it must differentiate through the model to
    produce the latent gradient — see edit/fit.py::fit_guided, the caller)
    and returns the already-scaled gradient plus that step's stochastic
    sample and variance. Per-step rng is ``fold_in(rng, t)`` so trajectories
    are deterministic given ``rng`` and replayable step-by-step.
    """
    t_start = sched.num_timesteps if t_start is None else t_start

    def step(x, t):
        tb = jnp.full((x.shape[0],), t, jnp.int32)
        grad, sample, variance = guidance_fn(x, tb, jax.random.fold_in(rng, t))
        return sample + variance * grad, None

    x, _ = jax.lax.scan(
        step, x_T.astype(jnp.float32), jnp.arange(t_start - 1, -1, -1)
    )
    return x
