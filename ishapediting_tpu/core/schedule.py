"""Noise schedules and timestep respacing, precomputed on host in float64.

TPU-first design: all per-step coefficients are computed once in NumPy float64
(reference computes them the same way: gaussian_diffusion.py:133-169) and then
stored as a single ``[T, n_coef]``-style struct of fp32 device arrays that the
jitted samplers index with a traced timestep. This replaces the reference's
``_extract_into_tensor`` host->device gather (gaussian_diffusion.py:1035-1048)
with a plain in-graph ``arr[t]`` lookup.

Respacing follows SpacedDiffusion exactly (reference: respace.py:6-112):
kept original steps are recorded in ``timestep_map`` and the model is always
called with the *original* timestep index (respace.py:115-127).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Sequence, Tuple, Union

import jax.numpy as jnp
import numpy as np


def named_beta_schedule(name: str, num_steps: int) -> np.ndarray:
    """Beta schedule library (reference: gaussian_diffusion.py:18-42)."""
    if name == "linear":
        scale = 1000 / num_steps
        return np.linspace(
            scale * 0.0001, scale * 0.02, num_steps, dtype=np.float64
        )
    if name == "cosine":
        return betas_for_alpha_bar(
            num_steps,
            lambda t: math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2,
        )
    raise NotImplementedError(f"unknown beta schedule: {name}")


def betas_for_alpha_bar(num_steps: int, alpha_bar, max_beta: float = 0.999) -> np.ndarray:
    """Discretize an alpha-bar function (reference: gaussian_diffusion.py:45-62)."""
    betas = []
    for i in range(num_steps):
        t1 = i / num_steps
        t2 = (i + 1) / num_steps
        betas.append(min(1 - alpha_bar(t2) / alpha_bar(t1), max_beta))
    return np.array(betas, dtype=np.float64)


def space_timesteps(num_timesteps: int, section_counts: Union[str, Sequence[int]]):
    """Select the subset of original steps to keep (reference: respace.py:6-59).

    Provenance: this step-selection algorithm is kept verbatim from OpenAI's
    MIT-licensed guided-diffusion (``respace.py``), which the reference
    vendors unchanged. It is an exact behavioral spec — converted checkpoints
    only reproduce reference trajectories if the kept-step set matches
    bit-for-bit (verified against the reference in
    tests/test_reference_parity.py), so any "redesign" here would be a bug.
    """
    if isinstance(section_counts, str):
        if section_counts.startswith("ddim"):
            desired_count = int(section_counts[len("ddim"):])
            for i in range(1, num_timesteps):
                if len(range(0, num_timesteps, i)) == desired_count:
                    return set(range(0, num_timesteps, i))
            raise ValueError(
                f"cannot create exactly {desired_count} steps with an integer stride"
            )
        if section_counts == "":
            section_counts = [num_timesteps]
        else:
            section_counts = [int(x) for x in section_counts.split(",")]
    size_per = num_timesteps // len(section_counts)
    extra = num_timesteps % len(section_counts)
    start_idx = 0
    all_steps = []
    for i, section_count in enumerate(section_counts):
        size = size_per + (1 if i < extra else 0)
        if size < section_count:
            raise ValueError(f"cannot divide section of {size} steps into {section_count}")
        if section_count <= 1:
            frac_stride = 1.0
        else:
            frac_stride = (size - 1) / (section_count - 1)
        cur_idx = 0.0
        taken = []
        for _ in range(section_count):
            taken.append(start_idx + round(cur_idx))
            cur_idx += frac_stride
        all_steps += taken
        start_idx += size
    return set(all_steps)


def lambda_uniform_timesteps(alphas_cumprod: np.ndarray, count: int):
    """log-SNR-uniform kept-step selection (the ``"dpmN"`` respacing) —
    framework extension for exponential-integrator samplers, no reference
    counterpart. ``lambda = 0.5*(log acp - log(1-acp))``; a uniform lambda
    grid between the chain ends is snapped to the nearest original indices.
    Both endpoints are always kept; duplicate snaps collapse, so the
    realized count can fall slightly below ``count`` when ``count``
    approaches the base step count. Measured to cut DPM-Solver++(2M) error
    a further 1.4-4x at 10-25 steps vs the uniform-t ddim grid
    (docs/PERF.md, tests/test_dpm_solver.py)."""
    if count < 2:
        raise ValueError("lambda-uniform respacing needs count >= 2")
    acp = np.asarray(alphas_cumprod, np.float64)
    lam = 0.5 * (np.log(acp) - np.log1p(-acp))
    n = len(acp)
    targets = np.linspace(lam[n - 1], lam[0], count)
    idx = np.abs(lam[None, :] - targets[:, None]).argmin(axis=1)
    return set(idx.tolist()) | {0, n - 1}


@dataclasses.dataclass(frozen=True)
class Schedule:
    """All respaced per-step diffusion coefficients as fp32 jnp arrays.

    Array index ``t`` runs over the *respaced* chain, 0..T-1.
    ``timestep_map[t]`` is the original-chain index the model must be called
    with (reference: respace.py:115-127).
    """

    num_timesteps: int
    original_num_steps: int
    # pass float t * 1000/original_steps to the model (reference:
    # respace.py:125-127, gaussian_diffusion.py:356-359)
    rescale_timesteps: bool
    timestep_map: jnp.ndarray  # [T] int32, original timestep per respaced step
    betas: jnp.ndarray
    log_betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    alphas_cumprod_next: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    log_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray

    def tree_flatten(self):  # pragma: no cover - convenience
        raise NotImplementedError

    @property
    def shape(self):
        return (self.num_timesteps,)


def _schedule_from_betas(
    betas: np.ndarray,
    timestep_map: np.ndarray,
    original_num_steps: int,
    rescale_timesteps: bool = False,
) -> Schedule:
    """Derive every coefficient array in float64 then cast to fp32
    (reference math: gaussian_diffusion.py:133-169)."""
    betas = np.asarray(betas, dtype=np.float64)
    assert betas.ndim == 1 and (betas > 0).all() and (betas <= 1).all()
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas, axis=0)
    alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])
    alphas_cumprod_next = np.append(alphas_cumprod[1:], 0.0)

    posterior_variance = betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)
    posterior_log_variance_clipped = np.log(
        np.append(posterior_variance[1], posterior_variance[1:])
    )

    def f32(x):
        return jnp.asarray(np.asarray(x), dtype=jnp.float32)

    return Schedule(
        num_timesteps=int(betas.shape[0]),
        original_num_steps=int(original_num_steps),
        rescale_timesteps=bool(rescale_timesteps),
        timestep_map=jnp.asarray(timestep_map, dtype=jnp.int32),
        betas=f32(betas),
        log_betas=f32(np.log(betas)),
        alphas_cumprod=f32(alphas_cumprod),
        alphas_cumprod_prev=f32(alphas_cumprod_prev),
        alphas_cumprod_next=f32(alphas_cumprod_next),
        sqrt_alphas_cumprod=f32(np.sqrt(alphas_cumprod)),
        sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - alphas_cumprod)),
        log_one_minus_alphas_cumprod=f32(np.log(1.0 - alphas_cumprod)),
        sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod)),
        sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod - 1)),
        posterior_variance=f32(posterior_variance),
        posterior_log_variance_clipped=f32(posterior_log_variance_clipped),
        posterior_mean_coef1=f32(
            betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)
        ),
        posterior_mean_coef2=f32(
            (1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)
        ),
    )


def make_schedule(
    base_steps: int = 1000,
    noise_schedule: str = "linear",
    timestep_respacing: str = "",
    rescale_timesteps: bool = False,
) -> Schedule:
    """Build a (possibly respaced) schedule.

    Respacing recomputes betas over the kept steps so that the respaced chain
    has the same cumulative alpha at each kept step (reference:
    respace.py:71-85).
    """
    base_betas = named_beta_schedule(noise_schedule, base_steps)
    base_alphas_cumprod = np.cumprod(1.0 - base_betas)
    tr = str(timestep_respacing)
    if timestep_respacing in ("", str(base_steps)) and not tr.startswith(
        "ddim"
    ):
        keep = set(range(base_steps))
    elif tr.startswith("dpm"):
        # log-SNR-uniform grid for exponential-integrator samplers;
        # deliberately OUTSIDE space_timesteps, which is verbatim-pinned
        # reference behavior
        keep = lambda_uniform_timesteps(base_alphas_cumprod, int(tr[3:]))
    else:
        keep = space_timesteps(base_steps, timestep_respacing)

    return respaced_schedule_from_keep(
        base_betas, keep, rescale_timesteps=rescale_timesteps
    )


def respaced_schedule_from_keep(
    base_betas: np.ndarray,
    keep,
    rescale_timesteps: bool = False,
) -> Schedule:
    """Build the respaced :class:`Schedule` over an explicit kept-step set.

    ``keep`` is a set/sequence of ORIGINAL-chain step ids. Betas are
    recomputed so the respaced chain reproduces the base chain's cumulative
    alpha exactly at every kept step (reference math: respace.py:71-85);
    ``make_schedule`` routes through here, and the engine's fast-edit path
    (``DragEngine._fast_edit_schedule``) uses it with a window-respaced
    kept set that has no string-respacing spelling."""
    base_betas = np.asarray(base_betas, np.float64)
    base_steps = len(base_betas)
    base_alphas_cumprod = np.cumprod(1.0 - base_betas)
    keep = set(int(i) for i in keep)
    last_alpha_cumprod = 1.0
    new_betas = []
    timestep_map = []
    for i, alpha_cumprod in enumerate(base_alphas_cumprod):
        if i in keep:
            new_betas.append(1 - alpha_cumprod / last_alpha_cumprod)
            last_alpha_cumprod = alpha_cumprod
            timestep_map.append(i)
    return _schedule_from_betas(
        np.array(new_betas),
        np.array(timestep_map, dtype=np.int32),
        base_steps,
        rescale_timesteps,
    )


def fast_edit_schedule(
    sched: Schedule,
    base_betas: np.ndarray,
    w_time: int,
    count: int,
    rescale_timesteps: bool = False,
) -> Tuple[Schedule, np.ndarray]:
    """Window-respaced schedule for FAST drag editing (framework extension,
    no reference counterpart — the reference always walks all ``w_time``
    guided steps, drag_utils.py:336-399).

    The first ``w_time`` positions of ``sched``'s chain are respaced to
    ``count`` kept positions (verbatim ``space_timesteps`` selection, the
    same rule DDIM respacing uses); positions >= w_time keep their
    original-chain ids. Cumulative alphas match ``sched``'s chain exactly
    at every kept position, so an inversion's cached ``w`` (noise level =
    position ``w_time``) is a valid starting state and the guided walk
    takes ``count`` larger posterior steps instead of ``w_time`` small
    ones. Returns ``(schedule, positions)`` where fast step ``j``
    corresponds to full-chain position ``positions[j]`` (ascending) —
    i.e. inversion feature-cache row ``w_time - 1 - positions[j]``.

    Used by ``DragEngine._fast_edit_schedule`` (single-shape, cached per
    count) and ``edit.batch.drag_edit_batched`` (sharded multi-shape)."""
    if not 2 <= count < w_time:
        raise ValueError(
            f"edit_steps must be in [2, w_time={w_time}); got {count}"
        )
    positions = np.array(sorted(space_timesteps(w_time, [count])), np.int32)
    tmap = np.asarray(sched.timestep_map)
    keep = {int(tmap[p]) for p in positions} | {
        int(t) for t in tmap[w_time:]
    }
    fast = respaced_schedule_from_keep(
        base_betas, keep, rescale_timesteps=rescale_timesteps
    )
    return fast, positions


def validate_w_time(sched: Schedule, w_time: int, context: str = "") -> int:
    """Fail loudly when an edit window is longer than the respaced chain.

    Out-of-range values would not error on their own: jitted gathers into
    ``timestep_map`` and the coefficient arrays CLAMP silently (XLA
    semantics), so e.g. respacing "100" with the default w_time=170 would
    run 70 steps at the t=99 coefficients and corrupt generation, the
    feature-cache row alignment, and inversion replay with no visible
    failure."""
    if not 0 < w_time <= sched.num_timesteps:
        raise ValueError(
            f"w_time={w_time} must be in [1, num respaced steps = "
            f"{sched.num_timesteps}]" + (f" ({context})" if context else "")
        )
    return w_time


def model_timesteps(sched: Schedule, t: jnp.ndarray) -> jnp.ndarray:
    """Respaced t -> the value the model's time embedding receives."""
    t_orig = sched.timestep_map[t]
    if sched.rescale_timesteps:
        return t_orig.astype(jnp.float32) * (1000.0 / sched.original_num_steps)
    return t_orig


def extract(arr: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather per-batch coefficients and reshape to broadcast over ``ndim``
    trailing data dims. ``t`` is a [B] int array. Replaces
    ``_extract_into_tensor`` (reference: gaussian_diffusion.py:1035-1048)."""
    out = arr[t].astype(jnp.float32)
    return out.reshape(out.shape + (1,) * (ndim - out.ndim))
