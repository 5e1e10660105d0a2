"""Mesh-level solver-quality evaluation.

Compares each sampler (the reference's DDPM/DDIM family,
gaussian_diffusion.py:534-847, plus the framework's DPM-Solver++(2M)
extension) at fixed step budgets against the dense-chain DDIM
(probability-flow ODE) solution — at the level users feel: the extracted
surface, via Chamfer/IoU of the decoded meshes, not latent RMS.

This is the methodology behind the bench's fewer-step throughput claims
(``quality.solver.mesh``; gated on the committed toy checkpoint by
tests/test_solver_quality.py). ``cli.eval --solver_sweep`` exposes it for
any model directory so the dpm25/dpm16 parity claim can be re-validated on
real released checkpoints outside this environment.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np


def solver_mesh_sweep(
    engine,
    n_seeds: int = 3,
    seed0: int = 100,
    budgets: Sequence[int] = (50, 25, 16, 12),
    max_attempts: int | None = None,
    point_num: int = 30_000,
):
    """Per-solver Chamfer/IoU of the decoded mesh against the dense-chain
    DDIM solution, across ``n_seeds`` fixed x_T draws.

    ``dpmN`` holds mesh parity with ``ddim50`` iff its mean CD to the ODE
    solution is <= ddim50's (with seed-noise margin). The full ancestral
    DDPM chain is included for context only — it injects noise, so its
    distance from the ODE solution measures sampler spread, not error.
    Unconditional draws whose reference mesh decodes empty are skipped
    (up to ``max_attempts`` total draws, default ``8 * n_seeds``);
    ``ddimN`` budgets that don't divide the base chain are omitted
    (integer-stride constraint), ``dpmN`` has no such constraint."""
    from functools import partial

    import jax
    import jax.numpy as jnp

    from ishapediting_tpu.core.diffusion import (
        ddim_sample_loop,
        dpm_solver_sample_loop,
        p_sample_loop,
    )
    from ishapediting_tpu.core.schedule import make_schedule
    from ishapediting_tpu.geometry.metrics import chamfer_distance, iou

    cfg = engine.config
    base = cfg.diffusion.base_steps
    noise_sched = cfg.diffusion.noise_schedule
    clip = cfg.diffusion.clip_denoised
    # the engine's public model closure, NOT a raw unet_apply: it carries
    # the x0-prediction adapter (checkpoints with predict_xstart) so the
    # sweep samples exactly what the product samples
    mf = engine.model_fn_p(feat=False)

    def _sched(respacing):
        return make_schedule(
            base, noise_sched, respacing,
            rescale_timesteps=cfg.diffusion.rescale_timesteps,
        )

    dense = _sched("")
    ref_fn = jax.jit(
        lambda p, x, r: ddim_sample_loop(
            dense, partial(mf, p), x, r, clip_denoised=clip
        )
    )
    solvers = {}
    skipped_budgets = []
    solvers[f"ddpm{base}"] = jax.jit(
        lambda p, x, r: p_sample_loop(
            dense, partial(mf, p), x, r, clip_denoised=clip
        )
    )
    for n in budgets:
        if n >= base:
            # nothing to respace: the dense chain IS this budget
            skipped_budgets.append(int(n))
            continue
        if base % n == 0:  # ddimN needs an integer stride
            sd = _sched(f"ddim{n}")
            solvers[f"ddim{n}"] = jax.jit(
                lambda p, x, r, s=sd: ddim_sample_loop(
                    s, partial(mf, p), x, r, clip_denoised=clip
                )
            )
        sp = _sched(f"dpm{n}")
        solvers[f"dpm{n}"] = jax.jit(
            lambda p, x, r, s=sp: dpm_solver_sample_loop(
                s, partial(mf, p), x, clip_denoised=clip
            )
        )

    per = {name: {"cd": [], "iou": [], "empty": 0} for name in solvers}
    params = engine.unet_params
    done = skipped = 0
    s = 0
    cap = 8 * n_seeds if max_attempts is None else max_attempts
    while done < n_seeds and s < cap:
        key = jax.random.PRNGKey(seed0 + s)
        run_key = jax.random.PRNGKey(seed0 + 7919 * (s + 1))
        s += 1
        x_T = jax.random.normal(
            key, (1,) + tuple(cfg.latent_shape), jnp.float32
        )
        ref_mesh = engine.get_mesh(ref_fn(params, x_T, run_key))
        if len(ref_mesh.triangles) == 0:
            # an unconditional prior draw can decode to empty space;
            # no surface to compare against — skip this seed
            skipped += 1
            continue
        done += 1
        for name, fn in solvers.items():
            mesh = engine.get_mesh(fn(params, x_T, run_key))
            if len(mesh.triangles) == 0:
                per[name]["empty"] += 1
                continue
            per[name]["cd"].append(chamfer_distance(ref_mesh, mesh, point_num))
            per[name]["iou"].append(iou(ref_mesh, mesh, point_num))

    out = {
        "ref": f"ddim{base}-dense",
        "seeds": done,
        "skipped_empty_ref": skipped,
    }
    if skipped_budgets:
        # budgets at/above the base chain have nothing to respace — name
        # them instead of silently omitting their report keys
        out["skipped_budgets_at_or_above_base"] = skipped_budgets
    for name, d in per.items():
        out[name] = {
            "cd_mean": round(float(np.mean(d["cd"])), 6) if d["cd"] else None,
            "cd_max": round(float(np.max(d["cd"])), 6) if d["cd"] else None,
            "iou_mean": round(float(np.mean(d["iou"])), 4) if d["iou"] else None,
            "empty": d["empty"],
        }
    return out
