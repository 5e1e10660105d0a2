"""Quality metrics for the driver bench — BASELINE.md quantity (d).

Measures, on the committed known-good toy instance
(tests/assets/edit_gate.npz — the same asset the CI regression gate uses),
the quality numbers the reference's offline evaluation utilities define
(reference: meshProcess.py:18-105):

- ``inversion_replay_cd`` / ``inversion_replay_iou`` — Chamfer / volumetric
  IoU between the mesh decoded from the input latent and the mesh decoded
  from the DDPM-inversion *replay* (reference fidelity claim:
  gaussian_diffusion.py:512-532 — replay must reproduce x0, so these
  should be ~0 / ~1).
- ``motion_loss_reduction`` — relative reduction of the final-step drag
  motion loss for the guided trajectory vs the scale-0 replay of the same
  trajectory (guidance effectiveness, reference: drag_utils.py:302-399).
- ``edit_locality_iou`` — occupancy IoU outside the handle/target balls
  between original and edited mesh (the edit stays local).
- ``edit_delta_x`` — surface displacement toward the drag target.
- ``solver`` — CI pin for the bench's DPM-quality claim on this trained
  checkpoint: RMS latent error of ddim-at-N vs dpm-at-N/2 (log-SNR grid)
  against the dense-step DDIM solution; the claim "DPM at half the steps
  >= DDIM quality" holds iff ``dpm_half_rms <= ddim_rms``.

Runs on CPU fp32 (where the asset's recorded numbers were validated;
bench.py invokes it as a subprocess so the chip session stays clean).
Prints ONE JSON line.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ASSET = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "assets", "edit_gate.npz",
)


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ishapediting_tpu.geometry.metrics import (
        chamfer_distance,
        hausdorff_distance,
        iou,
    )
    from tests.test_edit_gate import _unflatten
    from tools.make_edit_gate_asset import _engine_from_parts, locality_iou

    npz = np.load(ASSET)
    engine = _engine_from_parts(
        _unflatten(npz, "ema"),
        _unflatten(npz, "dec"),
        npz["half_range"],
        npz["middle"],
    )
    eval_seed = int(npz["eval_seed"])
    scale = float(npz["scale"])
    cof = float(npz["cof"])
    latent0 = jnp.asarray(npz["latent0"][None])

    original = engine.get_mesh(latent0)
    engine.latent_inversion(latent0, seed=eval_seed)
    replayed = engine.mesh0
    replay_cd = chamfer_distance(original, replayed, point_num=50_000)
    replay_iou = iou(original, replayed, point_num=50_000)
    replay_hd = hausdorff_distance(original, replayed, point_num=50_000)

    handle = original.vertices[np.argmax(original.vertices[:, 0])].astype(
        np.float32
    )
    target = handle + np.array([0.25, 0, 0], np.float32)
    engine.drag_edit(
        handle[None], target[None], scale=0.0, cof=0.0,
        seed=eval_seed, chunk=4, noise_mode="replay",
    )
    motion0 = float(engine.last_drag_losses["motion"][-1])
    edited = engine.drag_edit(
        handle[None], target[None], scale=scale, cof=cof,
        seed=eval_seed, chunk=4, noise_mode="replay",
    )
    motion = float(engine.last_drag_losses["motion"][-1])

    # solver-quality pin: same x_T, dense DDIM as the reference solution
    from functools import partial

    from ishapediting_tpu.core.diffusion import (
        ddim_sample_loop,
        dpm_solver_sample_loop,
    )
    from ishapediting_tpu.core.schedule import make_schedule
    from ishapediting_tpu.models.unet import unet_apply

    cfg = engine.config
    base = cfg.diffusion.base_steps
    mf = lambda p, x, t: unet_apply(cfg.unet, p, x, t)
    x_T = jax.random.normal(
        jax.random.PRNGKey(eval_seed + 1), latent0.shape, jnp.float32
    )
    dense = make_schedule(base, cfg.diffusion.noise_schedule, "")
    ref = jax.jit(
        lambda p, x, r: ddim_sample_loop(dense, partial(mf, p), x, r)
    )(engine.unet_params, x_T, jax.random.PRNGKey(0))
    n = min(50, base // 2)
    sched_ddim = make_schedule(base, cfg.diffusion.noise_schedule, f"ddim{n}")
    sched_dpm = make_schedule(
        base, cfg.diffusion.noise_schedule, f"dpm{n // 2}"
    )
    e_ddim = jax.jit(
        lambda p, x, r: ddim_sample_loop(sched_ddim, partial(mf, p), x, r)
    )(engine.unet_params, x_T, jax.random.PRNGKey(0))
    e_dpm = jax.jit(
        lambda p, x: dpm_solver_sample_loop(sched_dpm, partial(mf, p), x)
    )(engine.unet_params, x_T)
    rms = lambda a: float(jnp.sqrt(jnp.mean((a - ref) ** 2)))
    solver = {
        "ddim_steps": n,
        "ddim_rms": round(rms(e_ddim), 6),
        "dpm_half_steps": int(sched_dpm.num_timesteps),
        "dpm_half_rms": round(rms(e_dpm), 6),
    }

    print(
        json.dumps(
            {
                "asset": "tests/assets/edit_gate.npz",
                "platform": "cpu-fp32",
                "inversion_replay_cd": round(replay_cd, 8),
                "inversion_replay_iou": round(replay_iou, 4),
                "inversion_replay_hausdorff": round(replay_hd, 6),
                "motion_loss_reduction": round(1.0 - motion / motion0, 4),
                "recorded_reduction": round(
                    float(npz["achieved_reduction"]), 4
                ),
                "edit_locality_iou": round(
                    locality_iou(original, edited, handle, target), 4
                ),
                "edit_delta_x": round(
                    float(
                        edited.vertices[:, 0].max()
                        - original.vertices[:, 0].max()
                    ),
                    4,
                ),
                "solver": solver,
            }
        )
    )


if __name__ == "__main__":
    main()
