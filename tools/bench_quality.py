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


from ishapediting_tpu.core.solver_eval import solver_mesh_sweep  # noqa: E402
# (moved to the package in round 5 so cli.eval --solver_sweep can run the
# same methodology on real model dirs; re-exported here because the bench
# quality block and tests/test_solver_quality.py import it from this name)


def multi_handle_metrics(engine, latent0, eval_seed, scale, cof):
    """TWO-handle replay-mode drag on the asset latent's inversion — the
    multi-handle shape of the flagship drag (reference supports K handles,
    drag_utils.py:302-399; the single-handle gate alone can't catch
    per-handle masking/broadcast bugs).

    Handles: the max-x and max-z surface extremes, each dragged 0.2 outward
    along its own axis. Multi-handle guidance on the toy prior needs
    2x the single-handle scale to register (recorded: reduction +0.102,
    locality 0.788 at 2x; +0.010 at 1x — measured round 5)."""
    from tools.make_edit_gate_asset import locality_iou

    engine.latent_inversion(latent0, seed=eval_seed)
    orig = engine.mesh0
    v = orig.vertices
    h1 = v[np.argmax(v[:, 0])].astype(np.float32)
    h2 = v[np.argmax(v[:, 2])].astype(np.float32)
    src = np.stack([h1, h2])
    tgt = np.stack(
        [h1 + np.array([0.2, 0, 0], np.float32),
         h2 + np.array([0, 0, 0.2], np.float32)]
    )
    engine.drag_edit(
        src, tgt, scale=0.0, cof=0.0, seed=eval_seed, chunk=4,
        noise_mode="replay",
    )
    motion0 = float(engine.last_drag_losses["motion"][-1])
    edited = engine.drag_edit(
        src, tgt, scale=2 * scale, cof=cof, seed=eval_seed, chunk=4,
        noise_mode="replay",
    )
    motion = float(engine.last_drag_losses["motion"][-1])
    return {
        "handles": 2,
        "scale": 2 * scale,
        "motion_loss_reduction": round(1.0 - motion / motion0, 4),
        "locality_iou": round(locality_iou(orig, edited, src, tgt), 4),
        "edited_nonempty": bool(len(edited.triangles) > 0),
    }


def fit_path_metrics(engine, latent0, eval_seed, scale, cof):
    """End-to-end flagship fit path: fit(mesh) -> invert -> drag, the full
    product shape of the reference's real-shape workflow
    (drag_utils.py:401-471 fit -> :302-399 drag).

    Starts from the asset's decoded mesh, runs the classifier-guided fit +
    follow-up inversion through ``engine.fit_real_shape``, then a
    single-handle replay-mode drag ON THE FITTED latent. Reports
    reconstruction fidelity (CD/IoU vs the input mesh) and guidance
    effectiveness/locality for the post-fit edit. Toy-instance recorded
    values (round 5): fit_cd 0.0292, fit_iou 0.271, reduction +0.059,
    locality 0.250 — the fitted latent sits further off-manifold than a
    prior sample, so both fidelity and edit locality are materially weaker
    than the latent0 gate; gates sit at ~half these values."""
    import tempfile

    from ishapediting_tpu.geometry.metrics import chamfer_distance, iou
    from tools.make_edit_gate_asset import locality_iou

    original = engine.get_mesh(latent0)
    with tempfile.TemporaryDirectory() as td:
        engine.fit_real_shape(
            mesh=original, center_mesh=False, path=td, seed=eval_seed
        )
    recon = engine.mesh0
    v = recon.vertices
    h1 = v[np.argmax(v[:, 0])].astype(np.float32)
    src = h1[None]
    tgt = (h1 + np.array([0.2, 0, 0], np.float32))[None]
    engine.drag_edit(
        src, tgt, scale=0.0, cof=0.0, seed=eval_seed, chunk=4,
        noise_mode="replay",
    )
    motion0 = float(engine.last_drag_losses["motion"][-1])
    edited = engine.drag_edit(
        src, tgt, scale=scale, cof=cof, seed=eval_seed, chunk=4,
        noise_mode="replay",
    )
    motion = float(engine.last_drag_losses["motion"][-1])
    return {
        "fit_cd": round(chamfer_distance(original, recon, 30_000), 6),
        "fit_iou": round(iou(original, recon, 30_000), 4),
        "motion_loss_reduction": round(1.0 - motion / motion0, 4),
        "locality_iou": round(locality_iou(recon, edited, src, tgt), 4),
        "edited_nonempty": bool(len(edited.triangles) > 0),
    }


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
        "mesh": solver_mesh_sweep(engine),
    }
    multi = multi_handle_metrics(engine, latent0, eval_seed, scale, cof)
    fitp = fit_path_metrics(engine, latent0, eval_seed, scale, cof)

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
                "multi_handle": multi,
                "fit_path": fitp,
            }
        )
    )


if __name__ == "__main__":
    main()
