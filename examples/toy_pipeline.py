"""End-to-end toy pipeline: train everything from scratch, then drag-edit.

Miniature version of the full product loop with *learned* signal (no
pretrained assets needed):

1. procedurally generate sphere shapes (analytic occupancy),
2. jointly train the shared occupancy decoder + per-shape triplanes,
3. train a tiny triplane DDPM on those latents,
4. run sampler/manifold diagnostics,
5. invert a latent (real-shape workflow) and drag its +x pole outward,
   checking the surface actually followed the handle.

Measured on the target chip (seed 0, defaults; docs/edit_before_after.png):
in "replay" noise mode (trajectory anchored to the inversion-recorded
variance noise) the drag pulls the +x pole into a smooth outward bulge —
+0.21 of the +0.25 request — while the rest of the sphere stays intact.
The shipped "resample" mode moves the surface equally far but the weak
12-sample toy prior cannot hold the global shape together under fresh noise
(the published checkpoints' strong category prior is what provides that
regularization in the real system); scale sweeps reproduce the reference
GUI's "Scale" knob behavior (too weak at 300, destructive at 10000).

First run trains (~25 min on the toy chip / CPU); the trained state is
cached under --out, so subsequent runs jump straight to editing:

    python examples/toy_pipeline.py --out /tmp/toy --drag_scale 1000
"""

from __future__ import annotations

import argparse
import dataclasses
import os

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", type=str, default="/tmp/toy_pipeline")
    p.add_argument("--num_shapes", type=int, default=12)
    p.add_argument("--decoder_steps", type=int, default=600)
    p.add_argument("--ddpm_steps", type=int, default=8000)
    p.add_argument("--plane_res", type=int, default=16)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--drag_scale", type=float, default=0.0,
                   help="fixed guidance scale; <=0 sweeps the knob and "
                        "keeps the edit closest to the +0.25 target")
    p.add_argument("--drag_cof", type=float, default=1.0)
    p.add_argument("--noise_mode", type=str, default="replay",
                   help="replay|fixed_variance|resample")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ishapediting_tpu.config import (
        DiffusionConfig,
        EditConfig,
        FitConfig,
        PipelineConfig,
        UNetConfig,
    )
    from ishapediting_tpu.core.schedule import make_schedule
    from ishapediting_tpu.edit.engine import DragEngine
    from ishapediting_tpu.io.model_dir import TriplaneStats
    from ishapediting_tpu.train.decoder import train_decoder
    from ishapediting_tpu.train.loop import train
    from ishapediting_tpu.utils.logger import get_logger

    logger = get_logger()
    os.makedirs(args.out, exist_ok=True)
    rng = np.random.default_rng(args.seed)

    # ------------------------------------------------------------------
    # 1. procedural shapes: spheres with varying center_x and radius
    # ------------------------------------------------------------------
    n = args.num_shapes
    centers = np.stack(
        [rng.uniform(-0.25, 0.25, n), np.zeros(n), np.zeros(n)], axis=1
    ).astype(np.float32)
    radii = rng.uniform(0.3, 0.5, n).astype(np.float32)

    def occupancy(obj_idx, pts):
        return (
            np.linalg.norm(pts - centers[obj_idx], axis=1) < radii[obj_idx]
        ).astype(np.float32)

    def dec_batches():
        while True:
            obj = int(rng.integers(0, n))
            # half uniform, half near-surface for sharp boundaries
            u = rng.uniform(-1, 1, (1024, 3)).astype(np.float32)
            sdir = rng.standard_normal((1024, 3)).astype(np.float32)
            sdir /= np.linalg.norm(sdir, axis=1, keepdims=True)
            s = centers[obj] + sdir * (
                radii[obj] + rng.normal(0, 0.05, (1024, 1))
            ).astype(np.float32)
            pts = np.concatenate([u, s], axis=0)
            yield obj, pts, occupancy(obj, pts)

    from ishapediting_tpu.io.checkpoint import load_params, save_params

    ckpt = os.path.join(args.out, "toy_ckpt.orbax")
    cached = os.path.isdir(ckpt)

    logger.log("=== training decoder + plane bank ===")
    PLANE_RES, PLANE_CH = args.plane_res, 8
    dec_params, bank = (None, None) if cached else train_decoder(
        dec_batches(),
        num_objs=n,
        steps=args.decoder_steps,
        resolution=PLANE_RES,
        channels=PLANE_CH,
        mapping=16,
        hidden=64,
        lr=3e-3,
        seed=args.seed,
        log_every=200,
    )

    # ------------------------------------------------------------------
    # 2. normalization stats from the bank, latents in [-1, 1]
    # ------------------------------------------------------------------
    if cached:
        logger.log(f"loading cached toy checkpoint {ckpt}")
        blob = load_params(ckpt)
        dec_params = blob["dec"]
        bank = jnp.asarray(blob["bank"])
    bank_np = np.asarray(bank)  # [n, 3, H, W, C]
    flat = bank_np.transpose(0, 2, 3, 1, 4).reshape(n, PLANE_RES, PLANE_RES, 3 * PLANE_CH)
    # z-score-style normalization (±2.5 sigma -> [-1, 1]): DDPM training needs
    # the latents at O(1) variance; plain min/max bounds leave TV-smoothed
    # planes clustered near 0 and the diffusion model barely sees signal.
    mean = flat.mean(axis=(0, 1, 2))
    std = flat.std(axis=(0, 1, 2))
    stats = TriplaneStats(
        half_range=np.maximum(2.5 * std, 1e-6).astype(np.float32),
        middle=mean.astype(np.float32),
    )
    latents = np.clip((flat - stats.middle) / stats.half_range, -1, 1)

    # ------------------------------------------------------------------
    # 3. train a tiny DDPM on the latents
    # ------------------------------------------------------------------
    cfg = PipelineConfig(
        unet=UNetConfig(
            image_size=PLANE_RES,
            in_channels=3 * PLANE_CH,
            model_channels=32,
            out_channels=6 * PLANE_CH,
            num_res_blocks=1,
            attention_ds=(4,),
            channel_mult=(1, 2),
            num_head_channels=16,
            dropout=0.0,
            compute_dtype="float32",
        ),
        diffusion=DiffusionConfig(base_steps=100, timestep_respacing="25"),
        edit=EditConfig(w_time=20, feat_layer=1, shape_resolution=48, r1=2,
                        feat_store_dtype="float32"),
        fit=FitConfig(points_size=10_000, batch_points=2_000),
        plane_channels=PLANE_CH,
    )
    train_sched = make_schedule(100, "linear", "")

    def ddpm_batches():
        while True:
            idx = rng.integers(0, n, 8)
            yield latents[idx]

    from ishapediting_tpu.models.unet import init_unet_params

    if cached:
        ema_params = load_params(ckpt)["ema"]
    else:
        logger.log("=== training tiny triplane DDPM ===")
        state = train(
            cfg.unet,
            train_sched,
            init_unet_params(jax.random.PRNGKey(args.seed), cfg.unet),
            ddpm_batches(),
            total_steps=args.ddpm_steps,
            ckpt_dir=None,
            lr=args.lr,
            log_every=max(args.ddpm_steps // 10, 1),
            ema_rate=0.999,
        )
        ema_params = state.ema_params
        save_params(ckpt, {"dec": dec_params, "bank": np.asarray(bank),
                           "ema": ema_params})

    # ------------------------------------------------------------------
    # 4. sample a shape + cache guidance features
    # ------------------------------------------------------------------
    logger.log("=== sampling + editing ===")
    engine = DragEngine(
        cfg,
        unet_params=ema_params,
        decoder_params=dec_params,
        stats=stats,
        remat=False,
    )

    # sanity: a TRAINING latent must decode to a clean sphere
    train_mesh = engine.get_mesh(jnp.asarray(latents[0][None]))
    tx = train_mesh.vertices
    logger.log(
        f"train-latent decode: {len(tx)} verts, "
        f"bbox x [{tx[:,0].min():.2f},{tx[:,0].max():.2f}] "
        f"(expect sphere around {centers[0,0]:.2f} r={radii[0]:.2f})"
    )

    # --- sampler diagnostics ------------------------------------------
    from ishapediting_tpu.core.diffusion import ddim_sample_loop, p_sample_loop
    from ishapediting_tpu.core.schedule import make_schedule as mk
    from ishapediting_tpu.core.diffusion import q_sample

    def dist_report(name, arr):
        d = np.linalg.norm((latents - np.asarray(arr)[0]).reshape(n, -1), axis=1)
        spread = np.linalg.norm(
            (latents - latents.mean(0)).reshape(n, -1), axis=1
        ).mean()
        logger.log(
            f"{name}: nearest-train {d.min():.2f} (spread {spread:.2f}, "
            f"|x|={np.linalg.norm(np.asarray(arr)):.2f})"
        )

    mf = engine._model_fn(feat=False)
    x_T = jax.random.normal(jax.random.PRNGKey(args.seed + 7), (1,) + cfg.latent_shape)
    ddim_out = ddim_sample_loop(engine.sched, mf, x_T, jax.random.PRNGKey(1))
    dist_report("ddim-25 sample", ddim_out)
    full_sched = mk(cfg.diffusion.base_steps, "linear", "")
    full_out = p_sample_loop(full_sched, mf, x_T, jax.random.PRNGKey(2))
    dist_report("ddpm-100 sample", full_out)
    # conditional re-denoise of a noised training latent
    t60 = jnp.full((1,), 60, jnp.int32)
    noised = q_sample(
        full_sched, jnp.asarray(latents[:1]), t60,
        jax.random.normal(jax.random.PRNGKey(3), (1,) + cfg.latent_shape),
    )
    from ishapediting_tpu.core.diffusion import sample_partial
    redo = sample_partial(full_sched, mf, noised, jax.random.PRNGKey(4), t_start=60)
    d0 = np.linalg.norm(np.asarray(redo["sample"])[0] - latents[0])
    logger.log(f"re-denoise t=60 of train[0]: dist-to-origin {d0:.2f}")

    x0 = engine.update_latent_params(seed=args.seed + 7)  # [1, H, W, 24]
    dist_report("engine ddpm-25 sample", x0)

    # ------------------------------------------------------------------
    # 5. drag edit via the REAL-SHAPE workflow (BASELINE config 5):
    #    invert a known latent (exact replay) and edit from there. With a
    #    4-12-sample toy DDPM the from-noise samples are off-manifold at
    #    high t, but the inversion-anchored edit stays in the regime the
    #    model has actually learned (re-denoise diagnostics above).
    # ------------------------------------------------------------------
    engine.config = dataclasses.replace(
        engine.config, edit=dataclasses.replace(engine.config.edit, w_time=12)
    )
    engine.latent_inversion(jnp.asarray(latents[0][None]))
    original = engine.mesh0
    original.write(os.path.join(args.out, "original.obj"))
    ox = original.vertices[:, 0]
    logger.log(
        f"inverted mesh: {len(original.vertices)} verts, "
        f"x-extent [{ox.min():.3f}, {ox.max():.3f}]"
    )

    handle = original.vertices[np.argmax(ox)].astype(np.float32)
    target = handle + np.array([0.25, 0, 0], np.float32)

    # The GUI workflow is a scale-knob trial, and the toy prior's drag
    # response varies run to run (12 training shapes) — sweep the knob and
    # keep the edit closest to the requested +0.25. scale is a traced
    # scalar, so the sweep reuses one compiled program.
    sweep = (
        [args.drag_scale]
        if args.drag_scale > 0
        else [300.0, 600.0, 1000.0, 1500.0, 2500.0, 4000.0]
    )
    best = None  # (gap_to_target, scale, mesh, latent, delta)
    for scale in sweep:
        m = engine.drag_edit(
            handle[None], target[None], scale=scale, cof=args.drag_cof,
            seed=args.seed, chunk=4, noise_mode=args.noise_mode,
        )
        if len(m.vertices) == 0:
            logger.log(f"  scale {scale:6.0f}: edit diverged (empty mesh)")
            continue
        d = float(m.vertices[:, 0].max() - ox.max())
        logger.log(f"  scale {scale:6.0f}: moved +x surface by {d:+.3f}")
        gap = abs(d - 0.25)
        if best is None or gap < best[0]:
            best = (gap, scale, m, np.asarray(engine.edited_latent), d)
    if best is None:
        logger.log("edited mesh empty at every scale — edit diverged")
        edited, delta = engine.mesh, None
    else:
        _, scale, edited, best_latent, delta = best
        # re-sync engine state to the SELECTED edit (the loop left it at the
        # last swept scale)
        engine.edited_latent = best_latent
        engine.mesh = edited
        ex = edited.vertices[:, 0]
        logger.log(
            f"edited mesh:   {len(edited.vertices)} verts at scale "
            f"{scale:.0f}, x-extent [{ex.min():.3f}, {ex.max():.3f}]"
        )
        logger.log(f"drag moved +x surface by {delta:+.3f} (target +0.25)")
    edited.write(os.path.join(args.out, "edited.obj"))
    return {
        "original": original,
        "edited": edited,
        "delta_x": delta,
        "engine": engine,
    }


if __name__ == "__main__":
    main()
