"""Build the committed edit-effect regression asset (tests/assets/edit_gate.npz).

Trains toy sphere systems (the examples/toy_pipeline.py recipe) across seeds,
then evaluates deterministic replay-mode drags at a FIXED eval seed over a
small scale sweep, scoring each by *guidance-loss improvement*: the relative
reduction of the final-step motion loss vs the scale-0 replay of the same
trajectory. The first instance whose best setting reduces motion loss by
>= --min_reduction (while the edit is not glaringly global,
IoU >= --min_iou) is saved. The regression test (tests/test_edit_gate.py)
reloads the asset, re-runs the SAME fixed-seed guided + scale-0 drags, and
gates with margin below the recorded reduction.

Why loss-based: surface displacement on toy instances depends strongly on
the trained prior (docs/PERF.md "Instance variance"), but the guided
trajectory ending with materially lower motion loss than the unguided
replay is a property of the guidance *code* — a sign flip, scale wiring
bug, or feature-tap/regroup breakage all erase it deterministically.

Run on CPU (determinism):  python tools/make_edit_gate_asset.py
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PLANE_RES, PLANE_CH = 16, 8


def _toy_config():
    """The toy pipeline config — the SINGLE source of truth shared by
    build_toy_system (which records the asset's achieved numbers) and
    _engine_from_parts (which tests/bench_quality reconstruct the engine
    with). The committed .npz stores only weights, so any config drift
    between the two would silently re-run a different pipeline than the
    one whose numbers are stored."""
    from ishapediting_tpu.config import (
        DiffusionConfig,
        EditConfig,
        FitConfig,
        PipelineConfig,
        UNetConfig,
    )

    return PipelineConfig(
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
        edit=EditConfig(w_time=12, feat_layer=1, shape_resolution=48, r1=5,
                        feat_store_dtype="float32"),
        fit=FitConfig(points_size=10_000, batch_points=2_000),
        plane_channels=PLANE_CH,
    )


def build_toy_system(seed: int, ddpm_steps: int, decoder_steps: int):
    import jax

    from ishapediting_tpu.core.schedule import make_schedule
    from ishapediting_tpu.models.unet import init_unet_params
    from ishapediting_tpu.train.decoder import train_decoder
    from ishapediting_tpu.train.loop import train

    rng = np.random.default_rng(seed)
    n = 12
    # Spheres WITH random local bumps: the original sphere-only manifold
    # (center_x, radius) admits NO local deformation, so any drag strong
    # enough to move the pole was necessarily globally destructive
    # (measured: delta +0.26..+0.51 always came with locality IoU ~0).
    # With 1-3 attached bumps per training shape, "pull this surface point
    # outward" is an on-manifold LOCAL response the prior can follow.
    centers = np.stack(
        [rng.uniform(-0.2, 0.2, n), np.zeros(n), np.zeros(n)], axis=1
    ).astype(np.float32)
    radii = rng.uniform(0.3, 0.42, n).astype(np.float32)
    n_bumps = rng.integers(1, 4, n)
    bump_dirs, bump_radii, bump_centers = [], [], []
    for i in range(n):
        d = rng.standard_normal((int(n_bumps[i]), 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        br = rng.uniform(0.10, 0.18, int(n_bumps[i])).astype(np.float32)
        bc = centers[i] + d * radii[i]  # half-embedded caps on the surface
        bump_dirs.append(d)
        bump_radii.append(br)
        bump_centers.append(bc)

    def occupancy(obj_idx, pts):
        inside = np.linalg.norm(pts - centers[obj_idx], axis=1) < radii[obj_idx]
        for bc, br in zip(bump_centers[obj_idx], bump_radii[obj_idx]):
            inside |= np.linalg.norm(pts - bc, axis=1) < br
        return inside.astype(np.float32)

    def dec_batches():
        while True:
            obj = int(rng.integers(0, n))
            u = rng.uniform(-1, 1, (1024, 3)).astype(np.float32)
            sdir = rng.standard_normal((768, 3)).astype(np.float32)
            sdir /= np.linalg.norm(sdir, axis=1, keepdims=True)
            s = centers[obj] + sdir * (
                radii[obj] + rng.normal(0, 0.05, (768, 1))
            ).astype(np.float32)
            # near-surface samples around each bump cap too
            bs = []
            for bc, br in zip(bump_centers[obj], bump_radii[obj]):
                bd = rng.standard_normal((96, 3)).astype(np.float32)
                bd /= np.linalg.norm(bd, axis=1, keepdims=True)
                bs.append(
                    bc + bd * (br + rng.normal(0, 0.03, (96, 1))).astype(
                        np.float32
                    )
                )
            pts = np.concatenate([u, s] + bs, axis=0)
            yield obj, pts, occupancy(obj, pts)

    dec_params, bank = train_decoder(
        dec_batches(),
        num_objs=n,
        steps=decoder_steps,
        resolution=PLANE_RES,
        channels=PLANE_CH,
        mapping=16,
        hidden=64,
        lr=3e-3,
        seed=seed,
        log_every=500,
    )
    bank_np = np.asarray(bank)
    flat = bank_np.transpose(0, 2, 3, 1, 4).reshape(
        n, PLANE_RES, PLANE_RES, 3 * PLANE_CH
    )
    mean = flat.mean(axis=(0, 1, 2))
    std = flat.std(axis=(0, 1, 2))
    half_range = np.maximum(2.5 * std, 1e-6).astype(np.float32)
    middle = mean.astype(np.float32)
    latents = np.clip((flat - middle) / half_range, -1, 1)

    cfg = _toy_config()
    train_sched = make_schedule(100, "linear", "")

    def ddpm_batches():
        while True:
            yield latents[rng.integers(0, n, 8)]

    state = train(
        cfg.unet,
        train_sched,
        init_unet_params(jax.random.PRNGKey(seed), cfg.unet),
        ddpm_batches(),
        total_steps=ddpm_steps,
        ckpt_dir=None,
        lr=1e-3,
        log_every=max(ddpm_steps // 4, 1),
        ema_rate=0.999,
    )
    engine = _engine_from_parts(state.ema_params, dec_params, half_range, middle)
    return engine, latents, state.ema_params, dec_params, half_range, middle


def locality_iou(original, edited, handle, target, ball_r=0.25, n_pts=20_000):
    """Occupancy IoU on points outside the handle/target balls — measures
    whether the edit stayed local. ``handle``/``target`` may be single
    points [3] or stacks [K, 3] (multi-handle edits exclude every ball)."""
    from ishapediting_tpu.geometry.occupancy import points_occupancy

    rng = np.random.default_rng(0)
    pts = (rng.random((n_pts, 3)) * 2 - 1).astype(np.float32)
    balls = np.concatenate(
        [np.atleast_2d(handle), np.atleast_2d(target)], axis=0
    )
    keep = np.all(
        np.linalg.norm(pts[:, None, :] - balls[None, :, :], axis=2) > ball_r,
        axis=1,
    )
    pts = pts[keep]
    occ_a = points_occupancy(original, pts) > 0.5
    occ_b = points_occupancy(edited, pts) > 0.5
    union = (occ_a | occ_b).sum()
    return float((occ_a & occ_b).sum() / union) if union else 1.0


def evaluate(
    engine,
    latents,
    eval_seeds=(0, 1, 2),
    scales=(300.0, 450.0, 600.0, 800.0, 1000.0, 1400.0),
    cofs=(0.3, 1.0),
    min_iou=0.60,
):
    """Sweep inversion-seed x cof x scale in deterministic replay mode and
    return the best setting by *guidance-loss improvement*: the relative
    reduction of the final-step motion loss vs the scale-0 replay of the
    same trajectory. That metric is what the guidance code owns — a sign
    flip, scale-wiring bug, or tap/regroup breakage all show up as the
    guided trajectory failing to reduce motion loss — whereas the surface
    displacement it induces depends on the (high-variance) toy prior
    (docs/PERF.md "Instance variance"). Displacement/locality are recorded
    as diagnostics; locality only vetoes glaringly global edits.

    Returns (reduction, scale, motion0, motion, delta, iou, eval_seed, cof)
    or None."""
    import jax.numpy as jnp

    best = None
    for eval_seed in eval_seeds:
        engine.latent_inversion(jnp.asarray(latents[0][None]), seed=eval_seed)
        original = engine.mesh0
        if len(original.vertices) == 0:
            continue
        ox = original.vertices[:, 0]
        handle = original.vertices[np.argmax(ox)].astype(np.float32)
        target = handle + np.array([0.25, 0, 0], np.float32)
        # scale-0 replay = the unguided trajectory; its final motion loss is
        # the baseline the guided run must beat
        engine.drag_edit(
            handle[None], target[None], scale=0.0, cof=0.0,
            seed=eval_seed, chunk=4, noise_mode="replay",
        )
        motion0 = float(engine.last_drag_losses["motion"][-1])
        for cof in cofs:
            for scale in scales:
                m = engine.drag_edit(
                    handle[None], target[None], scale=scale, cof=cof,
                    seed=eval_seed, chunk=4, noise_mode="replay",
                )
                if len(m.vertices) == 0:
                    continue
                motion = float(engine.last_drag_losses["motion"][-1])
                reduction = 1.0 - motion / motion0
                delta = float(m.vertices[:, 0].max() - ox.max())
                loc = locality_iou(original, m, handle, target)
                print(
                    f"  inv_seed {eval_seed} cof {cof} scale {scale:6.0f}: "
                    f"motion {motion0:.4f}->{motion:.4f} "
                    f"(red {reduction:+.1%}), delta {delta:+.3f}, "
                    f"IoU {loc:.3f}",
                    flush=True,
                )
                if loc >= min_iou and (best is None or reduction > best[0]):
                    best = (
                        reduction, scale, motion0, motion, delta, loc,
                        eval_seed, cof,
                    )
    return best


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2, 3, 4, 5])
    p.add_argument("--ddpm_steps", type=int, default=8000)
    p.add_argument("--decoder_steps", type=int, default=600)
    p.add_argument("--min_reduction", type=float, default=0.30,
                   help="required relative reduction of final-step motion "
                        "loss vs the scale-0 replay")
    p.add_argument("--min_iou", type=float, default=0.60)
    p.add_argument(
        "--out",
        type=str,
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tests", "assets", "edit_gate.npz",
        ),
    )
    p.add_argument("--cache_dir", type=str, default="/tmp/gate_instances",
                   help="trained instances are cached here so evaluator "
                        "changes don't retrain")
    args = p.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")

    def flat_tree(tree, out, base):
        for k, v in tree.items():
            key = f"{base}::{k}"
            if isinstance(v, dict):
                flat_tree(v, out, key)
            else:
                out[key] = np.asarray(v)

    os.makedirs(args.cache_dir, exist_ok=True)
    overall = None  # (delta, payload) best across ALL seeds
    for seed in args.seeds:
        cache = os.path.join(
            args.cache_dir, f"bumpy_seed{seed}_d{args.ddpm_steps}.npz"
        )
        if os.path.exists(cache):
            print(f"=== seed={seed}: loading cached instance ===", flush=True)
            npz = np.load(cache)
            from tests.test_edit_gate import _unflatten

            ema = _unflatten(npz, "ema")
            dec = _unflatten(npz, "dec")
            latents = npz["latents"]
            half_range, middle = npz["half_range"], npz["middle"]
            engine = _engine_from_parts(ema, dec, half_range, middle)
        else:
            print(f"=== training toy instance seed={seed} ===", flush=True)
            engine, latents, ema, dec, half_range, middle = build_toy_system(
                seed, args.ddpm_steps, args.decoder_steps
            )
            flat = {}
            flat_tree(ema, flat, "ema")
            flat_tree(dec, flat, "dec")
            np.savez_compressed(
                cache, latents=latents, half_range=half_range, middle=middle,
                **flat,
            )
        best = evaluate(engine, latents, min_iou=args.min_iou)
        if best is None:
            print(f"seed {seed}: no local edit at any scale", flush=True)
            continue
        reduction, scale, motion0, motion, delta, loc, eval_seed, cof = best
        print(
            f"seed {seed}: best motion reduction {reduction:+.1%} @ scale "
            f"{scale} (motion {motion0:.4f}->{motion:.4f}), delta "
            f"{delta:+.3f}, IoU {loc:.3f}, inv_seed {eval_seed}, cof {cof}",
            flush=True,
        )
        flat = {}
        flat_tree(ema, flat, "ema")
        flat_tree(dec, flat, "dec")
        payload = dict(
            latent0=latents[0],
            half_range=half_range,
            middle=middle,
            train_seed=np.int64(seed),
            eval_seed=np.int64(eval_seed),
            scale=np.float32(scale),
            cof=np.float32(cof),
            noise_mode=np.str_("replay"),
            achieved_motion0=np.float32(motion0),
            achieved_motion=np.float32(motion),
            achieved_reduction=np.float32(reduction),
            achieved_delta=np.float32(delta),
            achieved_iou=np.float32(loc),
            **flat,
        )
        if overall is None or reduction > overall[0]:
            overall = (reduction, payload)
        if reduction >= args.min_reduction and loc >= args.min_iou:
            break
    if overall is None or overall[0] < args.min_reduction:
        got = "none" if overall is None else f"{overall[0]:+.1%}"
        print(
            f"NO instance met min_reduction={args.min_reduction} (best {got})",
            file=sys.stderr,
        )
        return 1
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    np.savez_compressed(args.out, **overall[1])
    print(f"saved {args.out} ({os.path.getsize(args.out)/1e6:.2f} MB)")
    return 0


def _engine_from_parts(ema, dec, half_range, middle):
    from ishapediting_tpu.edit.engine import DragEngine
    from ishapediting_tpu.io.model_dir import TriplaneStats

    return DragEngine(
        _toy_config(),
        unet_params=ema,
        decoder_params=dec,
        stats=TriplaneStats(half_range=half_range, middle=middle),
        remat=False,
    )


if __name__ == "__main__":
    sys.exit(main())
