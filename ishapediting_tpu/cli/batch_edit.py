"""Batched multi-shape drag editing CLI — the data-parallel editing surface.

The reference parallelizes only *sampling* across MPI ranks
(image_sample.py:104-132) and edits strictly one shape at a time
(drag_utils.py:303-304). This driver is the TPU-native extension
(BASELINE.json config 5): N shapes — real meshes or generated seeds — go
through fit -> inversion -> drag as single sharded programs over the device
mesh's ``data`` axis, then decode to meshes on the host.

Examples:

    # edit the same drag on 4 generated shapes, sharded over all chips
    python -m ishapediting_tpu.cli.batch_edit --model_dir models/chairs \
        --latent_seed 1 --latent_seed 2 --latent_seed 3 --latent_seed 4 \
        --source 0.1 0.2 0.3 --target 0.1 0.5 0.3 --out edited/

    # N real meshes, per-shape edits from an EditLog (edit ids 01..0N)
    python -m ishapediting_tpu.cli.batch_edit --model_dir models/chairs \
        --mesh a.obj --mesh b.obj --edit_log EditLog --out edited/

    # CPU smoke test
    python -m ishapediting_tpu.cli.batch_edit --random_init --preset tiny \
        --latent_seed 1 --latent_seed 2 --source 0.2 0 0 --target 0.4 0 0 \
        --noise_mode replay --out /tmp/batch_out
"""

from __future__ import annotations

import argparse
import os
from typing import List

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Batched sharded drag editing")
    p.add_argument("--model_dir", type=str, default=None)
    p.add_argument("--random_init", action="store_true")
    p.add_argument("--preset", type=str, default="chairs")
    p.add_argument("--num_steps", type=int, default=200)
    # shape sources: repeatable; all meshes OR all seeds
    p.add_argument("--mesh", type=str, action="append", default=[],
                   help="real mesh path (repeatable)")
    p.add_argument("--latent_seed", type=int, action="append", default=[],
                   help="generate a shape from this seed (repeatable)")
    # edit spec: one shared drag, or per-shape edits from an EditLog
    p.add_argument("--source", type=float, nargs=3, action="append", default=[])
    p.add_argument("--target", type=float, nargs=3, action="append", default=[])
    p.add_argument("--edit_log", type=str, default=None,
                   help="per-shape edits: ids 01, 02, ... map to shape order")
    p.add_argument("--scale", type=float, default=600.0)
    p.add_argument("--lam", type=float, default=0.2)
    p.add_argument("--edit_steps", type=int, default=None,
                   help="fast editing: respace the w_time edit window to "
                        "this many guided steps (forces resample noise; "
                        "docs/PERF.md 'Fast editing'); default: full walk")
    p.add_argument("--fit_steps", type=int, default=None,
                   help="fast fitting: respace the batched classifier-"
                        "guided fit to this many steps (docs/PERF.md "
                        "'Fast fitting'); default: guide the full chain")
    p.add_argument("--noise_mode", type=str, default="replay",
                   choices=["replay", "fixed_variance", "resample"],
                   help="inversion-anchored replay (default) or fresh noise")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", type=str, default="edited_batch")
    p.add_argument("--remat", type=str, default="auto",
                   choices=("auto", "on", "off"),
                   help="rematerialize UNet activations in the batched "
                   "fwd+bwd programs: 'auto' enables it when >8 shapes "
                   "share a device (batch-8 fwd+bwd fits v5e HBM without "
                   "remat — tools/probe_dragstep.py — but activation "
                   "memory scales with shapes-per-device); remat costs "
                   "~15%% wall (docs/PERF.md)")
    p.add_argument("--feat_dtype", type=str, default=None,
                   choices=["float32", "bfloat16"],
                   help="guidance-feature cache dtype (bfloat16 halves the "
                        "dominant N x w_time feature footprint); default: "
                        "keep config")
    return p


def main(argv=None):
    from ishapediting_tpu.utils.device import honor_env_platform

    honor_env_platform()  # make JAX_PLATFORMS=cpu actually mean CPU
    args = build_parser().parse_args(argv)
    import jax
    import jax.numpy as jnp

    from ishapediting_tpu.cli.edit import parse_edit_log, write_edit_log
    from ishapediting_tpu.config import preset
    from ishapediting_tpu.edit.batch import (
        build_batched_problems,
        drag_edit_batched,
        fit_real_shapes_batched,
        invert_batched,
    )
    from ishapediting_tpu.edit.engine import DragEngine
    from ishapediting_tpu.geometry.mesh import TriMesh
    from ishapediting_tpu.parallel.mesh import make_mesh
    from ishapediting_tpu.parallel.sampling import sample_sharded

    if bool(args.mesh) == bool(args.latent_seed):
        raise SystemExit("give either --mesh ... or --latent_seed ... (>= 1)")
    n = len(args.mesh) or len(args.latent_seed)

    # per-shape edit specs
    if args.edit_log:
        log = parse_edit_log(args.edit_log)
        ids = sorted(log)
        if len(ids) < n:
            raise SystemExit(f"EditLog has {len(ids)} edits for {n} shapes")
        specs = [log[ids[i]] for i in range(n)]
    else:
        if not args.source or len(args.source) != len(args.target):
            raise SystemExit("need matching --source/--target or --edit_log")
        shared = {
            "sources": np.asarray(args.source, np.float32),
            "targets": np.asarray(args.target, np.float32),
            "scale": args.scale,
            "lam": args.lam,
        }
        specs = [shared] * n
    # per-shape edit strengths (each EditLog entry keeps its own Scale/Lambda)
    scales = np.asarray([float(s["scale"]) for s in specs], np.float32)
    lams = np.asarray([float(s["lam"]) for s in specs], np.float32)

    from ishapediting_tpu.config import with_feat_store_dtype

    config = with_feat_store_dtype(
        preset(args.preset, args.num_steps), args.feat_dtype
    )
    if args.model_dir:
        engine = DragEngine.from_model_dir(args.model_dir, config=config)
    elif args.random_init:
        engine = DragEngine(config, seed=args.seed)
    else:
        raise SystemExit("need --model_dir or --random_init")
    os.makedirs(args.out, exist_ok=True)

    # the device mesh: data axis sized to the largest divisor of n that fits
    n_dev = len(jax.devices())
    data = max(d for d in range(1, min(n, n_dev) + 1) if n % d == 0)
    mesh = make_mesh(data)
    print(f"{n} shapes over a {data}-device data mesh")

    # Batched fwd+bwd activation memory scales with shapes-per-device; the
    # engine's remat default (False) is a batch-1 measurement and must not
    # silently govern N-shape programs (an OOM here previously had no knob)
    if args.remat == "auto":
        use_remat = engine.remat or (n // data) > 8
    else:
        use_remat = args.remat == "on"
    if use_remat != engine.remat:
        print(f"remat={'on' if use_remat else 'off'} for the batched "
              f"programs ({n // data} shapes/device)")
    mf = engine.model_fn_p(feat=True, remat=use_remat)
    mf_plain = engine.model_fn_p(feat=False, remat=use_remat)
    rng = jax.random.PRNGKey(args.seed)

    # --- latents: fit real meshes or sample from seeds -------------------
    if args.mesh:
        meshes: List[TriMesh] = [
            TriMesh.read(m).normalize_unit_cube() for m in args.mesh
        ]
        sched_fit = engine.sched
        if (
            args.fit_steps is not None
            and args.fit_steps < engine.sched.num_timesteps
        ):
            sched_fit = engine._fit_schedule(args.fit_steps)
            print(f"fast fitting: {sched_fit.num_timesteps} of "
                  f"{engine.sched.num_timesteps} guided steps")
        print("fitting meshes to triplanes (batched classifier guidance) ...")
        latents = fit_real_shapes_batched(
            sched_fit,
            mf_plain,
            engine.unet_params,
            engine.decoder_params,
            meshes,
            engine.half_range,
            engine.middle,
            rng,
            latent_shape=config.latent_shape,
            fit_cfg=config.fit,
            seed=args.seed,
            clip_denoised=config.diffusion.clip_denoised,
            mesh=mesh,
        )
    else:
        print("sampling latents (sharded) ...")
        x_T = jnp.stack(
            [
                jax.random.normal(
                    jax.random.PRNGKey(s), config.latent_shape, jnp.float32
                )
                for s in args.latent_seed
            ]
        )
        latents = sample_sharded(
            engine.sched,
            None,
            mesh,
            batch_size=n,
            latent_shape=config.latent_shape,
            rng=rng,
            x_T=x_T,
            model_fn_p=mf_plain,
            params=engine.unet_params,
        )

    # --- inversion (batched) ---------------------------------------------
    print("edit-friendly inversion (batched) ...")
    inv = invert_batched(
        engine.sched,
        mf,
        engine.unet_params,
        jnp.asarray(latents),
        jax.random.fold_in(rng, 1),
        w_time=config.edit.w_time,
        clip_denoised=config.diffusion.clip_denoised,
        mesh=mesh,
        feat_dtype=jnp.dtype(config.edit.feat_store_dtype),
    )

    # --- drag (batched, sharded) ------------------------------------------
    problems = build_batched_problems(
        [s["sources"] for s in specs],
        [s["targets"] for s in specs],
        r1=config.edit.r1,
        voxel_size=config.edit.voxel_size,
        feat_width=inv["features"].shape[-2],
    )
    # fast editing (framework extension): respace the edit window; the
    # engine caches the schedule per count (resample-only)
    sched_drag, positions = engine.sched, None
    noise_mode = args.noise_mode
    if args.edit_steps is not None and args.edit_steps < config.edit.w_time:
        sched_drag, positions = engine._fast_edit_schedule(args.edit_steps)
        noise_mode = "resample"  # recorded noise belongs to the full grid
        print(f"fast editing: {args.edit_steps} of "
              f"{config.edit.w_time} guided steps (noise_mode=resample)")
    print(f"dragging {n} shapes ({noise_mode}) ...")
    edited = drag_edit_batched(
        sched_drag,
        mf,
        engine.unet_params,
        inv["w"],
        inv["features"],
        problems,
        jax.random.fold_in(rng, 2),
        w_time=config.edit.w_time,
        scale=scales,
        cof=lams,
        clip_denoised=config.diffusion.clip_denoised,
        mesh=mesh,
        noise_mode=noise_mode,
        variances_batch=None if positions is not None else inv["variances"],
        variance_noise_batch=(
            None if positions is not None else inv["variance_noise"]
        ),
        edit_positions=positions,
    )

    # --- decode + write -----------------------------------------------------
    for i in range(n):
        orig = engine.get_mesh(jnp.asarray(latents[i : i + 1]))
        orig.write(os.path.join(args.out, f"original{i + 1:02d}.obj"))
        m = engine.get_mesh(edited[i])
        out_path = os.path.join(args.out, f"edit{i + 1:02d}.obj")
        m.write(out_path)
        write_edit_log(
            os.path.join(args.out, "EditLog"),
            f"{i + 1:02d}",
            specs[i]["sources"],
            specs[i]["targets"],
            float(specs[i]["scale"]),
            float(specs[i]["lam"]),
        )
        print(f"  wrote {out_path} ({len(m.vertices)} verts)")


if __name__ == "__main__":
    main()
