"""Batch triplane generation CLI (reference: generate.py + image_sample.py).

    python -m ishapediting_tpu.cli.generate --model_dir models/chairs \
        --num_samples 8 --num_steps 256 --save_dir samples/chairs_samples

Outputs match the reference contract: ``<save_dir>/triplanes/{i}.npy``
([96,128,128] float, physical scale — unnormalized) and
``<save_dir>/objects/{i}.obj`` meshes, with ddpm/decode wall-clock prints
(reference: generate.py:72-98). Sampling shards the batch over every visible
device (parallel/sampling.py); use ``--random_init`` to run without
pretrained checkpoints (smoke tests / benchmarking).
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Generate triplane samples and decode them to meshes"
    )
    p.add_argument("--model_dir", type=str, default=None,
                   help="category dir (ddpm ckpt + decoder + statistics)")
    p.add_argument("--random_init", action="store_true",
                   help="random weights (no checkpoints needed)")
    p.add_argument("--preset", type=str, default="chairs",
                   help="chairs|cars|planes|tiny (tiny = CPU smoke config)")
    p.add_argument("--num_samples", type=int, default=8)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--num_steps", type=int, default=256)
    p.add_argument("--use_ddim", action="store_true")
    p.add_argument("--use_dpm", action="store_true",
                   help="DPM-Solver++(2M): deterministic second-order ODE "
                   "sampler — DDIM-N quality in roughly half the steps "
                   "(framework extension; the reference has DDPM/DDIM only)")
    p.add_argument("--shape_resolution", type=int, default=256)
    p.add_argument("--sharded_decode", action="store_true",
                   help="decode one grid per device simultaneously "
                        "(parallel.decode.decode_grids_batched) instead of "
                        "sequentially per sample — the reference decodes "
                        "its batch one-by-one on one GPU (generate.py:89-98)")
    p.add_argument("--save_dir", type=str, default="samples/out")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--skip_decode", action="store_true")
    p.add_argument("--save_npz", action="store_true",
                   help="also save one samples_NxHxWxC.npz batch file "
                        "(image_sample.py main() contract)")
    p.add_argument("--save_intermediate", type=str, default=None,
                   help="comma-separated loop indices at which to dump "
                        "per-step latent snapshots (reference "
                        "save_intermediate, image_sample.py:70-102), e.g. "
                        "'0,100,199'; writes <save_dir>/intermediate_tensors/"
                        "<obj>_it<idx>.npy (NCHW, physical scale)")
    return p


def main(argv=None):
    from ishapediting_tpu.utils.device import honor_env_platform

    honor_env_platform()  # make JAX_PLATFORMS=cpu actually mean CPU
    args = build_parser().parse_args(argv)
    import jax
    import jax.numpy as jnp

    from ishapediting_tpu.config import preset
    from ishapediting_tpu.edit.engine import DragEngine
    from ishapediting_tpu.parallel.sampling import plan_data_mesh, sample_batches

    config = preset(args.preset, args.num_steps, use_ddim=args.use_ddim)
    if args.use_dpm:
        # log-SNR-uniform grid: measured 1.4-4x more accurate for the
        # solver than the ddim grid at 10-25 steps (docs/PERF.md)
        config = config.with_dpm(
            min(args.num_steps, config.diffusion.base_steps)
        )

    if args.model_dir:
        engine = DragEngine.from_model_dir(args.model_dir, config=config)
    elif args.random_init:
        engine = DragEngine(config, seed=args.seed)
    else:
        raise SystemExit("need --model_dir or --random_init")

    if args.use_dpm:
        # duplicate log-SNR snaps collapse near the base step count, so the
        # realized grid can be shorter than requested
        # (core/schedule.py::lambda_uniform_timesteps) — tell the user
        requested = min(args.num_steps, config.diffusion.base_steps)
        realized = engine.sched.num_timesteps
        print(
            f"dpm respacing: requested {requested} steps, realized {realized}"
            + ("" if realized == requested
               else " (duplicate log-SNR snaps collapsed)")
        )

    os.makedirs(args.save_dir, exist_ok=True)
    os.makedirs(f"{args.save_dir}/triplanes", exist_ok=True)

    mesh, usable = plan_data_mesh(args.batch_size)
    model_fn_p = engine.model_fn_p(feat=False)

    snapshot_steps = None
    if args.save_intermediate:
        snapshot_steps = tuple(
            int(s) for s in args.save_intermediate.split(",") if s != ""
        )
        if args.use_dpm:
            raise SystemExit(
                "--save_intermediate is not supported with --use_dpm "
                "(snapshot loop covers ddpm/ddim only)"
            )

    t1 = time.time()
    snapshots = []  # per batch: [K, n, H, W, C]
    if snapshot_steps is not None:
        # snapshot path: single-device jitted loop with the scan-carried
        # [K, B, ...] snapshot buffer (core/diffusion.py). rng derivation
        # MIRRORS parallel/sampling.py (x_T from the batch key, loop rng
        # from fold_in(key, 1)) so adding --save_intermediate dumps
        # intermediates of the SAME samples a plain run produces.
        from functools import partial as _partial

        from ishapediting_tpu.core.diffusion import p_sample_loop_snapshots

        samples = []
        _snap_cache = {}  # batch size -> jitted loop (no per-batch retrace)
        remaining = args.num_samples
        batch_idx = 0
        while remaining > 0:
            n = min(args.batch_size, remaining) if remaining >= usable else remaining
            n = max(n - n % usable, usable) if n >= usable else n
            fn = _snap_cache.get(n)
            if fn is None:
                fn = jax.jit(
                    lambda params, x, r: p_sample_loop_snapshots(
                        engine.sched,
                        _partial(model_fn_p, params),
                        x,
                        r,
                        snapshot_steps=snapshot_steps,
                        use_ddim=args.use_ddim,
                        clip_denoised=config.diffusion.clip_denoised,
                    )
                )
                _snap_cache[n] = fn
            batch_key = jax.random.PRNGKey(args.seed + batch_idx)
            x_T = jax.random.normal(
                batch_key, (n,) + config.latent_shape, jnp.float32
            )
            out_d = fn(
                engine.unet_params, x_T, jax.random.fold_in(batch_key, 1)
            )
            samples.append(np.asarray(out_d["sample"]))
            snapshots.append(np.asarray(out_d["snapshots"]))
            remaining -= n
            batch_idx += 1
        samples = np.concatenate(samples, axis=0)[: args.num_samples]
    else:
        samples = sample_batches(
            engine.sched,
            engine.unet_params,
            model_fn_p,
            num_samples=args.num_samples,
            batch_size=args.batch_size,
            latent_shape=config.latent_shape,
            seed=args.seed,
            sampler="dpm" if args.use_dpm else
            ("ddim" if args.use_ddim else "ddpm"),
            clip_denoised=config.diffusion.clip_denoised,
            mesh=mesh,
            usable=usable,
        )
    t2 = time.time()
    print("ddpm time:", round(t2 - t1, 4))

    # unnormalize to physical triplanes, save NCHW like the reference
    phys = samples * engine.stats.half_range + engine.stats.middle
    if args.save_npz:
        # FID-style batch file (reference: image_sample.py:120-130)
        shape_str = "x".join(str(d) for d in phys.shape)
        np.savez(os.path.join(args.save_dir, f"samples_{shape_str}.npz"), phys)
        print(f"saved samples_{shape_str}.npz")
    for idx in range(phys.shape[0]):
        np.save(
            f"{args.save_dir}/triplanes/{idx}.npy",
            phys[idx].transpose(2, 0, 1).astype(np.float32),
        )
        print(f"saving to {args.save_dir}/triplanes/{idx}.npy...")

    if snapshot_steps is not None and snapshots:
        # reference contract: intermediate_tensors/<obj>_it<idx>.npy, NCHW,
        # physical scale (image_sample.py:94-102 + unnormalize)
        os.makedirs(f"{args.save_dir}/intermediate_tensors", exist_ok=True)
        snaps = np.concatenate(snapshots, axis=1)[:, : args.num_samples]
        snaps = snaps * engine.stats.half_range + engine.stats.middle
        for k, step_idx in enumerate(snapshot_steps):
            for obj in range(snaps.shape[1]):
                np.save(
                    f"{args.save_dir}/intermediate_tensors/"
                    f"{obj}_it{step_idx}.npy",
                    snaps[k, obj].transpose(2, 0, 1).astype(np.float32),
                )
        print(
            f"saved {len(snapshot_steps)}x{snaps.shape[1]} intermediate "
            "tensors"
        )

    if not args.skip_decode:
        os.makedirs(f"{args.save_dir}/objects", exist_ok=True)
        done = 0
        if args.sharded_decode and usable > 1:
            # one grid per device, whole groups at a time; the remainder
            # (batch not divisible by the device count) falls through to
            # the per-sample path below
            from ishapediting_tpu.edit.fit import latents_to_planes
            from ishapediting_tpu.geometry.marching import grid_to_mesh
            from ishapediting_tpu.parallel.decode import decode_grids_batched

            k = (samples.shape[0] // usable) * usable
            if k:
                planes_b = latents_to_planes(
                    jnp.asarray(samples[:k]), engine.half_range, engine.middle
                )
                for g0 in range(0, k, usable):
                    grids = decode_grids_batched(
                        engine.decoder_params,
                        planes_b[g0 : g0 + usable],
                        mesh,
                        res=args.shape_resolution,
                        out_dtype=jnp.float16,  # matches get_mesh's fetch
                    )
                    for j in range(usable):
                        idx = g0 + j
                        print(f"Decoding triplane {idx}...")
                        grid = np.asarray(grids[j]).astype(np.float32)
                        grid_to_mesh(grid, iso=0.0, to_unit=True).write(
                            f"{args.save_dir}/objects/{idx}.obj"
                        )
                done = k
        for idx in range(done, samples.shape[0]):
            print(f"Decoding triplane {idx}...")
            # get_mesh auto-selects device marching off-CPU (the grid stays
            # in HBM; only the count-sized triangle payload is fetched) and
            # falls back to the host grid fetch + marching otherwise.
            mesh_out = engine.get_mesh(
                jnp.asarray(samples[idx][None]),
                smooth=0,
                res=args.shape_resolution,
            )
            mesh_out.write(f"{args.save_dir}/objects/{idx}.obj")
        print("Done!")
        print("decode time:", round(time.time() - t2, 4))


if __name__ == "__main__":
    main()
