"""Latent-space shape morphing CLI (framework extension; the reference has
no morphing — its ``ddim_reverse_sample`` is dead code,
gaussian_diffusion.py:718-761).

    python -m ishapediting_tpu.cli.morph --model_dir models/chairs \
        --seed_a 3 --seed_b 7 --frames 5 --out morphs/

Each endpoint is a generated shape (``--seed_a/b``) or a saved triplane
``.npy`` (``--tri_a/b`` — physical scale, any layout ``cli.decode``
accepts). Both endpoints DDIM-encode to the noise shell in one batch-2
scan, interpolate there with slerp, and all frames decode in one batch-K
scan (edit/morph.py). Writes ``frame_kk.obj`` meshes plus
``latents.npy`` ([K, H, W, C] normalized) for further editing."""

from __future__ import annotations

import argparse
import os
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Morph between two shapes through the diffusion "
        "noise space"
    )
    p.add_argument("--model_dir", type=str, default=None)
    p.add_argument("--random_init", action="store_true")
    p.add_argument("--preset", type=str, default="chairs")
    p.add_argument("--seed_a", type=int, default=None,
                   help="generate endpoint A from this latent seed")
    p.add_argument("--seed_b", type=int, default=None)
    p.add_argument("--tri_a", type=str, default=None,
                   help="endpoint A from a physical triplane .npy "
                        "(layouts as in cli.decode)")
    p.add_argument("--tri_b", type=str, default=None)
    p.add_argument("--frames", type=int, default=5)
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--shape_resolution", type=int, default=None,
                   help="mesh grid res (default: config preset)")
    p.add_argument("--smooth", type=int, default=10)
    p.add_argument("--skip_decode", action="store_true",
                   help="write latents.npy only")
    p.add_argument("--seed", type=int, default=0)
    return p


def _endpoint_latent(engine, seed, tri_path, which):
    import numpy as np

    if (seed is None) == (tri_path is None):
        raise SystemExit(f"give exactly one of --seed_{which} / --tri_{which}")
    if seed is not None:
        # plain generation (no feature caching — morphing does not edit)
        return engine.sample_latent(seed=seed)
    from ishapediting_tpu.cli.decode import _load_planes

    planes = _load_planes(tri_path)  # [3, H, W, C]
    h, w = planes.shape[1:3]
    phys = planes.transpose(1, 2, 0, 3).reshape(h, w, -1)  # [H, W, 3C]
    half = np.asarray(engine.half_range, np.float32)
    mid = np.asarray(engine.middle, np.float32)
    return (phys - mid) / np.where(half == 0, 1.0, half)


def main(argv=None):
    from ishapediting_tpu.utils.device import honor_env_platform

    honor_env_platform()  # make JAX_PLATFORMS=cpu actually mean CPU
    args = build_parser().parse_args(argv)
    import numpy as np

    from ishapediting_tpu.config import preset
    from ishapediting_tpu.edit.engine import DragEngine

    config = preset(args.preset)
    if args.model_dir:
        engine = DragEngine.from_model_dir(args.model_dir, config=config)
    elif args.random_init:
        engine = DragEngine(config, seed=args.seed)
    else:
        raise SystemExit("need --model_dir or --random_init")

    lat_a = _endpoint_latent(engine, args.seed_a, args.tri_a, "a")
    lat_b = _endpoint_latent(engine, args.seed_b, args.tri_b, "b")

    t0 = time.time()
    mesh = None
    try:
        import jax

        from ishapediting_tpu.parallel.mesh import make_mesh

        n_dev = len(jax.devices())
        if n_dev > 1 and args.frames % n_dev == 0:
            mesh = make_mesh(n_dev)  # one frame trajectory per device
    except Exception:
        mesh = None
    latents = engine.morph(lat_a, lat_b, n=args.frames, mesh=mesh)
    print(
        f"morphed {args.frames} frames (batched encode+decode"
        + (f", sharded over {mesh.shape}" if mesh is not None else "")
        + f", {round(time.time() - t0, 3)}s)"
    )

    os.makedirs(args.out, exist_ok=True)
    np.save(os.path.join(args.out, "latents.npy"), latents)
    if not args.skip_decode:
        for k in range(latents.shape[0]):
            mesh = engine.get_mesh(
                latents[k][None],
                smooth=args.smooth,
                res=args.shape_resolution,
            )
            path = os.path.join(args.out, f"frame_{k:02d}.obj")
            mesh.write(path)
            print(f"wrote {path} ({len(mesh.vertices)} verts)")


if __name__ == "__main__":
    main()
