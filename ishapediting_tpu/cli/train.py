"""Training CLI: fine-tune / train a triplane DDPM on a directory of
triplane ``.npy`` files, with checkpoint/resume.

    python -m ishapediting_tpu.cli.train --data samples/chairs_samples/triplanes \
        --stats models/chairs/statistics/chairs_triplanes_stats \
        --ckpt_dir runs/chairs_ft --steps 10000 --batch_size 8

Use ``--preset tiny --synthetic N`` for a smoke run without assets.
"""

from __future__ import annotations

import argparse

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description="Train a triplane DDPM")
    p.add_argument("--data", type=str, default=None, help="dir of triplane .npy")
    p.add_argument("--stats", type=str, default=None, help="statistics dir")
    p.add_argument("--synthetic", type=int, default=0,
                   help="train on N synthetic latents (smoke testing)")
    p.add_argument("--preset", type=str, default="chairs")
    p.add_argument("--init_from", type=str, default=None,
                   help="torch ema .pt or category dir to fine-tune from")
    p.add_argument("--ckpt_dir", type=str, default="runs/default")
    p.add_argument("--steps", type=int, default=10_000)
    p.add_argument("--ckpt_every", type=int, default=1000)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--grad_clip", type=float, default=1.0)
    p.add_argument("--ema_rate", type=float, default=0.9999)
    p.add_argument("--seed", type=int, default=0)
    return p


def main(argv=None):
    from ishapediting_tpu.utils.device import honor_env_platform

    honor_env_platform()  # make JAX_PLATFORMS=cpu actually mean CPU
    args = build_parser().parse_args(argv)
    import jax

    from ishapediting_tpu.config import preset
    from ishapediting_tpu.core.schedule import make_schedule
    from ishapediting_tpu.io.dataset import TriplaneDataset
    from ishapediting_tpu.io.model_dir import TriplaneStats, load_stats
    from ishapediting_tpu.models.unet import init_unet_params
    from ishapediting_tpu.train.loop import train

    config = preset(args.preset)
    cfg = config.unet
    # training uses the full (non-respaced) chain
    sched = make_schedule(config.diffusion.base_steps, config.diffusion.noise_schedule, "")

    channels = config.num_planes * config.plane_channels
    stats = load_stats(args.stats) if args.stats else TriplaneStats.identity(channels)

    if args.data:
        ds = TriplaneDataset(args.data, stats, channels=channels)
        batches = ds.batches(args.batch_size, seed=args.seed)
    elif args.synthetic:
        rng = np.random.default_rng(args.seed)
        shape = (args.synthetic,) + config.latent_shape

        def synthetic():
            data = np.clip(rng.standard_normal(shape).astype(np.float32), -1, 1)
            while True:
                idx = rng.integers(0, args.synthetic, args.batch_size)
                yield data[idx]

        batches = synthetic()
    else:
        raise SystemExit("need --data or --synthetic")

    if args.init_from:
        import os

        from ishapediting_tpu.io.torch_convert import load_torch_checkpoint

        path = args.init_from
        if os.path.isdir(path):
            from ishapediting_tpu.io.model_dir import discover_model_dir

            path = discover_model_dir(path).unet_ckpt
        params = load_torch_checkpoint(path)
    else:
        params = init_unet_params(jax.random.PRNGKey(args.seed), cfg)

    state = train(
        cfg,
        sched,
        params,
        batches,
        total_steps=args.steps,
        ckpt_dir=args.ckpt_dir,
        ckpt_every=args.ckpt_every,
        lr=args.lr,
        grad_clip=args.grad_clip,
        ema_rate=args.ema_rate,
        seed=args.seed,
    )
    print(f"done at step {int(state.step)}; checkpoints in {args.ckpt_dir}")


if __name__ == "__main__":
    main()
