"""Training CLI: fine-tune / train a triplane DDPM on a directory of
triplane ``.npy`` files, with checkpoint/resume.

    python -m ishapediting_tpu.cli.train --data samples/chairs_samples/triplanes \
        --stats models/chairs/statistics/chairs_triplanes_stats \
        --ckpt_dir runs/chairs_ft --steps 10000 --batch_size 8

Use ``--preset tiny --synthetic N`` for a smoke run without assets.
"""

from __future__ import annotations

import argparse
import os

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
    p.add_argument("--export_model_dir", type=str, default=None,
                   help="after training, write a serveable category dir "
                        "(unet.orbax EMA + decoder.orbax + statistics) that "
                        "DragEngine.from_model_dir loads directly")
    p.add_argument("--decoder_from", type=str, default=None,
                   help="decoder for --export_model_dir: an orbax dir or a "
                        "torch .pt")
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

    if args.export_model_dir:
        export_model_dir(
            args.export_model_dir,
            state.ema_params,
            decoder_from=args.decoder_from,
            stats_dir=args.stats,
            channels=channels,
        )
        print(f"exported serveable model dir: {args.export_model_dir}")


def export_model_dir(
    out_dir: str,
    ema_params,
    decoder_from=None,
    stats_dir=None,
    channels: int = 96,
) -> None:
    """Write a serveable category directory from trained params: the
    native-checkpoint counterpart of the reference's asset layout
    (drag_utils.py:213-228) — ``unet.orbax`` (EMA weights),
    ``decoder.orbax`` (from ``decoder_from``: an orbax dir or a torch
    ``.pt``), and ``statistics/`` (copied from ``stats_dir``, or explicit
    identity bounds when absent). ``DragEngine.from_model_dir`` loads the
    result directly — train -> serve round-trips with no torch involved."""
    import shutil

    from ishapediting_tpu.io.checkpoint import load_params, save_params

    os.makedirs(out_dir, exist_ok=True)
    save_params(os.path.join(out_dir, "unet.orbax"), ema_params)
    if decoder_from:
        if os.path.isdir(decoder_from):
            dec = load_params(decoder_from)
        else:
            from ishapediting_tpu.io.torch_convert import load_torch_decoder

            dec = load_torch_decoder(decoder_from)
        save_params(os.path.join(out_dir, "decoder.orbax"), dec)
    else:
        print(
            f"WARNING: no --decoder_from; {out_dir} has no decoder and "
            "DragEngine.from_model_dir will refuse to load it until a "
            "decoder.orbax (or decoder .pt) is added"
        )
    stats_out = os.path.join(out_dir, "statistics")
    if stats_dir:
        name = os.path.basename(os.path.normpath(stats_dir))
        dst = os.path.join(stats_out, name)
        if not os.path.exists(dst):
            shutil.copytree(stats_dir, dst)
    else:
        # explicit identity bounds so the exported dir loads without
        # allow_identity_stats (the normalization really is identity for a
        # model trained on already-normalized latents)
        ident = os.path.join(stats_out, "identity")
        os.makedirs(ident, exist_ok=True)
        np.save(os.path.join(ident, "lower_bound.npy"),
                np.full(channels, -1.0, np.float32))
        np.save(os.path.join(ident, "upper_bound.npy"),
                np.full(channels, 1.0, np.float32))


if __name__ == "__main__":
    main()
