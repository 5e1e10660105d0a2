"""Decode saved triplane ``.npy`` files to meshes (reference:
triplane_decoder/visualize.py ``main()``, :108-128).

    python -m ishapediting_tpu.cli.decode --input samples/triplanes/0.npy \
        --output out.obj --model_path models/chairs/decoder.pt --res 256

Accepts the reference layout ([96,H,W] or [3,32,H,W] NCHW, physical scale —
what ``cli.generate`` and the reference's ``generate.py`` both save) and our
NHWC [3,H,W,32]. The decoder comes from a torch ``.pt`` state_dict, a
``decoder.orbax`` directory, a category ``--model_dir`` (either format
discovered), or ``--random_init`` for smoke tests. Beyond the reference:
multiple inputs decode in one process (the grid program compiles once),
``--smooth`` applies the engine's Laplacian smoothing, and
``--cross_section`` saves the mid-plane occupancy image
(reference: visualize.py:10-33)."""

from __future__ import annotations

import argparse
import os
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Decode triplane .npy files to .obj meshes"
    )
    p.add_argument("--input", type=str, nargs="+", required=True,
                   help="triplane .npy file(s): [96,H,W] / [3,32,H,W] NCHW "
                        "(reference contract) or [3,H,W,32] NHWC")
    p.add_argument("--output", type=str, required=True,
                   help=".obj path (single input) or directory (writes "
                        "<stem>.obj per input)")
    p.add_argument("--model_path", type=str, default=None,
                   help="decoder checkpoint: torch .pt state_dict or a "
                        "decoder.orbax directory")
    p.add_argument("--model_dir", type=str, default=None,
                   help="category dir — discovers the decoder like "
                        "cli.generate (io/model_dir.py)")
    p.add_argument("--random_init", action="store_true",
                   help="random decoder weights (smoke tests)")
    p.add_argument("--res", type=int, default=256,
                   help="occupancy grid resolution (reference uses 256)")
    p.add_argument("--smooth", type=int, default=0,
                   help="Laplacian smoothing iterations (0 = raw marching "
                        "output, matching reference create_obj)")
    p.add_argument("--cross_section", type=str, default=None,
                   help="also save a mid-plane occupancy .png "
                        "(reference: visualize.py cross_section)")
    p.add_argument("--cross_section_axis", type=str, default="z",
                   choices=("x", "y", "z"))
    p.add_argument("--seed", type=int, default=0)
    return p


def _load_decoder(args, in_channels: int) -> dict:
    if args.model_path:
        if os.path.isdir(args.model_path):
            from ishapediting_tpu.io.checkpoint import load_params

            return load_params(args.model_path)
        from ishapediting_tpu.io.torch_convert import load_torch_decoder

        return load_torch_decoder(args.model_path)
    if args.model_dir:
        from ishapediting_tpu.io.model_dir import discover_model_dir

        info = discover_model_dir(args.model_dir)
        if info.decoder_orbax:
            from ishapediting_tpu.io.checkpoint import load_params

            return load_params(info.decoder_orbax)
        if info.decoder_ckpt:
            from ishapediting_tpu.io.torch_convert import load_torch_decoder

            return load_torch_decoder(info.decoder_ckpt)
        raise SystemExit(f"no decoder checkpoint found under {args.model_dir}")
    if args.random_init:
        import jax

        from ishapediting_tpu.ops.triplane import init_decoder_params

        # match the input's plane channels (tiny-preset planes carry 2,
        # the published decoder 32)
        return init_decoder_params(
            jax.random.PRNGKey(args.seed), in_channels=in_channels
        )
    raise SystemExit("need --model_path, --model_dir or --random_init")


def _load_planes(path: str):
    """npy -> [3, H, W, C] float32 NHWC (accepts the reference's NCHW)."""
    import numpy as np

    from ishapediting_tpu.compat import _planes_to_nhwc

    arr = np.asarray(np.load(path), np.float32)
    if arr.ndim == 3:  # [3*C, H, W] flattened NCHW (generate.py contract)
        if arr.shape[0] % 3:
            raise SystemExit(
                f"{path}: first dim {arr.shape[0]} not divisible by 3 "
                f"(expected [3C,H,W]); shape={arr.shape}"
            )
        # layout is KNOWN here — transpose unconditionally (the heuristic
        # below would mis-handle cube-shaped planes where C == H)
        arr = arr.reshape(3, arr.shape[0] // 3, *arr.shape[1:])
        return arr.transpose(0, 2, 3, 1)
    if arr.ndim != 4 or arr.shape[0] != 3:
        raise SystemExit(f"{path}: expected 3 planes, got shape {arr.shape}")
    try:
        return _planes_to_nhwc(arr)
    except ValueError as exc:
        raise SystemExit(f"{path}: {exc}") from exc


def main(argv=None):
    from ishapediting_tpu.utils.device import honor_env_platform

    honor_env_platform()  # make JAX_PLATFORMS=cpu actually mean CPU
    args = build_parser().parse_args(argv)
    from ishapediting_tpu.compat import create_obj, cross_section

    all_planes = [_load_planes(p) for p in args.input]
    decoder_params = _load_decoder(args, in_channels=all_planes[0].shape[-1])

    out_is_dir = len(args.input) > 1 or os.path.isdir(args.output)
    if out_is_dir:
        os.makedirs(args.output, exist_ok=True)

    for path, planes in zip(args.input, all_planes):
        stem = os.path.splitext(os.path.basename(path))[0]
        out_path = (
            os.path.join(args.output, stem + ".obj")
            if out_is_dir
            else args.output
        )
        t0 = time.time()
        mesh = create_obj(decoder_params, planes, res=args.res)
        if args.smooth > 0:
            mesh = mesh.filter_smooth_simple(args.smooth)
        mesh.write(out_path)
        print(
            f"{path} -> {out_path} ({len(mesh.vertices)} verts, "
            f"{round(time.time() - t0, 3)}s)"
        )
        if args.cross_section:
            cs_path = (
                os.path.join(args.output, stem + "_cross.png")
                if out_is_dir
                else args.cross_section
            )
            cross_section(
                decoder_params,
                planes,
                res=min(args.res, 512),
                axis=args.cross_section_axis,
                save_path=cs_path,
            )
            print(f"cross-section -> {cs_path}")


if __name__ == "__main__":
    main()
