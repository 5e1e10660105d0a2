"""Parity harness against reference assets/outputs (run when available).

The released NFD checkpoints and the reference's CUDA outputs are not part
of this repository (gitignored upstream; BASELINE.md), so quantitative
CD-parity runs when a user supplies them:

    # 1. checkpoint conversion audit (shapes/coverage/orphans)
    python tools/parity_check.py convert --model_dir models/chairs

    # 2. sample with converted weights and compare against reference meshes
    python tools/parity_check.py meshes --ours samples/objects --theirs ref_objs

    # 3. decode a reference-generated triplane .npy with our decoder and
    #    compare to the reference's decoded mesh
    python tools/parity_check.py triplane --model_dir models/chairs \
        --triplane ref/triplanes/0.npy --mesh ref/objects/0.obj
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def cmd_convert(args):
    from ishapediting_tpu.config import UNetConfig
    from ishapediting_tpu.io.model_dir import discover_model_dir, load_stats
    from ishapediting_tpu.io.torch_convert import (
        load_torch_checkpoint,
        load_torch_decoder,
    )
    from ishapediting_tpu.models.unet import build_layout, init_unet_params

    import jax

    info = discover_model_dir(args.model_dir)
    print(f"unet ckpt:    {info.unet_ckpt}")
    print(f"decoder ckpt: {info.decoder_ckpt}")
    print(f"stats dir:    {info.stats_dir}")

    params = load_torch_checkpoint(info.unet_ckpt)
    expect = init_unet_params(jax.random.PRNGKey(0), UNetConfig())
    missing = sorted(set(expect) - set(params))
    extra = sorted(set(params) - set(expect))
    bad_shapes = []
    for k in sorted(set(expect) & set(params)):
        for leaf in expect[k]:
            if leaf not in params[k]:
                bad_shapes.append(f"{k}.{leaf}: missing leaf")
            elif params[k][leaf].shape != expect[k][leaf].shape:
                bad_shapes.append(
                    f"{k}.{leaf}: {params[k][leaf].shape} != {expect[k][leaf].shape}"
                )
    print(f"modules: {len(params)} converted / {len(expect)} expected")
    if missing:
        print(f"MISSING ({len(missing)}):", missing[:10])
    if extra:
        print(f"EXTRA ({len(extra)}):", extra[:10])
    if bad_shapes:
        print(f"SHAPE MISMATCHES ({len(bad_shapes)}):", bad_shapes[:10])
    dec = load_torch_decoder(info.decoder_ckpt)
    print(f"decoder: fourier_B {dec['fourier_B'].shape}, "
          f"hidden {dec['dense1']['w'].shape}")
    if info.stats_dir:
        stats = load_stats(info.stats_dir)
        print(f"stats: half_range[{stats.half_range.min():.3f}, "
              f"{stats.half_range.max():.3f}]")
    ok = not (missing or extra or bad_shapes)
    print("CONVERSION", "OK" if ok else "FAILED")
    return 0 if ok else 1


def cmd_meshes(args):
    from ishapediting_tpu.geometry.mesh import TriMesh
    from ishapediting_tpu.geometry.metrics import (
        chamfer_distance,
        hausdorff_distance,
        iou,
    )

    ours = sorted(f for f in os.listdir(args.ours) if f.endswith(".obj"))
    rows = []
    for name in ours:
        theirs_path = os.path.join(args.theirs, name)
        if not os.path.exists(theirs_path):
            continue
        a = TriMesh.read(os.path.join(args.ours, name))
        b = TriMesh.read(theirs_path)
        cd = chamfer_distance(a, b, args.points)
        hd = hausdorff_distance(a, b, args.points)
        jv = iou(a, b, args.points)
        rows.append((name, cd, hd, jv))
        print(f"{name}: CD={cd:.6f} HD={hd:.4f} IoU={jv:.4f}")
    if not rows:
        print("no matching mesh pairs found")
        return 1
    cds = [r[1] for r in rows]
    print(f"mean CD {np.mean(cds):.6f}  (n={len(rows)})")
    return 0


def cmd_triplane(args):
    import jax.numpy as jnp

    from ishapediting_tpu.compat import create_obj
    from ishapediting_tpu.geometry.mesh import TriMesh
    from ishapediting_tpu.geometry.metrics import chamfer_distance
    from ishapediting_tpu.io.model_dir import discover_model_dir
    from ishapediting_tpu.io.torch_convert import load_torch_decoder

    info = discover_model_dir(args.model_dir)
    dec = load_torch_decoder(info.decoder_ckpt)
    tri = np.load(args.triplane).reshape(3, 32, 128, 128)
    mesh = create_obj(dec, tri, res=args.res)
    if args.mesh:
        ref = TriMesh.read(args.mesh)
        cd = chamfer_distance(mesh, ref, args.points)
        print(f"CD(our decode, reference decode) = {cd:.6f}")
    out = args.out or "parity_decode.obj"
    mesh.write(out)
    print(f"wrote {out} ({len(mesh.vertices)} verts)")
    return 0


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("convert")
    c.add_argument("--model_dir", required=True)

    m = sub.add_parser("meshes")
    m.add_argument("--ours", required=True)
    m.add_argument("--theirs", required=True)
    m.add_argument("--points", type=int, default=100_000)

    t = sub.add_parser("triplane")
    t.add_argument("--model_dir", required=True)
    t.add_argument("--triplane", required=True)
    t.add_argument("--mesh", default=None)
    t.add_argument("--res", type=int, default=256)
    t.add_argument("--points", type=int, default=100_000)
    t.add_argument("--out", default=None)

    args = p.parse_args(argv)
    return {"convert": cmd_convert, "meshes": cmd_meshes, "triplane": cmd_triplane}[
        args.cmd
    ](args)


if __name__ == "__main__":
    sys.exit(main())
