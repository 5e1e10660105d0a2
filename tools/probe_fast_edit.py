"""Measure fast-edit (window-respaced drag) guidance effectiveness.

Loads the committed edit-gate asset (tests/assets/edit_gate.npz, toy
pipeline w_time=12) and, for each step count, runs the SAME fixed-seed
drag twice — scale-0 (unguided) and the gate's scale — on the respaced
schedule, reporting the motion-loss reduction and locality IoU. This is
the evidence base for the `edit_steps` quality claim in docs/PERF.md
"Fast editing" and for the CI threshold in tests/test_fast_edit.py.

CPU-only (forces the CPU backend before any jax use). Reference context:
the reference always walks all w_time guided steps (drag_utils.py:336-399);
fast editing is a framework extension.

Usage: python tools/probe_fast_edit.py [--steps 12,6,4,3]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", default="12,8,6,4,3")
    ap.add_argument("--seeds", type=int, default=1,
                    help="average the reduction over this many drag seeds "
                    "(toy-prior instance variance is high)")
    ap.add_argument("--scale_mult", type=float, default=1.0,
                    help="multiply the gate scale (probe guidance-strength "
                    "compensation at aggressive step reductions)")
    args = ap.parse_args(argv)

    from tools.make_edit_gate_asset import _engine_from_parts, locality_iou
    from tests.test_edit_gate import _unflatten, ASSET

    npz = np.load(ASSET)
    engine = _engine_from_parts(
        _unflatten(npz, "ema"),
        _unflatten(npz, "dec"),
        npz["half_range"],
        npz["middle"],
    )
    eval_seed = int(npz["eval_seed"])
    scale = float(npz["scale"]) * args.scale_mult
    cof = float(npz["cof"])
    w_time = engine.config.edit.w_time

    engine.latent_inversion(jnp.asarray(npz["latent0"][None]), seed=eval_seed)
    original = engine.mesh0
    ox = original.vertices[:, 0]
    handle = original.vertices[np.argmax(ox)].astype(np.float32)
    target = handle + np.array([0.25, 0, 0], np.float32)

    print(f"w_time={w_time} scale={scale} cof={cof} seeds={args.seeds}")
    print(f"{'steps':>6} {'mean_red':>9} {'min_red':>9} {'mean_IoU':>9} "
          f"{'wall_s':>7}")
    for s in [int(x) for x in args.steps.split(",")]:
        kw = dict(chunk=4, noise_mode="resample")
        if s < w_time:
            kw["edit_steps"] = s
        reds, ious, wall = [], [], 0.0
        for seed in range(eval_seed, eval_seed + args.seeds):
            engine.drag_edit(
                handle[None], target[None], scale=0.0, cof=0.0,
                seed=seed, **kw,
            )
            motion0 = float(engine.last_drag_losses["motion"][-1])
            t0 = time.perf_counter()
            edited = engine.drag_edit(
                handle[None], target[None], scale=scale, cof=cof,
                seed=seed, **kw,
            )
            wall = time.perf_counter() - t0  # last (warm) call
            motion = float(engine.last_drag_losses["motion"][-1])
            reds.append(1.0 - motion / motion0)
            ious.append(locality_iou(original, edited, handle, target))
        print(f"{s:>6} {np.mean(reds):>+9.1%} {np.min(reds):>+9.1%} "
              f"{np.mean(ious):>9.3f} {wall:>7.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
