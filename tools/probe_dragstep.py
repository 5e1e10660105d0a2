"""Intrinsic fwd vs fwd+bwd UNet throughput at batch 1 and 8.

Why: the drag step runs `value_and_grad` w.r.t. the latent at batch 1
(one edit = one shape) and the bench credits it 3x forward FLOPs; it
measures 77-83 TF/s vs the 123 TF/s the batch-8 forward sampling reaches
and the 141 TF/s matmul ceiling. This probe separates the two candidate
causes — batch-1 occupancy vs the backward pass itself — by timing the
four corners {fwd, fwd+bwd(x)} x {batch 1, batch 8} on the published
421M UNet with the same feature tap the drag step uses.

Self-exiting (daemon timer -> os._exit) per the wedge rules in CLAUDE.md;
run ALONE on the chip. Reference context: the drag loop is
drag_utils.py:336-399 (always batch 1 in the reference too).

Run: python tools/probe_dragstep.py
"""

import os
import statistics
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEADLINE_S = 2400


def _bail():
    time.sleep(DEADLINE_S)
    print(f"probe self-exit after {DEADLINE_S}s (wedged)", flush=True)
    os._exit(7)


threading.Thread(target=_bail, daemon=True).start()

import jax
import jax.numpy as jnp
import numpy as np

from ishapediting_tpu.config import UNetConfig
from ishapediting_tpu.models.unet import init_unet_params, unet_apply

ROUNDS = 6


def fetch(x):
    return float(np.asarray(jnp.sum(x)))


def main():
    print("device:", jax.devices()[0], flush=True)
    cfg = UNetConfig()
    params = init_unet_params(jax.random.PRNGKey(0), cfg)
    # forward FLOPs per sample: same constant the bench uses
    import bench

    flops_fwd = bench.unet_flops_per_sample(cfg)
    print(f"flops_fwd/sample = {flops_fwd/1e12:.4f} TFLOP", flush=True)

    from ishapediting_tpu.config import PipelineConfig

    cfg_feat = PipelineConfig().edit.feat_layer

    def fwd(params, x):
        out, _ = unet_apply(cfg, params, x, jnp.full((x.shape[0],), 170,
                                                     jnp.int32))
        return out

    def fwdbwd(params, x):
        # the drag step's shape: fwd with feature tap, scalar loss on the
        # tapped features, grad w.r.t. the latent (edit/drag.py)
        def loss(xi):
            out, feat = unet_apply(
                cfg, params, xi,
                jnp.full((xi.shape[0],), 170, jnp.int32),
                feat_layer=cfg_feat,
            )
            return jnp.sum(feat.astype(jnp.float32)) + 0.0 * jnp.sum(
                out.astype(jnp.float32)
            )

        val, g = jax.value_and_grad(loss)(x)
        return g

    cases = []
    for batch in (1, 8):
        x = jax.random.normal(
            jax.random.PRNGKey(1), (batch, cfg.image_size, cfg.image_size,
                                    cfg.in_channels), jnp.float32
        )
        for name, f, mult in (("fwd", fwd, 1.0), ("fwd+bwd", fwdbwd, 3.0)):
            fn = jax.jit(f)
            t0 = time.perf_counter()
            fetch(fn(params, x))
            print(f"b{batch} {name}: compile+first "
                  f"{time.perf_counter()-t0:.1f} s", flush=True)
            cases.append((batch, name, fn, x, mult))

    results = {}
    for _ in range(ROUNDS):
        for batch, name, fn, x, mult in cases:
            t0 = time.perf_counter()
            fetch(fn(params, x))
            dt = time.perf_counter() - t0
            results.setdefault((batch, name, mult), []).append(dt)

    print(f"\n{'case':>12} {'best_s':>8} {'med_s':>8} {'TF/s best':>10} "
          f"{'/sample_ms':>11}")
    for (batch, name, mult), ts in results.items():
        best, med = min(ts), statistics.median(ts)
        tfs = mult * flops_fwd * batch / best / 1e12
        print(f"b{batch} {name:>9} {best:>8.4f} {med:>8.4f} {tfs:>10.1f} "
              f"{best/batch*1e3:>11.2f}", flush=True)


if __name__ == "__main__":
    main()
