"""Benchmark harness — prints ONE JSON line.

Metric: unconditional triplane sampling throughput at DDIM-50 on the
published NFD UNet (128^2 latent, 96ch, 256 base channels, learned sigma),
batch 8, bf16 torso — the BASELINE.md north-star configuration
(reference path: generate.py:52-71 + image_sample.py:168-184, respaced to
DDIM-50).

``vs_baseline``: ratio to an estimated A100 PyTorch-fp16 reference. The
reference repo publishes no numbers (BASELINE.md), so the A100 estimate is
derived transparently from the model's analytic FLOPs assuming 312 TFLOP/s
peak fp16 and 35% utilization for an eager PyTorch conv UNet — printed in
the JSON for auditability.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from ishapediting_tpu.config import UNetConfig
from ishapediting_tpu.core.diffusion import ddim_sample_loop
from ishapediting_tpu.core.schedule import make_schedule
from ishapediting_tpu.models.unet import build_layout, init_unet_params, unet_apply

BATCH = 8
DDIM_STEPS = 50


def unet_flops_per_sample(cfg: UNetConfig) -> float:
    """Analytic forward FLOPs (convs + attention matmuls) for one latent."""
    layout = build_layout(cfg)
    flops = 0.0
    size = cfg.image_size

    def conv_f(k, cin, cout, s):
        return 2.0 * k * k * cin * cout * s * s

    def walk(blocks, size):
        nonlocal flops
        for block in blocks:
            for l in block:
                if l.kind == "conv":
                    flops += conv_f(3, l.in_ch, l.out_ch, size)
                elif l.kind == "res":
                    s_in = size
                    if l.updown == "down":
                        size //= 2
                    elif l.updown == "up":
                        size *= 2
                    flops += conv_f(3, l.in_ch, l.out_ch, size)  # in_conv
                    flops += conv_f(3, l.out_ch, l.out_ch, size)  # out_conv
                    if l.in_ch != l.out_ch:
                        flops += conv_f(1, l.in_ch, l.out_ch, size)
                    flops += 2.0 * (4 * cfg.model_channels) * 2 * l.out_ch
                elif l.kind == "attn":
                    t = size * size
                    c = l.in_ch
                    flops += 2.0 * c * 3 * c * t  # qkv
                    flops += 2.0 * 2.0 * t * t * c  # logits + weighted sum
                    flops += 2.0 * c * c * t  # proj
                elif l.kind == "downsample":
                    size //= 2
                    flops += conv_f(3, l.in_ch, l.out_ch, size)
                elif l.kind == "upsample":
                    size *= 2
                    flops += conv_f(3, l.in_ch, l.out_ch, size)
        return size

    size = walk(layout.input_blocks, size)
    size = walk((layout.middle_block,), size)
    size = walk(layout.output_blocks, size)
    flops += conv_f(3, layout.out_ch_final, cfg.out_channels, cfg.image_size)
    return flops


def main():
    # persistent compile cache when the backend supports it
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/ishape_jax_cache")
    except Exception:
        pass
    cfg = UNetConfig()  # published model, bf16 torso
    sched = make_schedule(1000, "linear", f"ddim{DDIM_STEPS}")
    params = init_unet_params(jax.random.PRNGKey(0), cfg)

    # params MUST be a jit argument: closing over them bakes 550M constants
    # into the jaxpr and explodes compile time on some backends.
    def loop(params, x, r):
        model_fn = lambda a, b: unet_apply(cfg, params, a, b)
        return ddim_sample_loop(sched, model_fn, x, r)

    fn = jax.jit(loop)
    x_T = jax.random.normal(jax.random.PRNGKey(1), (BATCH, 128, 128, 96), jnp.float32)

    # warmup / compile; force completion with a scalar fetch (some PJRT
    # backends do not block in block_until_ready)
    t0 = time.perf_counter()
    out = fn(params, x_T, jax.random.PRNGKey(2))
    float(np.asarray(jnp.sum(out)))
    compile_s = time.perf_counter() - t0

    import os

    trace_dir = os.environ.get("ISHAPE_TRACE")
    if trace_dir:
        jax.profiler.start_trace(trace_dir)
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        out = fn(params, x_T, jax.random.PRNGKey(3 + i))
        float(np.asarray(jnp.sum(out)))
        times.append(time.perf_counter() - t0)
    if trace_dir:
        jax.profiler.stop_trace()
    assert np.isfinite(np.asarray(out)).all()
    best = min(times)
    samples_per_sec = BATCH / best

    flops_fwd = unet_flops_per_sample(cfg)
    a100_eff_flops = 312e12 * 0.35  # eager PyTorch fp16 conv UNet estimate
    a100_samples_per_sec = a100_eff_flops / (flops_fwd * DDIM_STEPS)

    print(
        json.dumps(
            {
                "metric": "triplane_samples_per_sec_ddim50",
                "value": round(samples_per_sec, 4),
                "unit": "samples/s/chip",
                "vs_baseline": round(samples_per_sec / a100_samples_per_sec, 3),
                "detail": {
                    "batch": BATCH,
                    "compile_s": round(compile_s, 1),
                    "wall_s_per_batch": round(best, 4),
                    "unet_tflops_fwd_per_sample": round(flops_fwd / 1e12, 3),
                    "a100_est_samples_per_sec": round(a100_samples_per_sec, 4),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
