"""Interleaved A/B: DDIM-50 sampling throughput, im2col vs tap conv.

The shared chip drifts run-to-run, so the two programs are compiled first and
then timed alternately for several rounds; report per-impl best and median.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_ab.py
"""

import statistics
import time

import jax
import jax.numpy as jnp
import numpy as np

# NOTE: do not set jax_compilation_cache_dir on axon — measured 20x slower
# init/compile with it (docs/PERF.md "Runtime update").

import ishapediting_tpu.ops.nn as nnops
from ishapediting_tpu.config import UNetConfig
from ishapediting_tpu.core.diffusion import ddim_sample_loop
from ishapediting_tpu.core.schedule import make_schedule
from ishapediting_tpu.models.unet import init_unet_params, unet_apply

BATCH = 8
STEPS = 50
ROUNDS = 5


def fetch(x):
    return float(np.asarray(jnp.sum(x)))


def build(impl, cfg, sched, params, x_T):
    nnops._CONV_IMPL_CACHE = impl

    def loop(params, x, r):
        model_fn = lambda a, b: unet_apply(cfg, params, a, b)
        return ddim_sample_loop(sched, model_fn, x, r)

    fn = jax.jit(loop)
    t0 = time.perf_counter()
    fetch(fn(params, x_T, jax.random.PRNGKey(2)))
    print(f"{impl}: compile+first-run {time.perf_counter()-t0:.1f} s")
    return fn


def main():
    print("device:", jax.devices()[0])
    cfg = UNetConfig()
    sched = make_schedule(1000, "linear", f"ddim{STEPS}")
    params = init_unet_params(jax.random.PRNGKey(0), cfg)
    x_T = jax.random.normal(jax.random.PRNGKey(1), (BATCH, 128, 128, 96), jnp.float32)

    import sys

    impls = sys.argv[1:] or ["im2col", "tap"]
    fns = {}
    for impl in impls:
        nnops._CONV_IMPL_CACHE = impl
        fns[impl] = build(impl, cfg, sched, params, x_T)

    times = {impl: [] for impl in impls}
    for r in range(ROUNDS):
        for impl in impls:
            nnops._CONV_IMPL_CACHE = impl
            t0 = time.perf_counter()
            fetch(fns[impl](params, x_T, jax.random.PRNGKey(10 + r)))
            times[impl].append(time.perf_counter() - t0)
    for impl in impls:
        ts = times[impl]
        print(
            f"{impl:7s}: best {min(ts):.3f} s  median {statistics.median(ts):.3f} s "
            f"-> best {BATCH/min(ts):.2f} samples/s  all={['%.2f' % t for t in ts]}"
        )


if __name__ == "__main__":
    main()
