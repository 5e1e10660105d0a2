"""Batch-size sweep for DDIM-50 sampling with the tap conv impl, interleaved.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_batch.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

# NOTE: do not set jax_compilation_cache_dir on axon — measured 20x slower
# init/compile with it (docs/PERF.md "Runtime update").

from ishapediting_tpu.config import UNetConfig
from ishapediting_tpu.core.diffusion import ddim_sample_loop
from ishapediting_tpu.core.schedule import make_schedule
from ishapediting_tpu.models.unet import init_unet_params, unet_apply

STEPS = 50
BATCHES = [4, 8, 12, 16]
ROUNDS = 3


def fetch(x):
    return float(np.asarray(jnp.sum(x)))


def main():
    print("device:", jax.devices()[0])
    cfg = UNetConfig()
    sched = make_schedule(1000, "linear", f"ddim{STEPS}")
    t0 = time.perf_counter()
    params = init_unet_params(jax.random.PRNGKey(0), cfg)
    fetch(params["out.2"]["w"])
    print(f"param init (jitted single program): {time.perf_counter()-t0:.1f} s")

    def loop(params, x, r):
        model_fn = lambda a, b: unet_apply(cfg, params, a, b)
        return ddim_sample_loop(sched, model_fn, x, r)

    fn = jax.jit(loop)
    xs, times = {}, {b: [] for b in BATCHES}
    for b in BATCHES:
        xs[b] = jax.random.normal(jax.random.PRNGKey(b), (b, 128, 128, 96), jnp.float32)
        t0 = time.perf_counter()
        fetch(fn(params, xs[b], jax.random.PRNGKey(2)))
        print(f"b{b}: compile+first {time.perf_counter()-t0:.1f} s")
    for r in range(ROUNDS):
        for b in BATCHES:
            t0 = time.perf_counter()
            fetch(fn(params, xs[b], jax.random.PRNGKey(10 + r)))
            times[b].append(time.perf_counter() - t0)
    for b in BATCHES:
        best = min(times[b])
        print(f"b{b:2d}: best {best:.3f} s -> {b/best:.2f} samples/s")


if __name__ == "__main__":
    main()
