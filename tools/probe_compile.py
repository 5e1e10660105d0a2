"""Compile-time vs run-time: DDIM-50 as one scan vs python loop over one step.

Also measures the tap_accum conv formulation at full model scale.
Run: ISHAPE_CONV_IMPL=im2col python tools/probe_compile.py
     ISHAPE_CONV_IMPL=tap python tools/probe_compile.py   (after impl added)
"""

import os
import shutil
import time

import jax
import jax.numpy as jnp
import numpy as np

CACHE = "/tmp/ishape_probe_cache"
shutil.rmtree(CACHE, ignore_errors=True)
jax.config.update("jax_compilation_cache_dir", CACHE)

from ishapediting_tpu.config import UNetConfig
from ishapediting_tpu.core.diffusion import ddim_sample, ddim_sample_loop
from ishapediting_tpu.core.schedule import make_schedule
from ishapediting_tpu.models.unet import init_unet_params, unet_apply

BATCH = 8
STEPS = 50


def fetch(x):
    return float(np.asarray(jnp.sum(x)))


def main():
    print("device:", jax.devices()[0], "conv:", os.environ.get("ISHAPE_CONV_IMPL"))
    cfg = UNetConfig()
    sched = make_schedule(1000, "linear", f"ddim{STEPS}")
    params = init_unet_params(jax.random.PRNGKey(0), cfg)
    x_T = jax.random.normal(jax.random.PRNGKey(1), (BATCH, 128, 128, 96), jnp.float32)

    # --- python loop over one jitted step ---
    def step(params, x, t):
        model_fn = lambda a, b: unet_apply(cfg, params, a, b)
        return ddim_sample(sched, model_fn, x, t)["sample"]

    step_j = jax.jit(step)
    t0 = time.perf_counter()
    out = step_j(params, x_T, jnp.full((BATCH,), STEPS - 1, jnp.int32))
    fetch(out)
    t_compile_step = time.perf_counter() - t0
    print(f"single-step compile+run: {t_compile_step:.1f} s")

    def loop_run():
        x = x_T
        for t in range(STEPS - 1, -1, -1):
            x = step_j(params, x, jnp.full((BATCH,), t, jnp.int32))
        return fetch(x)

    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        loop_run()
        ts.append(time.perf_counter() - t0)
    t_loop = min(ts)
    print(f"python-loop DDIM-{STEPS}: {t_loop:.3f} s/batch -> {BATCH/t_loop:.2f} samples/s")

    # --- one scan ---
    def loop(params, x, r):
        model_fn = lambda a, b: unet_apply(cfg, params, a, b)
        return ddim_sample_loop(sched, model_fn, x, r)

    fn = jax.jit(loop)
    t0 = time.perf_counter()
    out = fn(params, x_T, jax.random.PRNGKey(2))
    fetch(out)
    t_compile_scan = time.perf_counter() - t0
    print(f"scan compile+run (cold cache): {t_compile_scan:.1f} s")
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        out = fn(params, x_T, jax.random.PRNGKey(3 + i))
        fetch(out)
        ts.append(time.perf_counter() - t0)
    t_scan = min(ts)
    print(f"scan DDIM-{STEPS}: {t_scan:.3f} s/batch -> {BATCH/t_scan:.2f} samples/s")


if __name__ == "__main__":
    main()
