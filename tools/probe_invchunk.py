"""Sweep the ddpm_inversion backward-pass chunk size at full model scale.

The backward pass batches all 170 independent UNet evaluations through the
model in `chunk`-sized groups (core/diffusion.py::ddpm_inversion). This
measures wall-clock for chunk in {1,2,4,8} so the default is justified by
numbers — measured 2026-08-18 (docs/PERF.md "Inversion chunk sweep"):
warm 1.21/1.48/1.81/1.00 s at chunk 1/2/4/8, so the engine ships chunk=8.

Run alone: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_invchunk.py

Self-deadline (``INVCHUNK_DEADLINE_S``, default 2700): the process exits 7
on its own timer instead of being externally killed — a killed tunnel
client wedges the server for the next one (docs/PERF.md). Partial results
print per chunk, and a final JSON summary line aggregates what completed.
"""

import json
import os
import sys
import threading
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from ishapediting_tpu.config import PipelineConfig
from ishapediting_tpu.core.diffusion import ddpm_inversion
from ishapediting_tpu.core.schedule import make_schedule
from ishapediting_tpu.edit.features import regroup_features
from ishapediting_tpu.models.unet import init_unet_params, unet_apply

RESULTS = {}


from ishapediting_tpu.utils.device import fetch_scalar as fetch  # noqa: E402


def _arm_self_deadline():
    deadline = float(os.environ.get("INVCHUNK_DEADLINE_S", "2700"))

    def bail():
        time.sleep(deadline)
        print(json.dumps({"invchunk": RESULTS, "truncated": True}), flush=True)
        os._exit(7)

    threading.Thread(target=bail, daemon=True).start()


def main():
    _arm_self_deadline()
    t0 = time.time()
    fetch(jax.jit(lambda x: x + 1)(jnp.zeros(8)))
    print(f"session warmup: {time.time() - t0:.1f}s", flush=True)

    cfg = PipelineConfig()
    sched = make_schedule(
        cfg.diffusion.base_steps,
        cfg.diffusion.noise_schedule,
        cfg.diffusion.timestep_respacing,
    )
    w_time = cfg.edit.w_time  # 170
    feat_dtype = jnp.bfloat16
    params = init_unet_params(jax.random.PRNGKey(0), cfg.unet)
    fetch(params["out.2"]["w"])
    print(f"params ready: {time.time() - t0:.1f}s", flush=True)

    def mf(params, x, t):
        return unet_apply(cfg.unet, params, x, t, feat_layer=cfg.edit.feat_layer)

    latent = jax.random.normal(
        jax.random.PRNGKey(1), (1,) + cfg.latent_shape, jnp.float32
    )

    for chunk in (1, 2, 4, 8):
        fn = jax.jit(
            lambda p, x, r, _c=chunk: ddpm_inversion(
                sched,
                partial(mf, p),
                x,
                r,
                steps=w_time,
                feat_postprocess=lambda f: regroup_features(f).astype(feat_dtype),
                chunk=_c,
            )
        )
        t0 = time.time()
        out = fn(params, latent, jax.random.PRNGKey(2))
        fetch(out["latent"])
        cold = time.time() - t0
        times = []
        for rep in range(3):
            t0 = time.time()
            out = fn(params, latent, jax.random.PRNGKey(3 + rep))
            fetch(out["latent"])
            times.append(time.time() - t0)
        RESULTS[chunk] = {
            "cold_s": round(cold, 1),
            "warm_best_s": round(min(times), 2),
            "warm_all_s": [round(t, 2) for t in times],
        }
        print(
            f"chunk={chunk}: cold {cold:.1f}s, warm best {min(times):.2f}s "
            f"(all {[round(t, 2) for t in times]})",
            flush=True,
        )
    print(json.dumps({"invchunk": RESULTS, "truncated": False}), flush=True)


if __name__ == "__main__":
    main()
