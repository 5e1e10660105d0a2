"""Forward-pass ablation with the tap conv impl: where does the time go?

Monkeypatches ops.nn pieces to identity and times a scan of UNet forwards.
Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_ablate.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# NOTE: do not set jax_compilation_cache_dir on axon — measured 20x slower
# init/compile with it (docs/PERF.md "Runtime update").

import ishapediting_tpu.ops.nn as nnops
import ishapediting_tpu.models.unet as unet_mod
import ishapediting_tpu.ops.attention as attn_mod
from ishapediting_tpu.config import UNetConfig

BATCH = 8
REPS = 12

nnops._CONV_IMPL_CACHE = "tap"

orig_group_norm = nnops.group_norm
orig_attn = unet_mod._apply_attn
orig_silu = nnops.silu


def fetch(x):
    return float(np.asarray(jnp.sum(x)))


def timed_scan(cfg, params, label):
    x = jax.random.normal(jax.random.PRNGKey(1), (BATCH, 128, 128, 96), jnp.float32)
    t = jnp.full((BATCH,), 500, jnp.int32)

    def body(c, _):
        out, _f = unet_mod.unet_apply(cfg, params, c, t)
        return c + 1e-6 * out[..., : c.shape[-1]].astype(c.dtype), None

    def fn(x0):
        c, _ = lax.scan(body, x0, None, length=REPS)
        return jnp.sum(c)

    f = jax.jit(fn)
    fetch(f(x))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        fetch(f(x))
        ts.append(time.perf_counter() - t0)
    per = min(ts) / REPS
    print(f"{label:24s}: {per*1e3:7.2f} ms/fwd (batch {BATCH})")
    return per


def main():
    print("device:", jax.devices()[0])
    cfg = UNetConfig()
    params = unet_mod.init_unet_params(jax.random.PRNGKey(0), cfg)

    full = timed_scan(cfg, params, "full")

    nnops.group_norm = lambda x, s, b, num_groups=32, eps=1e-5: x
    unet_mod.group_norm = nnops.group_norm
    no_gn = timed_scan(cfg, params, "no groupnorm")
    nnops.group_norm = orig_group_norm
    unet_mod.group_norm = orig_group_norm

    unet_mod._apply_attn = lambda p, prefix, layer, h: h
    no_attn = timed_scan(cfg, params, "no attention")
    unet_mod._apply_attn = orig_attn

    nnops.silu = lambda x: x
    unet_mod.silu = nnops.silu
    no_silu = timed_scan(cfg, params, "no silu")
    nnops.silu = orig_silu
    unet_mod.silu = orig_silu

    print(f"groupnorm share: {100*(full-no_gn)/full:.1f}%")
    print(f"attention share: {100*(full-no_attn)/full:.1f}%")
    print(f"silu share:      {100*(full-no_silu)/full:.1f}%")


if __name__ == "__main__":
    main()
