"""Probe: can the current runtime lower Mosaic (Pallas TPU) kernels?

The harness backend historically could not (hangs / block-shape lowering
errors — docs/PERF.md), so ``ops/pallas_kernels.py`` gates itself off via
``platform_version``. The runtime was rebuilt mid-round-2; this probe
force-enables compiled (non-interpret) mode and checks both kernels against
the pure-JAX reference composition. Run under ``timeout`` — a hang is a
"no" answer.

Usage: timeout 240 python tools/probe_pallas.py
"""

import numpy as np

import jax
import jax.numpy as jnp

from ishapediting_tpu.ops import pallas_kernels as pk
from ishapediting_tpu.ops.attention import dense_qkv_attention

# force compiled Mosaic lowering regardless of the platform_version gate
pk._genuine_tpu = lambda: True

print("backend:", jax.default_backend(), flush=True)


def fetch(x):
    return np.asarray(jnp.sum(x.astype(jnp.float32)))


# --- groupnorm_silu (no FiLM, then FiLM) -----------------------------------
rng = jax.random.PRNGKey(0)
x = jax.random.normal(rng, (2, 32, 32, 128), jnp.bfloat16)
scale = jnp.ones((128,), jnp.float32)
bias = jnp.zeros((128,), jnp.float32)

try:
    y = jax.jit(lambda a: pk.groupnorm_silu(a, scale, bias))(x)
    got = fetch(y)
    ref = fetch(pk._gn_silu_reference(x, jnp.stack([scale, bias]), None, 32, 1e-5))
    print(f"groupnorm_silu: OK sum={got:.3f} ref={ref:.3f}", flush=True)
except Exception as e:  # noqa: BLE001
    print(f"groupnorm_silu: FAIL {type(e).__name__}: {str(e)[:500]}", flush=True)

# --- attention_qkv ----------------------------------------------------------
qkv = jax.random.normal(jax.random.PRNGKey(1), (2, 1024, 3 * 512), jnp.bfloat16)
try:
    y = jax.jit(lambda a: pk.attention_qkv(a, 8))(qkv)
    got = fetch(y)
    ref = fetch(dense_qkv_attention(qkv, 8))
    print(f"attention_qkv: OK sum={got:.3f} ref={ref:.3f}", flush=True)
except Exception as e:  # noqa: BLE001
    print(f"attention_qkv: FAIL {type(e).__name__}: {str(e)[:500]}", flush=True)
