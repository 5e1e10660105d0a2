"""Tunneled-backend completion barriers — the ONE home of the idiom.

``jax.block_until_ready`` does not block on the tunneled axon backend
(docs/PERF.md "Backend gotchas"), so wall-clock attribution forces a tiny
scalar fetch instead: the device stream is in-order, so one scalar transfer
drains everything queued before it.

Timing caveat that travels with the idiom: each DISTINCT eager slice shape
compiles its own fetch program on the tunnel (~1-2 s) — a timed call whose
fetch slice differs from the warmup's measures that compile, not compute.
Warm the exact slice shape first (CLAUDE.md; bench.py decode timing).
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np


def honor_env_platform() -> None:
    """Make ``JAX_PLATFORMS=cpu`` actually mean CPU. The tunnel plugin's
    .pth hook re-registers its backend at interpreter start and overrides
    the env var, so a user running ``JAX_PLATFORMS=cpu python -m
    ishapediting_tpu.cli....`` would silently hit the real chip
    (docs/PERF.md / CLAUDE.md). Every CLI main calls this before the first
    backend touch; bench.py and __graft_entry__ carry the same pin."""
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)


def fetch_scalar(x) -> float:
    """Fetch ``sum(x)`` as a host float — a completion barrier for ``x``
    and everything queued before it. Pass a small slice (e.g. ``g[:1]``)
    to avoid full-buffer traffic, and warm that exact slice shape before
    timing (module docstring)."""
    return float(np.asarray(jnp.sum(x.astype(jnp.float32))))


def await_device(*arrays) -> None:
    """Barrier over several arrays: one tiny slice-sum fetch per array,
    no full-buffer traffic. Non-array entries are skipped."""
    for a in arrays:
        if a is None or not hasattr(a, "ndim"):
            continue
        sl = a[(slice(0, 1),) * a.ndim] if a.ndim else a
        fetch_scalar(sl)
