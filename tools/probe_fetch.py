"""Measure host<-device fetch strategies for the 256^3 occupancy grid.

The tunnel fetches ~10-30 MB/s single-stream (docs/PERF.md "Harness
quirk"); this probe checks whether K concurrent slab fetches multiplex to
higher aggregate throughput. Every measurement uses FRESH device arrays —
np.asarray of an already-fetched jax Array returns its cached host copy and
times as zero.

Run alone: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_fetch.py
"""

import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

import jax
import jax.numpy as jnp

RES = 256
NBYTES_MB = RES * RES * RES * 2 / 1e6


def fetch_scalar(x):
    return float(np.asarray(jnp.sum(x.astype(jnp.float32))))


_gen = jax.jit(
    lambda k: jax.random.normal(k, (RES, RES, RES), jnp.float32).astype(jnp.float16)
)


def fresh_grid(i):
    g = _gen(jax.random.PRNGKey(i))
    fetch_scalar(g[:1, :1, :1])  # materialize without caching the full host copy
    return g


def time_full(i):
    g = fresh_grid(i)
    t0 = time.time()
    np.asarray(g)
    return time.time() - t0


def time_slabs(i, k, parallel):
    g = fresh_grid(i)
    step = RES // k
    slabs = [g[j * step : (j + 1) * step] for j in range(k)]
    for s in slabs:
        fetch_scalar(s[:1, :1, :1])  # run the slice programs
    t0 = time.time()
    if parallel:
        with ThreadPoolExecutor(k) as ex:
            list(ex.map(np.asarray, slabs))
    else:
        for s in slabs:
            np.asarray(s)
    return time.time() - t0


def main():
    t0 = time.time()
    fetch_scalar(jax.jit(lambda x: x + 1)(jnp.zeros(8)))
    print(f"session warmup: {time.time() - t0:.1f}s", flush=True)

    # interleave strategies across 3 rounds so congestion drift hits all
    strategies = [("full", lambda i: time_full(i))]
    for k in (2, 4, 8):
        strategies.append((f"seq{k}", lambda i, _k=k: time_slabs(i, _k, False)))
        strategies.append((f"par{k}", lambda i, _k=k: time_slabs(i, _k, True)))

    results = {name: [] for name, _ in strategies}
    i = 0
    for rnd in range(3):
        for name, fn in strategies:
            dt = fn(i)
            i += 1
            results[name].append(dt)
            print(
                f"round {rnd} {name}: {dt:.2f}s ({NBYTES_MB/dt:.1f} MB/s)",
                flush=True,
            )
    print("--- best of 3 ---")
    for name in results:
        best = min(results[name])
        print(f"{name}: {best:.2f}s ({NBYTES_MB/best:.1f} MB/s)")


if __name__ == "__main__":
    main()
