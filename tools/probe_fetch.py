"""Measure host<-device fetch strategies for the 256^3 occupancy grid.

The tunnel fetches ~28 MB/s single-stream (docs/PERF.md "Harness quirk");
this probe checks whether K concurrent slab fetches multiplex to higher
aggregate throughput — if yes, the engine's get_mesh should fetch the grid
in parallel slabs instead of one np.asarray.

Run alone (tunnel congestion skews everything):
    PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_fetch.py
"""

import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

import jax
import jax.numpy as jnp


def fetch_scalar(x):
    return float(np.asarray(jnp.sum(x.astype(jnp.float32))))


def main():
    t0 = time.time()
    fetch_scalar(jax.jit(lambda x: x + 1)(jnp.zeros(8)))
    print(f"session warmup: {time.time() - t0:.1f}s", flush=True)

    res = 256
    grid = jax.jit(
        lambda k: jax.random.normal(k, (res, res, res), jnp.float32).astype(
            jnp.float16
        )
    )(jax.random.PRNGKey(0))
    fetch_scalar(grid)  # materialize
    nbytes = res * res * res * 2 / 1e6
    print(f"grid ready: {nbytes:.0f} MB fp16", flush=True)

    # 1. single full fetch
    for rep in range(2):
        t0 = time.time()
        host = np.asarray(grid)
        dt = time.time() - t0
        print(f"full fetch #{rep}: {dt:.2f}s ({nbytes/dt:.1f} MB/s)", flush=True)
        del host

    # 2. pre-sliced device arrays (slice once, fetch K ways)
    for k in (2, 4, 8):
        step = res // k
        slabs = [grid[i * step : (i + 1) * step] for i in range(k)]
        for s in slabs:
            fetch_scalar(s[:1])  # force the slice programs to run
        # sequential slab fetches
        t0 = time.time()
        parts = [np.asarray(s) for s in slabs]
        dt_seq = time.time() - t0
        # parallel slab fetches
        t0 = time.time()
        with ThreadPoolExecutor(k) as ex:
            parts = list(ex.map(np.asarray, slabs))
        dt_par = time.time() - t0
        ok = np.concatenate(parts, axis=0).shape == (res, res, res)
        print(
            f"k={k}: sequential {dt_seq:.2f}s, parallel {dt_par:.2f}s "
            f"({nbytes/dt_par:.1f} MB/s) ok={ok}",
            flush=True,
        )

    # 3. smaller payloads: int8-scaled fetch (diagnostic only)
    g8 = jax.jit(lambda g: jnp.clip(g.astype(jnp.float32) * 42.0, -127, 127).astype(jnp.int8))(grid)
    fetch_scalar(g8[:1])
    t0 = time.time()
    _ = np.asarray(g8)
    dt = time.time() - t0
    print(f"int8 full fetch: {dt:.2f}s ({nbytes/2/dt:.1f} MB/s)", flush=True)


if __name__ == "__main__":
    main()
