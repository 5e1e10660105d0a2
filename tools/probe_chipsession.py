"""One consolidated chip session: sanity timing, the inversion chunk sweep,
and the 256^3 device-marching mesh tail — run sequentially in a SINGLE
process so the tunnel pays one session-warmup penalty and nothing gets
killed mid-run (docs/PERF.md "Runtime update": killed clients leave
server-side debt that degrades the next sessions for tens of minutes).

Run alone (no concurrent CPU load — the tunnel compiles on this machine):
    PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_chipsession.py
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def fetch(x):
    return float(np.asarray(jnp.sum(x.astype(jnp.float32))))


def main():
    t0 = time.time()
    fetch(jax.jit(lambda x: x + 1)(jnp.zeros(8)))
    print(
        f"[session] warmup {time.time() - t0:.1f}s backend="
        f"{jax.default_backend()} device={jax.devices()[0]}",
        flush=True,
    )

    # matmul sanity: confirms the chip is actually executing, not just
    # accepting programs
    x = jnp.ones((1024, 1024), jnp.bfloat16)
    t0 = time.time()
    s = fetch(jax.jit(jnp.dot)(x, x))
    print(f"[session] 1k matmul sum={s:.0f} in {time.time() - t0:.1f}s", flush=True)

    # 1) inversion chunk sweep (PERF.md pending item)
    import os

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import probe_invchunk

    print("[session] === inversion chunk sweep ===", flush=True)
    probe_invchunk.main()

    # 2) device marching mesh tail at 256^3 — first execution of the fused
    # nonzero(size=)/compaction program on the real chip
    import bench

    print("[session] === mesh tail 256^3 (device vs host) ===", flush=True)
    t0 = time.time()
    try:
        out = bench.bench_mesh_tail(256)
        print(f"[session] mesh_tail: {out} (total {time.time() - t0:.1f}s)", flush=True)
    except Exception as exc:
        print(
            f"[session] mesh_tail FAILED: {type(exc).__name__}: {exc}",
            flush=True,
        )
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
