"""Does marching_tets_device compute scale with the capacity caps?

The fused decode+march program is ~2 s of the ~2.3 s device mesh tail
(docs/bench_r04b_chip.json). Its gather/interp work is proportional to
``max_cells`` (the compacted active-cell buffer, default res^3/32), while
the cell-mask + nonzero compaction scan is proportional to res^3 and
capacity-independent. This times device_grid_to_mesh on the realistic
293k-tri sphere at caps {1/32 (default), 1/64, 1/128} to see which term
dominates — if walls drop with the cap, an adaptive capacity ladder in the
engine is worth its extra compile.

Run alone: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_march_cap.py
Self-exits on a deadline (never kill a chip client externally).
"""

import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

RESULTS = {}


def _arm(deadline_env="MARCHCAP_DEADLINE_S", default="1500"):
    deadline = float(os.environ.get(deadline_env, default))

    def bail():
        time.sleep(deadline)
        print(json.dumps({"march_cap": RESULTS, "truncated": True}), flush=True)
        os._exit(7)

    threading.Thread(target=bail, daemon=True).start()


def main():
    _arm()
    t0 = time.time()
    float(np.asarray(jnp.sum(jax.jit(lambda x: x + 1)(jnp.zeros(8)))))
    print(f"session warmup: {time.time() - t0:.1f}s", flush=True)

    from ishapediting_tpu.ops.marching import device_grid_to_mesh

    res = 256
    c = jnp.linspace(-1.0, 1.0, res)
    x, y, z = jnp.meshgrid(c, c, c, indexing="ij")
    grid = 0.4 - jnp.sqrt(x * x + y * y + z * z)  # the bench_mesh_tail sphere

    for div in (32, 64, 128):
        max_cells = res**3 // div
        max_tris = 3 * max_cells
        t1 = time.time()
        mesh = device_grid_to_mesh(
            grid, 0.0, max_cells=max_cells, max_tris=max_tris
        )
        cold = time.time() - t1
        if mesh is None:
            RESULTS[f"div{div}"] = {"overflow": True, "cold_s": round(cold, 1)}
            print(f"div={div}: OVERFLOW (cold {cold:.1f}s)", flush=True)
            continue
        times = []
        for _ in range(3):
            t1 = time.time()
            mesh = device_grid_to_mesh(
                grid, 0.0, max_cells=max_cells, max_tris=max_tris
            )
            times.append(time.time() - t1)
        RESULTS[f"div{div}"] = {
            "cold_s": round(cold, 1),
            "warm_best_s": round(min(times), 2),
            "warm_all_s": [round(t, 2) for t in times],
            "n_tris": len(mesh.triangles),
        }
        print(f"div={div}: cold {cold:.1f}s warm {min(times):.2f}s "
              f"(all {[round(t,2) for t in times]}) tris={len(mesh.triangles)}",
              flush=True)

    print(json.dumps({"march_cap": RESULTS, "truncated": False}), flush=True)


if __name__ == "__main__":
    main()
