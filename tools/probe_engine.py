"""Time the full-size engine paths on the chip: edit-friendly inversion
(170 steps, batched-parallel backward) and the drag-edit loop (170 guided
fwd+bwd steps). Random-init weights — timings only depend on shapes.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_engine.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from ishapediting_tpu.config import PipelineConfig
from ishapediting_tpu.edit.engine import DragEngine


def fetch(x):
    return float(np.asarray(jnp.sum(x.astype(jnp.float32))))


def main():
    t0 = time.time()
    fetch(jax.jit(lambda x: x + 1)(jnp.zeros(8)))
    print(f"session warmup: {time.time() - t0:.1f}s", flush=True)

    t0 = time.time()
    # shape_resolution 32: random weights decode to NOISE occupancy, and a
    # 256^3 noise grid marches into a multi-million-triangle mesh whose
    # 10x smoothing burns tens of minutes of host CPU — the UNet-path
    # timings we're here for don't touch the decode resolution.
    import dataclasses

    cfg = PipelineConfig()
    cfg = dataclasses.replace(
        cfg, edit=dataclasses.replace(cfg.edit, shape_resolution=32)
    )
    engine = DragEngine(cfg, seed=0)
    print(f"engine init (421M params): {time.time() - t0:.1f}s", flush=True)

    latent = np.asarray(
        jax.random.normal(jax.random.PRNGKey(1), (1, 128, 128, 96), jnp.float32)
    )

    # inversion: 170-step stochastic chain + batched-parallel backward,
    # then a 256^3 decode + marching tetrahedra for the mesh
    t0 = time.time()
    engine.latent_inversion(latent, seed=2)
    t_inv_cold = time.time() - t0
    t0 = time.time()
    engine.latent_inversion(latent, seed=3)
    t_inv = time.time() - t0
    print(
        f"latent_inversion (incl. get_mesh): cold {t_inv_cold:.1f}s, "
        f"warm {t_inv:.1f}s",
        flush=True,
    )

    # drag edit: full 170 guided steps (fwd+bwd through the UNet each)
    src = np.array([[0.3, 0.0, 0.0]], np.float32)
    tgt = np.array([[0.3, 0.3, 0.0]], np.float32)
    t0 = time.time()
    engine.drag_edit(src, tgt, scale=600.0, cof=0.2, chunk=10, seed=4)
    t_drag_cold = time.time() - t0
    t0 = time.time()
    engine.drag_edit(src, tgt, scale=600.0, cof=0.2, chunk=10, seed=5)
    t_drag = time.time() - t0
    w_time = engine.config.edit.w_time
    print(
        f"drag_edit 170 steps (incl. get_mesh): cold {t_drag_cold:.1f}s, "
        f"warm {t_drag:.1f}s ({t_drag / w_time * 1e3:.1f} ms/step incl. "
        "decode+fetch)",
        flush=True,
    )


if __name__ == "__main__":
    main()
