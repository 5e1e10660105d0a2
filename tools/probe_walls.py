"""Full-scale engine wall attribution + drag remat A/B on the chip.

Answers two round-4 questions with the engine's own phase instrumentation
(edit/engine.py::last_phase_walls):

1. Where does the bench ``inversion_wall_s`` (26.4 s in
   docs/bench_r04_chip.json) actually go? The device-only probe measures
   1.0-1.2 s for the same 170-step inversion, so ~12 s beyond the ~13 s
   mesh tail is unattributed.
2. Is remat worth it for the drag step? remat trades ~an extra forward
   (~1.33x FLOPs) for activation memory; at batch 1 the 128^2 UNet may fit
   without it.

Run alone: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_walls.py

Self-exits via a daemon timer (never kill a chip client externally —
docs/PERF.md). Partial results print as they land; a final JSON line
aggregates what completed.
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


def _arm_self_deadline():
    deadline = float(os.environ.get("WALLS_DEADLINE_S", "2400"))

    def bail():
        time.sleep(deadline)
        print(json.dumps({"walls": RESULTS, "truncated": True}), flush=True)
        os._exit(7)

    threading.Thread(target=bail, daemon=True).start()


from ishapediting_tpu.utils.device import fetch_scalar as fetch  # noqa: E402


def main():
    _arm_self_deadline()
    t0 = time.time()
    fetch(jax.jit(lambda x: x + 1)(jnp.zeros(8)))
    print(f"session warmup: {time.time() - t0:.1f}s", flush=True)

    from ishapediting_tpu.config import PipelineConfig
    from ishapediting_tpu.edit.engine import DragEngine
    from ishapediting_tpu.edit.fit import latent_to_planes
    from ishapediting_tpu.ops.triplane import decode_grid

    cfg = PipelineConfig()
    # remat=True EXPLICITLY: the engine default flipped to False after this
    # probe's A/B measured remat's 15% drag-wall cost — relying on the
    # default here would silently turn the A/B into remat=False vs False
    engine = DragEngine(cfg, seed=0, remat=True)
    engine._device_march_broken = True  # host mesh path, like the bench
    fetch(engine.unet_params["out.2"]["w"])
    print(f"params ready: {time.time() - t0:.1f}s", flush=True)

    latent = jax.random.normal(
        jax.random.PRNGKey(1), (1,) + cfg.latent_shape, jnp.float32
    )
    # calibrate the decoder bias exactly like bench.py (0.999 quantile —
    # ~0.1% voxels inside, the realistic trained-decoder density bench.py
    # moved to after the r04 pathological-tail finding; this probe's first
    # run predates that and used 0.985)
    planes = latent_to_planes(latent, engine.half_range, engine.middle)
    g = jax.jit(
        lambda d, p: decode_grid(d, p, res=cfg.edit.shape_resolution,
                                 out_dtype=jnp.float16)
    )(engine.decoder_params, planes)
    grid = np.asarray(g).astype(np.float32)
    q = float(np.quantile(grid, 0.999))
    engine.decoder_params = dict(engine.decoder_params)
    engine.decoder_params["dense3"] = {
        "w": engine.decoder_params["dense3"]["w"],
        "b": engine.decoder_params["dense3"]["b"] - q,
    }
    print(f"decoder calibrated: {time.time() - t0:.1f}s", flush=True)

    # --- inversion cold + warm, with attribution -------------------------
    t1 = time.time()
    engine.latent_inversion(latent, seed=2)
    RESULTS["inversion_cold"] = {
        "wall_s": round(time.time() - t1, 2),
        "phase": engine.last_phase_walls,
        "mesh": engine.last_mesh_walls,
    }
    print(f"inversion cold: {RESULTS['inversion_cold']}", flush=True)
    t1 = time.time()
    engine.latent_inversion(latent, seed=3)
    RESULTS["inversion_warm"] = {
        "wall_s": round(time.time() - t1, 2),
        "phase": engine.last_phase_walls,
        "mesh": engine.last_mesh_walls,
    }
    print(f"inversion warm: {RESULTS['inversion_warm']}", flush=True)

    handle = engine.mesh0.vertices[
        np.argmax(engine.mesh0.vertices[:, 0])
    ].astype(np.float32)
    target = handle + np.array([0.15, 0.0, 0.0], np.float32)

    # --- drag with remat=True (A-arm; shipped default is False) ----------
    for tag, eng in (("remat", engine),):
        t1 = time.time()
        eng.drag_edit(handle[None], target[None], seed=4, noise_mode="replay")
        RESULTS[f"drag_{tag}_cold"] = {
            "wall_s": round(time.time() - t1, 2),
            "phase": eng.last_phase_walls,
        }
        print(f"drag {tag} cold: {RESULTS[f'drag_{tag}_cold']}", flush=True)
        t1 = time.time()
        eng.drag_edit(handle[None], target[None], seed=5, noise_mode="replay")
        RESULTS[f"drag_{tag}_warm"] = {
            "wall_s": round(time.time() - t1, 2),
            "phase": eng.last_phase_walls,
            "mesh": eng.last_mesh_walls,
        }
        print(f"drag {tag} warm: {RESULTS[f'drag_{tag}_warm']}", flush=True)

    # --- drag without remat: same params, fresh jit cache ----------------
    eng2 = DragEngine(
        cfg,
        unet_params=engine.unet_params,
        decoder_params=engine.decoder_params,
        remat=False,
    )
    eng2._device_march_broken = True
    # reuse the inversion state (drag consumes w + features + variance_noise)
    eng2.w = engine.w
    eng2.w0 = engine.w0
    eng2.feature_guidance = engine.feature_guidance
    eng2.variances = engine.variances
    eng2.variance_noise = engine.variance_noise
    t1 = time.time()
    eng2.drag_edit(handle[None], target[None], seed=4, noise_mode="replay")
    RESULTS["drag_noremat_cold"] = {
        "wall_s": round(time.time() - t1, 2),
        "phase": eng2.last_phase_walls,
    }
    print(f"drag noremat cold: {RESULTS['drag_noremat_cold']}", flush=True)
    t1 = time.time()
    eng2.drag_edit(handle[None], target[None], seed=5, noise_mode="replay")
    RESULTS["drag_noremat_warm"] = {
        "wall_s": round(time.time() - t1, 2),
        "phase": eng2.last_phase_walls,
    }
    print(f"drag noremat warm: {RESULTS['drag_noremat_warm']}", flush=True)

    print(json.dumps({"walls": RESULTS, "truncated": False}), flush=True)


if __name__ == "__main__":
    main()
