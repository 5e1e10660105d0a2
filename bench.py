"""Benchmark harness — prints ONE JSON line.

Headline metric: unconditional triplane sampling throughput at DDIM-50 on
the published NFD UNet (128^2 latent, 96ch, 256 base channels, learned
sigma), batch 8, bf16 torso — the BASELINE.md north-star configuration
(reference path: generate.py:52-71 + image_sample.py:168-184, respaced to
DDIM-50).

The JSON ``detail`` additionally carries every other BASELINE.md measurable
quantity, measured through the REAL engine product paths at full scale
(``ISHAPE_BENCH_FAST=1`` skips them for quick sampling-only iteration):

- ``edit_wall_s``      — 170-step guided drag (UNet fwd+bwd each step) incl.
                         256^3 decode + marching + smoothing
                         (reference: drag_utils.py:336-399)
- ``fast_edit_wall_s`` — the same drag on a 57-step respaced edit window
                         (framework extension, docs/PERF.md "Fast editing")
- ``inversion_wall_s`` — 170-step edit-friendly DDPM inversion incl. mesh
                         decode (reference: gaussian_diffusion.py:512-532)
- ``fit_wall_s``       — 200-step classifier-guided real-shape fit + the
                         follow-up inversion (reference: drag_utils.py:445-463)
- ``fast_fit_wall_s``  — the same fit on a 50-step respaced chain
                         (framework extension, docs/PERF.md "Fast fitting")
- ``phase_tflops``     — per-phase effective TF/s against the 141 TF/s
                         measured matmul ceiling (docs/PERF.md)
- ``mesh_tail_*``      — device-side marching tetrahedra (grid stays in
                         HBM, two-round-trip packed payload fetch) vs the
                         host path (33 MB fp16 grid fetch + native marching)
                         isolated on a smooth sphere; the engine walls run
                         the product auto-select (device off-CPU, overflow
                         fallback to host — ``*_mesh_walls.impl`` says which)
- ``quality``          — BASELINE.md quantity (d): inversion-replay
                         Chamfer/IoU, guided-drag motion-loss reduction,
                         edit locality IoU — measured on the committed
                         known-good toy instance by tools/bench_quality.py
                         in a CPU subprocess (where its recorded numbers
                         were validated; reference: meshProcess.py:18-105)

Random weights (no assets in this environment) time identically to trained
ones for every device path; to keep the HOST decode path honest too (random
decoders produce noise fields that marching would explode on), the decoder's
output bias is shifted so ~0.1%% of voxels are positive — matching the
active-cell density trained decoders produce (same density as the
bench_mesh_tail realistic surface).

``vs_baseline``: ratio to an estimated A100 PyTorch-fp16 eager reference.
The reference repo publishes no numbers (BASELINE.md), so the estimate is
analytic and every input is printed in the JSON ``detail`` for audit:

- model FLOPs: computed from the layer layout (convs + attention matmuls).
- A100 effective throughput: 312 TF/s dense-fp16 peak x an assumed
  end-to-end MFU for an eager PyTorch conv-UNet at batch 8. Public anchor:
  the Stable Diffusion 1.5 UNet (a same-family conv+attention UNet, ~0.34
  TFLOP/fwd at 64^2 latent) in eager fp16 on A100 at batch >= 8 is widely
  benchmarked around 0.04-0.05 s/step for 8 samples => ~55-68 TF/s => ~20%
  MFU (HuggingFace diffusers performance docs). Pure-conv layers can do
  better, so we score against 25% MFU (midpoint of a [20%, 35%] band) and
  report the band edges so the claim can be rescored either way. Round 1
  used the optimistic 35% edge; ``vs_baseline_35mfu`` keeps that continuity.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from ishapediting_tpu.config import UNetConfig
from ishapediting_tpu.core.diffusion import ddim_sample_loop
from ishapediting_tpu.core.schedule import make_schedule
from ishapediting_tpu.models.unet import build_layout, init_unet_params, unet_apply

BATCH = 8
DDIM_STEPS = 50


def unet_flops_per_sample(cfg: UNetConfig) -> float:
    """Analytic forward FLOPs (convs + attention matmuls) for one latent."""
    layout = build_layout(cfg)
    flops = 0.0
    size = cfg.image_size

    def conv_f(k, cin, cout, s):
        return 2.0 * k * k * cin * cout * s * s

    def walk(blocks, size):
        nonlocal flops
        for block in blocks:
            for l in block:
                if l.kind == "conv":
                    flops += conv_f(3, l.in_ch, l.out_ch, size)
                elif l.kind == "res":
                    s_in = size
                    if l.updown == "down":
                        size //= 2
                    elif l.updown == "up":
                        size *= 2
                    flops += conv_f(3, l.in_ch, l.out_ch, size)  # in_conv
                    flops += conv_f(3, l.out_ch, l.out_ch, size)  # out_conv
                    if l.in_ch != l.out_ch:
                        flops += conv_f(1, l.in_ch, l.out_ch, size)
                    flops += 2.0 * (4 * cfg.model_channels) * 2 * l.out_ch
                elif l.kind == "attn":
                    t = size * size
                    c = l.in_ch
                    flops += 2.0 * c * 3 * c * t  # qkv
                    flops += 2.0 * 2.0 * t * t * c  # logits + weighted sum
                    flops += 2.0 * c * c * t  # proj
                elif l.kind == "downsample":
                    size //= 2
                    flops += conv_f(3, l.in_ch, l.out_ch, size)
                elif l.kind == "upsample":
                    size *= 2
                    flops += conv_f(3, l.in_ch, l.out_ch, size)
        return size

    size = walk(layout.input_blocks, size)
    size = walk((layout.middle_block,), size)
    size = walk(layout.output_blocks, size)
    flops += conv_f(3, layout.out_ch_final, cfg.out_channels, cfg.image_size)
    return flops


def _resolved_conv_impl() -> str:
    from ishapediting_tpu.ops.nn import _conv_impl

    import os

    choice = os.environ.get("ISHAPE_CONV_IMPL", "auto")
    return f"{choice}({_conv_impl()})" if choice == "auto" else choice


# block_until_ready does not block on the tunnel backend; a scalar fetch
# drains the in-order device stream (shared idiom: utils/device.py)
from ishapediting_tpu.utils.device import fetch_scalar as _fetch_scalar


def bench_product_paths(flops_fwd: float, ceiling_tflops: float = 141.0,
                        cfg=None, remat: bool = False, deadline: float = None):
    """Fail-soft wrapper: a mid-bench failure (e.g. the tunnel dying after
    the headline sampling metric was already measured) must not lose the
    whole JSON line — return whatever was measured plus ``product_error``."""
    out = {}
    try:
        _bench_product_paths(
            out, flops_fwd, ceiling_tflops, cfg, remat, deadline
        )
    except Exception as exc:  # pragma: no cover - exercised via monkeypatch
        out["product_error"] = f"{type(exc).__name__}: {exc}"[:300]
    return out


def _bench_product_paths(out, flops_fwd: float, ceiling_tflops: float = 141.0,
                         cfg=None, remat: bool = False, deadline: float = None):
    """Time the real engine edit/inversion/fit paths at full scale.

    Mutates ``out`` in place (partial results survive an exception in the
    wrapper above): wall-clocks + a per-phase effective-TF/s table vs the
    measured matmul ceiling. Random weights time identically to trained ones
    on every device path; the decoder bias is shifted post-init so the host
    decode path (fetch + marching + smoothing) sees a realistic surface.

    ``cfg`` defaults to the published full-scale pipeline; tests inject the
    tiny preset to exercise this exact code path on CPU.

    ``deadline`` (absolute ``time.perf_counter()`` value): a soft budget —
    checked between phases; when exceeded, the remaining phases are skipped
    and the partial dict carries ``product_truncated``. This protects the
    driver-captured BENCH record: a hard external timeout mid-bench would
    lose the whole JSON line, a truncated product block loses only the tail
    phases (compiles on a cold backend can take minutes each).
    """
    import tempfile

    from ishapediting_tpu.config import PipelineConfig
    from ishapediting_tpu.edit.engine import DragEngine
    from ishapediting_tpu.ops.triplane import decode_grid
    from ishapediting_tpu.edit.fit import latent_to_planes

    if cfg is None:
        cfg = PipelineConfig()  # 200-step respacing, w_time=170, 256^3 decode
    engine = DragEngine(cfg, seed=0, remat=remat)
    # The engine walls run the engine's own mesh-path auto-select (device
    # marching off-CPU, with the capacity-overflow fallback to host). At the
    # 0.1%-inside calibration below the fragmented field's triangle count
    # fits the device capacities, so this measures the real product default;
    # if a pathological draw overflows, the engine's fallback keeps the
    # walls honest and ``*_mesh_walls.impl`` in the detail says which path
    # ran. The device-vs-host tail is additionally isolated on a smooth
    # sphere below (``mesh_tail_*``).
    latent = jax.random.normal(
        jax.random.PRNGKey(1), (1,) + cfg.latent_shape, jnp.float32
    )

    # --- decode: device-only timing, then calibrate the surface ----------
    planes = latent_to_planes(latent, engine.half_range, engine.middle)
    dec_fn = jax.jit(
        lambda d, p: decode_grid(d, p, res=cfg.edit.shape_resolution,
                                 out_dtype=jnp.float16)
    )
    # warm the EXACT fetch chain used by the timed call: the eager
    # slice+sum programs compile per distinct slice shape, and on the
    # tunneled backend those tiny compiles cost ~1-2 s — timed with a
    # different warmup slice they masquerade as decode time (measured:
    # 2.26 s first rep vs 0.054 s after, tools/probe logs r04)
    g = dec_fn(engine.decoder_params, planes)
    _fetch_scalar(g[:1, :1, :1])
    t0 = time.perf_counter()
    g = dec_fn(engine.decoder_params, planes)
    _fetch_scalar(g[:1, :1, :1])
    decode_device_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    grid = np.asarray(g).astype(np.float32)
    fetch_s = time.perf_counter() - t0
    # shift the decoder output bias so ~1.5% of voxels are inside — a
    # compact surface with a realistic marching load
    # 0.1% of voxels inside matches the active-cell density of trained
    # decoders (bench_mesh_tail's realistic surface, and the reference's
    # shipped checkpoints): at the former 1.5% the fragmented random field
    # welded to 3.38M verts — ~14x any real product mesh — and the walls
    # were ~75% host mesh tail (probe_walls r04, docs/PERF.md)
    q = float(np.quantile(grid, 0.999))
    engine.decoder_params = dict(engine.decoder_params)
    engine.decoder_params["dense3"] = {
        "w": engine.decoder_params["dense3"]["w"],
        "b": engine.decoder_params["dense3"]["b"] - q,
    }

    out.update(
        decode_device_s=round(decode_device_s, 3),
        grid_fetch_s=round(fetch_s, 2),
    )
    phase_tflops = {
        "ceiling_measured_matmul": ceiling_tflops,
        "decode_grid": round(_decode_flops(cfg) / decode_device_s / 1e12, 1),
    }
    # registered up front: the dict is mutated in place below, so partial
    # phase numbers survive a mid-bench failure too
    out["phase_tflops"] = phase_tflops
    n_steps = engine.sched.num_timesteps  # 200
    w_time = cfg.edit.w_time  # 170

    def over(phase: str) -> bool:
        if deadline is not None and time.perf_counter() > deadline:
            out["product_truncated"] = phase
            out["phase_tflops"] = phase_tflops
            return True
        return False

    # --- inversion (incl. mesh decode), cold + warm ----------------------
    if over("inversion"):
        return
    t0 = time.perf_counter()
    engine.latent_inversion(latent, seed=2)
    out["inversion_wall_cold_s"] = round(time.perf_counter() - t0, 2)
    # settle the adaptive march capacity: the first mesh above ran at the
    # default rung and recorded the surface's true counts; this untimed call
    # compiles the right-size rung (ops/marching.py::capacity_ladder) so the
    # warm walls below measure the settled program, not its one-time compile
    t0 = time.perf_counter()
    engine.get_mesh(latent)
    out["march_settle_s"] = round(time.perf_counter() - t0, 2)
    out["march_settle_walls"] = engine.last_mesh_walls
    t0 = time.perf_counter()
    engine.latent_inversion(latent, seed=3)
    inversion_wall = time.perf_counter() - t0
    out["inversion_wall_s"] = round(inversion_wall, 2)
    # engine-attributed sub-phases (device scan vs mesh tail): explains the
    # wall without guessing — see docs/PERF.md "Current headline numbers"
    out["inversion_phase_walls"] = engine.last_phase_walls
    out["inversion_mesh_walls"] = engine.last_mesh_walls
    mesh0 = engine.mesh0
    n_verts = len(mesh0.vertices)
    out["mesh_verts"] = int(n_verts)

    # --- drag edit: 170 guided fwd+bwd steps (incl. mesh decode) ---------
    if over("drag"):
        return
    if n_verts:
        handle = mesh0.vertices[np.argmax(mesh0.vertices[:, 0])].astype(
            np.float32
        )
    else:  # pragma: no cover - calibration guarantees a surface
        handle = np.array([0.3, 0.0, 0.0], np.float32)
    target = handle + np.array([0.15, 0.0, 0.0], np.float32)
    t0 = time.perf_counter()
    engine.drag_edit(handle[None], target[None], seed=4, noise_mode="replay")
    out["edit_wall_cold_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    engine.drag_edit(handle[None], target[None], seed=5, noise_mode="replay")
    edit_wall = time.perf_counter() - t0
    out["edit_wall_s"] = round(edit_wall, 2)
    out["edit_phase_walls"] = engine.last_phase_walls
    out["edit_mesh_walls"] = engine.last_mesh_walls

    # --- mesh-only wall (shared tail of both paths above) ----------------
    t0 = time.perf_counter()
    engine.get_mesh(latent)
    mesh_wall = time.perf_counter() - t0
    out["mesh_decode_wall_s"] = round(mesh_wall, 2)
    # drag/fit steps run fwd+bwd through the UNet (~3x fwd FLOPs); the
    # inversion backward is 170 independent forwards. Device time comes
    # from the engine's own phase attribution (device scan wall with a
    # completion barrier, mesh tail excluded) rather than subtracting the
    # separately-measured mesh wall — the tail varies run to run.
    drag_dev = (out.get("edit_phase_walls") or {}).get(
        "device_s", max(edit_wall - mesh_wall, 1e-6)
    )
    inv_dev = (out.get("inversion_phase_walls") or {}).get(
        "device_s", max(inversion_wall - mesh_wall, 1e-6)
    )
    phase_tflops["drag_step"] = round(
        3.0 * flops_fwd * w_time / max(drag_dev, 1e-6) / 1e12, 1
    )
    phase_tflops["inversion"] = round(
        flops_fwd * w_time / max(inv_dev, 1e-6) / 1e12, 1
    )

    # --- real-shape fit: 200 guided steps + follow-up inversion ----------
    if over("fit"):
        return
    with tempfile.TemporaryDirectory() as tmp:
        t0 = time.perf_counter()
        engine.fit_real_shape(mesh=mesh0, center_mesh=False, path=tmp, seed=6)
        out["fit_wall_cold_s"] = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        engine.fit_real_shape(mesh=mesh0, center_mesh=False, path=tmp, seed=7)
        fit_wall = time.perf_counter() - t0
    out["fit_wall_s"] = round(fit_wall, 2)
    out["fit_phase_walls"] = engine.last_phase_walls
    # fit decodes a DIFFERENT surface than the edit/inversion latents (its
    # own counts/rung) — record its mesh walls so a fit mesh_s outlier is
    # attributable (r04m: 11.9 s with no trace of why)
    out["fit_mesh_walls"] = engine.last_mesh_walls
    fit_dev = (out.get("fit_phase_walls") or {}).get(
        "guided_s", max(fit_wall - inversion_wall, 1e-6)
    )
    phase_tflops["fit_step"] = round(
        3.0 * flops_fwd * n_steps / max(fit_dev, 1e-6) / 1e12, 1
    )

    # --- fast edit: the same drag on a 57-step respaced window -----------
    # (framework extension, docs/PERF.md "Fast editing"; resample-only.
    # After fit on purpose: the BASELINE.md quantities land first under a
    # tight budget; fit's follow-up inversion re-cached w/features, so the
    # walk's compute shape is identical)
    if over("fast_edit"):
        return
    fast_steps = max(2, min(57, w_time - 1))
    t0 = time.perf_counter()
    engine.drag_edit(
        handle[None], target[None], seed=4, noise_mode="resample",
        edit_steps=fast_steps,
    )
    out["fast_edit_wall_cold_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    engine.drag_edit(
        handle[None], target[None], seed=5, noise_mode="resample",
        edit_steps=fast_steps,
    )
    out["fast_edit_wall_s"] = round(time.perf_counter() - t0, 2)
    out["fast_edit_steps"] = fast_steps
    out["fast_edit_phase_walls"] = engine.last_phase_walls

    # --- fast fit: the same real-shape fit on a 50-step respaced chain ---
    # (framework extension, docs/PERF.md "Fast fitting")
    if over("fast_fit"):
        return
    fast_fit_steps = max(2, min(50, engine.sched.num_timesteps - 1))
    with tempfile.TemporaryDirectory() as tmp:
        t0 = time.perf_counter()
        engine.fit_real_shape(
            mesh=mesh0, center_mesh=False, path=tmp, seed=8,
            fit_steps=fast_fit_steps,
        )
        out["fast_fit_wall_cold_s"] = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        engine.fit_real_shape(
            mesh=mesh0, center_mesh=False, path=tmp, seed=9,
            fit_steps=fast_fit_steps,
        )
        out["fast_fit_wall_s"] = round(time.perf_counter() - t0, 2)
    out["fast_fit_steps"] = fast_fit_steps
    out["fast_fit_phase_walls"] = engine.last_phase_walls

    out["phase_tflops"] = phase_tflops
    if over("mesh_tail"):
        return
    out.update(bench_mesh_tail(cfg.edit.shape_resolution))
    return


def bench_mesh_tail(res: int) -> dict:
    """Device vs host mesh tail (marching + payload transfer) on a REALISTIC
    surface — a sphere SDF whose active-cell count (~0.1% of cells) matches
    what trained decoders produce. The engine walls above run the host path
    because the random-weight field is fragmented beyond any realistic
    marching capacity; this is the honest measurement of what
    ``DragEngine._decode_mesh_device`` saves real users (docs/PERF.md
    "Round 3 removes the grid fetch entirely")."""
    from ishapediting_tpu.geometry.marching import grid_to_mesh
    from ishapediting_tpu.ops.marching import (
        assemble_mesh,
        default_capacities,
        fetch_rows,
        march_counts,
        marching_tets_device,
        pack_march_output,
        unpack_march_payload,
    )

    max_cells, max_tris = default_capacities(res)

    # The grid is a jit ARGUMENT, not a closed-over constant: a nullary
    # program invites XLA to constant-fold the whole SDF+marching subgraph
    # (timing nothing) and bakes a res^3 constant into the executable — the
    # same big-constant hazard CLAUDE.md flags for closed-over params.
    c = jnp.linspace(-1.0, 1.0, res)
    x, y, z = jnp.meshgrid(c, c, c, indexing="ij")
    grid = 0.4 - jnp.sqrt(x * x + y * y + z * z)

    march = jax.jit(
        lambda g: pack_march_output(
            marching_tets_device(
                g, 0.0, max_cells=max_cells, max_tris=max_tris
            )
        )
    )
    # warm run: compile + learn counts, AND warm the exact quantized fetch
    # slice the timed run uses (distinct slice shapes compile their own
    # fetch programs on the tunnel — CLAUDE.md / docs/PERF.md)
    warm = march(grid)
    n_cells, n_tris = march_counts(np.asarray(warm[:1]))
    if n_cells > max_cells or n_tris > max_tris:
        # the payload buffers are truncated past capacity; a partial mesh
        # would silently misreport the tail metrics (ops/marching.py:
        # "overflow ... never truncates")
        return {"mesh_tail_overflow": f"cells={n_cells} tris={n_tris}"}
    spec = fetch_rows(n_tris, max_tris)
    np.asarray(warm[:spec])
    t0 = time.perf_counter()
    out = march(grid)
    # hint-warm consume: counts + triangles in ONE quantized round trip
    slab = np.asarray(out[:spec])
    n_cells, n_tris = march_counts(slab)
    keys, tvals = unpack_march_payload(slab[1 : n_tris + 1])
    mesh_dev = assemble_mesh(keys, tvals, res)
    device_s = time.perf_counter() - t0

    grid_fn = jax.jit(lambda g: g.astype(jnp.float16))
    _fetch_scalar(grid_fn(grid)[:1, :1, :1])  # warm
    t0 = time.perf_counter()
    mesh_host = grid_to_mesh(
        np.asarray(grid_fn(grid)).astype(np.float32), iso=0.0, to_unit=True
    )
    host_s = time.perf_counter() - t0
    # count both sides POST-assembly (assemble_mesh/grid_to_mesh each drop
    # degenerate triangles; the raw payload count would not be comparable)
    return {
        "mesh_tail_device_s": round(device_s, 3),
        "mesh_tail_host_s": round(host_s, 3),
        "mesh_tail_tris": int(len(mesh_dev.triangles)),
        "mesh_tail_tris_host": int(len(mesh_host.triangles)),
    }


def bench_quality_subprocess(timeout_s: float = 1500.0) -> dict:
    """Run tools/bench_quality.py on CPU in a subprocess and return its JSON
    under ``quality`` (or the failure under ``quality_error``). A subprocess
    keeps the chip session clean — only one process may hold the tunnel
    chip, and mixing CPU jax.config flips into the bench process is fragile
    (docs/PERF.md)."""
    import os
    import subprocess
    import sys

    script = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "tools", "bench_quality.py"
    )
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"  # the script also forces cpu via jax.config
    try:
        r = subprocess.run(
            [sys.executable, script],
            capture_output=True,
            text=True,
            timeout=timeout_s,
            env=env,
        )
        if r.returncode != 0:
            tail = (r.stderr or r.stdout).strip().splitlines()[-1:]
            return {"quality_error": f"rc={r.returncode}: {' '.join(tail)}"[:300]}
        return {"quality": json.loads(r.stdout.strip().splitlines()[-1])}
    except Exception as e:  # pragma: no cover - defensive: never cost BENCH
        return {"quality_error": f"{type(e).__name__}: {e}"[:300]}


def _decode_flops(cfg) -> float:
    """MLP-head FLOPs of one dense 256^3 decode (ops/triplane.py: the
    per-voxel cost is sin/cos + 128-128-1 MLP; plane resize + Fourier
    projection are per-pixel, negligible)."""
    res = cfg.edit.shape_resolution
    mapping, hidden = 64, 128
    per_voxel = 2.0 * (2 * mapping) * hidden + 2.0 * hidden * hidden + 2.0 * hidden
    return per_voxel * res**3


# set once the first device fetch completes; the __main__ watchdog re-execs
# the process if backend init wedges in a futex hang instead of raising
# (docs/PERF.md: a killed client can wedge the next one; retry recovers)
import threading

_DEVICE_ALIVE = threading.Event()
# set once ANY bench JSON line (real or degraded) has been printed
_JSON_EMITTED = threading.Event()
# headline measurements registered as they land, so a degraded emission
# mid-run still carries everything measured so far (VERDICT r3 next-item 1b)
_PARTIAL = {}


def _emit_degraded(reason: str, final: bool = True) -> None:
    """Print a well-formed BENCH JSON line even though the bench could not
    finish. The driver captures this process's stdout ONCE per round under
    an external timeout; round 3 produced rc=124 with no JSON at all
    (parsed=null) because every recovery path re-exec'd without printing.
    Any already-measured values ride along (the headline survives a
    mid-product hang).

    ``final=False`` marks an INTERIM emission (e.g. the probe-retry notice
    while the run is still going to try for a real record): it must NOT set
    ``_JSON_EMITTED``, or the deadline guard would treat the null-value
    interim line as "record already safe" and stop guaranteeing the
    self-exit — a later mid-product hang would then run into the driver's
    external kill, the exact client-kill that wedges the tunnel."""
    print(
        json.dumps(
            {
                "metric": "triplane_samples_per_sec_ddim50",
                "value": _PARTIAL.get("value"),
                "unit": "samples/s/chip",
                "vs_baseline": _PARTIAL.get("vs_baseline"),
                "error": str(reason)[:300],
                "detail": dict(_PARTIAL.get("detail", {})),
            }
        ),
        flush=True,
    )
    if final:
        _JSON_EMITTED.set()


def _global_budget() -> tuple:
    """(epoch0, budget_s): wall-clock start of the FIRST attempt (carried
    across re-execs via ISHAPE_BENCH_EPOCH0) and the total process-tree
    budget. Default 1380 s (23 min) — comfortably inside the ~30 min driver
    capture window observed in BENCH_r03 (02:44:37 start, killed before
    03:14)."""
    import os

    epoch0 = float(os.environ.get("ISHAPE_BENCH_EPOCH0", time.time()))
    budget = float(os.environ.get("ISHAPE_BENCH_BUDGET_S", "1380"))
    return epoch0, budget


def _global_remaining() -> float:
    epoch0, budget = _global_budget()
    return epoch0 + budget - time.time()


_PROBE_SRC = """\
import os, threading, time
def _bail():
    time.sleep({deadline})
    os._exit(7)
threading.Thread(target=_bail, daemon=True).start()
import jax
# honor the env platform choice explicitly: the tunnel plugin's .pth hook
# overrides JAX_PLATFORMS, so env alone does not pin the backend
# (docs/PERF.md / CLAUDE.md)
_p = os.environ.get("JAX_PLATFORMS")
if _p:
    jax.config.update("jax_platforms", _p)
import jax.numpy as jnp, numpy as np
print(float(np.asarray(jnp.sum(jax.jit(lambda x: x + 1)(jnp.zeros(4))))))
"""


def _probe_tunnel(deadline_s: float) -> bool:
    """Cheap liveness probe of the default backend in a SUBPROCESS before
    the heavy init (VERDICT r3 next-item 1b). The child self-exits via a
    timer thread rather than being killed on timeout: a killed tunnel
    client can wedge the server for the next one (docs/PERF.md), which is
    exactly the failure this probe exists to detect. A clean success exits
    normally (graceful PJRT shutdown)."""
    import os
    import subprocess
    import sys
    import tempfile

    # NEVER kill the child on lateness (subprocess.run(timeout=...) would):
    # under heavy load the child's interpreter startup can be slow enough
    # that its self-exit timer — armed relative to ITS start — fires after
    # the parent's window, and a SIGKILLed live chip client wedges the
    # tunnel for hours (CLAUDE.md). A late child is ABANDONED instead; its
    # daemon timer guarantees it exits on its own.
    with tempfile.TemporaryFile(mode="w+") as errf:
        child = subprocess.Popen(
            [sys.executable, "-c", _PROBE_SRC.format(deadline=deadline_s)],
            stdout=subprocess.DEVNULL,
            stderr=errf,
            text=True,
            env=dict(os.environ),
        )
        t0 = time.time()
        grace = 60.0  # startup slack on top of the child's own deadline
        while time.time() - t0 < deadline_s + grace:
            if child.poll() is not None:
                break
            time.sleep(1.0)
        rc = child.poll()
        if rc is None:
            print(
                f"[bench] tunnel probe still running after "
                f"{deadline_s + grace:.0f}s; abandoning it (self-exits via "
                "its daemon timer)",
                file=sys.stderr,
                flush=True,
            )
            return False
        if rc != 0:
            errf.seek(0)
            tail = errf.read().strip().splitlines()[-1:]
            print(
                f"[bench] tunnel probe failed rc={rc}: "
                f"{' '.join(tail)[:200]}",
                file=sys.stderr,
                flush=True,
            )
        return rc == 0


def main():
    import os

    # honor an explicit JAX_PLATFORMS=cpu: the tunnel plugin's .pth hook
    # overrides the env var at interpreter start, so pin via jax.config
    # before the first backend touch (docs/PERF.md / CLAUDE.md)
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    detail = {}
    _PARTIAL["detail"] = detail
    # Persistent compile cache — but NOT on the axon tunnel runtime, where
    # cache serialization of the large programs is measured ACTIVELY harmful
    # (init 7.8 s -> 171.7 s with the cache dir set; docs/PERF.md
    # "Runtime update"). Real TPU/CPU backends benefit normally.
    from ishapediting_tpu.ops.pallas_kernels import axon_runtime

    if not axon_runtime():
        try:
            # host-keyed: XLA:CPU AOT entries from a different machine type
            # can SIGILL (see __graft_entry__._cpu_cache_dir)
            from __graft_entry__ import _cpu_cache_dir

            jax.config.update("jax_compilation_cache_dir", _cpu_cache_dir())
        except Exception:
            pass
    cfg = UNetConfig()  # published model, bf16 torso
    sched = make_schedule(1000, "linear", f"ddim{DDIM_STEPS}")

    # The tunnel backend charges a large one-time per-session penalty to the
    # FIRST compile regardless of program size (measured: a trivial 250-slice
    # program 472 s as first program, a 2000-slice one 4 s right after —
    # docs/PERF.md "Runtime update"). Absorb it here so param_init_s /
    # compile_s report the real program costs.
    t0 = time.perf_counter()
    float(np.asarray(jnp.sum(jax.jit(lambda x: x + 1)(jnp.zeros(8)))))
    warmup_s = time.perf_counter() - t0
    _DEVICE_ALIVE.set()  # backend is live; disarm the wedge watchdog

    t0 = time.perf_counter()
    params = init_unet_params(jax.random.PRNGKey(0), cfg)
    # init dispatches ~2k small RNG ops; force completion so compile_s below
    # measures compilation + one run, not param materialization. The device
    # stream is in-order, so fetching the last-enqueued tensor drains it
    # (block_until_ready does not block on this backend — docs/PERF.md).
    float(np.asarray(jnp.sum(params["out.2"]["w"])))
    init_s = time.perf_counter() - t0

    # params MUST be a jit argument: closing over them bakes 421M constants
    # into the jaxpr and explodes compile time on some backends.
    def loop(params, x, r):
        model_fn = lambda a, b: unet_apply(cfg, params, a, b)
        return ddim_sample_loop(sched, model_fn, x, r)

    fn = jax.jit(loop)
    x_T = jax.random.normal(jax.random.PRNGKey(1), (BATCH, 128, 128, 96), jnp.float32)

    # warmup / compile; force completion with a scalar fetch (some PJRT
    # backends do not block in block_until_ready)
    t0 = time.perf_counter()
    out = fn(params, x_T, jax.random.PRNGKey(2))
    float(np.asarray(jnp.sum(out)))
    compile_s = time.perf_counter() - t0

    import os

    trace_dir = os.environ.get("ISHAPE_TRACE")
    if trace_dir:
        jax.profiler.start_trace(trace_dir)
    times = []
    for i in range(5):
        t0 = time.perf_counter()
        out = fn(params, x_T, jax.random.PRNGKey(3 + i))
        float(np.asarray(jnp.sum(out)))
        times.append(time.perf_counter() - t0)
    if trace_dir:
        jax.profiler.stop_trace()
    assert np.isfinite(np.asarray(out)).all()
    best = min(times)
    median = sorted(times)[len(times) // 2]
    samples_per_sec = BATCH / best

    flops_fwd = unet_flops_per_sample(cfg)
    chip_tflops_eff = flops_fwd * DDIM_STEPS * BATCH / best / 1e12

    # A100 eager-PyTorch fp16 estimate (see module docstring for derivation)
    a100_peak = 312e12
    mfu_band = (0.20, 0.35)  # [SD-anchored eager, optimistic conv-only]
    mfu = 0.25
    a100_samples_per_sec = a100_peak * mfu / (flops_fwd * DDIM_STEPS)
    a100_optimistic = a100_peak * mfu_band[1] / (flops_fwd * DDIM_STEPS)

    # register the headline the moment it exists: a later hang (dpm/product
    # phases) degrades the record instead of losing it
    detail.update(
        batch=BATCH,
        session_warmup_s=round(warmup_s, 1),
        compile_s=round(compile_s, 1),
        param_init_s=round(init_s, 1),
        wall_s_per_batch=round(best, 4),
        wall_s_per_batch_median=round(median, 4),
        chip_tflops_effective=round(chip_tflops_eff, 1),
        unet_tflops_fwd_per_sample=round(flops_fwd / 1e12, 3),
        conv_impl=_resolved_conv_impl(),
        a100_baseline={
            "peak_fp16_tflops": 312,
            "assumed_mfu": mfu,
            "mfu_band": list(mfu_band),
            "anchor": "SD1.5 UNet eager fp16 A100 batch>=8 "
            "~20% MFU (diffusers perf docs)",
            "est_samples_per_sec": round(a100_samples_per_sec, 4),
        },
        vs_baseline_35mfu=round(samples_per_sec / a100_optimistic, 3),
        device=str(jax.devices()[0]),
    )
    _PARTIAL["value"] = round(samples_per_sec, 4)
    _PARTIAL["vs_baseline"] = round(samples_per_sec / a100_samples_per_sec, 3)

    # DPM-Solver++(2M) at 25 steps: on both measured models (the analytic-
    # posterior toy and the committed toy checkpoint) this sampler is MORE
    # accurate than DDIM-50 against the dense-step solution (order 2 vs 1 —
    # tests/test_dpm_solver.py, docs/PERF.md), so its throughput is the
    # framework's honest samples/s at >= headline quality THERE; published-
    # scale quality is unvalidated (no released checkpoints in this env).
    # Kept in detail; the headline stays DDIM-50 for baseline comparability.
    from ishapediting_tpu.core.diffusion import dpm_solver_sample_loop

    try:
        # log-SNR-uniform grid (schedule.py::lambda_uniform_timesteps):
        # measured a further 1.4x more accurate for the solver than the
        # ddim grid at 25 steps on the toy checkpoint (docs/PERF.md).
        # 16 steps also holds mesh parity (quality.solver.mesh: cd 1.7e-05
        # vs ddim50 4.5e-05) — measure it too so the fewer-step claim is
        # a chip measurement, not a 25/16 extrapolation.
        for dpm_steps in (25, 16):
            sched_dpm = make_schedule(1000, "linear", f"dpm{dpm_steps}")

            def loop_dpm(params, x, s=sched_dpm):
                model_fn = lambda a, b: unet_apply(cfg, params, a, b)
                return dpm_solver_sample_loop(s, model_fn, x)

            fn_dpm = jax.jit(loop_dpm)
            t0 = time.perf_counter()
            out_dpm = fn_dpm(params, x_T)
            float(np.asarray(jnp.sum(out_dpm)))
            dpm_compile_s = time.perf_counter() - t0
            dpm_times = []
            for _ in range(3):
                t0 = time.perf_counter()
                out_dpm = fn_dpm(params, x_T)
                float(np.asarray(jnp.sum(out_dpm)))
                dpm_times.append(time.perf_counter() - t0)
            assert np.isfinite(np.asarray(out_dpm)).all()
            k = f"dpm{dpm_steps}"
            detail.update({
                f"{k}_samples_per_sec": round(BATCH / min(dpm_times), 4),
                f"{k}_compile_s": round(dpm_compile_s, 1),
                # duplicate-snap collapse can realize fewer steps than
                # requested near the base count
                # (core/schedule.py:lambda_uniform_timesteps)
                f"{k}_realized_steps": int(sched_dpm.num_timesteps),
            })
        detail["dpm_note"] = (
            "DPM-Solver++(2M): 25 AND 16 steps both beat DDIM-50 at MESH "
            "level on the toy checkpoint (CD to the dense-ODE surface "
            "1.5e-05/1.7e-05 vs 4.5e-05, IoU 0.93/0.92 vs 0.80 — "
            "quality.solver.mesh, gated by tests/test_solver_quality.py) "
            "and in latent RMS on both measured models — samples/s at >= "
            "headline quality there"
        )
    except Exception as exc:  # never cost the headline JSON line
        detail["dpm_error"] = f"{type(exc).__name__}: {exc}"[:300]

    # BASELINE.md's other measurable quantities, through the real engine
    # paths (ISHAPE_BENCH_FAST=1 skips for quick sampling-only iteration)
    if not os.environ.get("ISHAPE_BENCH_FAST"):
        # Soft wall-clock budget for the WHOLE bench process TREE across
        # re-execs (_global_budget): the driver captures stdout under an
        # external timeout we don't control, and a hard kill mid-product
        # would lose the phase table. Phases that don't fit are skipped
        # (``product_truncated`` names the first one); 60 s reserve keeps
        # the final print inside the window.
        remaining = _global_remaining()
        deadline = time.perf_counter() + remaining - 60.0
        detail.update(bench_product_paths(flops_fwd, deadline=deadline))
        remaining = deadline - time.perf_counter()
        if remaining > 60:
            detail.update(
                bench_quality_subprocess(timeout_s=min(900.0, remaining))
            )
        else:
            detail["quality_error"] = "skipped: bench budget exhausted"

    print(
        json.dumps(
            {
                "metric": "triplane_samples_per_sec_ddim50",
                "value": round(samples_per_sec, 4),
                "unit": "samples/s/chip",
                "vs_baseline": round(samples_per_sec / a100_samples_per_sec, 3),
                "detail": detail,
            }
        ),
        flush=True,
    )
    _JSON_EMITTED.set()


def _backend_unavailable(exc: BaseException) -> bool:
    """True iff ``exc`` is the tunnel-backend init failure (wedged/restarting
    server), NOT a program error. Signature observed when a killed client
    wedges the server or the tunnel restarts (docs/PERF.md "Runtime update"):
    ``RuntimeError: Unable to initialize backend 'axon': UNAVAILABLE: TPU
    backend setup/compile error``."""
    msg = str(exc)
    return "Unable to initialize backend" in msg or (
        "UNAVAILABLE" in msg and "backend" in msg.lower()
    )


_MAX_ATTEMPTS = 2  # total processes, incl. the first (VERDICT r3: 2 attempts)


def _guarded_main():
    """Run main() such that a BENCH JSON line ALWAYS lands on stdout inside
    the driver's capture window, even if the tunnel is wedged all round
    (VERDICT r3 next-item 1b). Layers, outermost first:

    1. Global budget (default 1380 s across ALL re-execs, ISHAPE_BENCH_EPOCH0
       carries the first attempt's start): a guard thread emits a degraded
       JSON line and exits just before it expires.
    2. Tunnel liveness probe in a self-timing subprocess BEFORE the heavy
       init; a dead probe emits a degraded line, waits, retries once, and
       exits 0 — never initializing a backend this process would hang in.
    3. Wedge watchdog (600 s): if the first device fetch hasn't completed,
       emit a degraded line and re-exec once (fresh PJRT client; execv
       replaces the stuck main thread too).
    4. Backend-outage exceptions: emit a degraded line, re-exec once.
    Program errors emit a degraded line carrying the error and re-raise.
    """
    import os
    import sys

    attempt = int(os.environ.get("ISHAPE_BENCH_ATTEMPT", "0"))
    os.environ.setdefault("ISHAPE_BENCH_EPOCH0", f"{time.time():.1f}")

    def _reexec(wait: float, why: str) -> None:
        _emit_degraded(f"{why} (attempt {attempt + 1}/{_MAX_ATTEMPTS})")
        print(
            f"[bench] {why} (attempt {attempt + 1}/{_MAX_ATTEMPTS}); "
            f"re-exec in {wait:.0f}s",
            file=sys.stderr,
            flush=True,
        )
        time.sleep(wait)
        os.environ["ISHAPE_BENCH_ATTEMPT"] = str(attempt + 1)
        os.execv(sys.executable, [sys.executable] + sys.argv)

    def _bail(why: str) -> None:
        _emit_degraded(why)
        print(f"[bench] {why}; exiting", file=sys.stderr, flush=True)
        os._exit(0)  # degraded JSON printed — rc 0 so nothing truncates it

    # Layer 1: global-deadline guard — the LAST line of defense. Whatever
    # else hangs, a JSON line lands ~45 s before the budget expires.
    def _deadline_guard() -> None:
        while True:
            remaining = _global_remaining()
            if remaining <= 45.0:
                break
            time.sleep(min(remaining - 45.0, 30.0))
        if _JSON_EMITTED.is_set():
            return  # record already safe; main is in bonus territory
        _bail("global bench budget expired before a result landed")

    threading.Thread(target=_deadline_guard, daemon=True).start()

    # Layer 2: liveness probe (skipped on explicit-CPU runs and via
    # ISHAPE_BENCH_NO_PROBE=1 — CPU has no tunnel to wedge). Cap covers the
    # worst measured first-compile session penalty (472 s, docs/PERF.md).
    # The probe is its own short chip-client session immediately before the
    # bench's init — deliberate: the "back-to-back sessions degrade the
    # server" failure mode is about KILLED clients and rapid repetition,
    # and every clean r04 capture ran exactly this probe->bench sequence
    # (tools/chip_campaign.sh); any leftover debt lands in the separately
    # reported session_warmup_s/compile_s, never the warm best-of timings.
    probe_needed = (
        os.environ.get("JAX_PLATFORMS", "") != "cpu"
        and not os.environ.get("ISHAPE_BENCH_NO_PROBE")
    )
    if probe_needed:
        for probe_try in range(2):
            cap = min(540.0, max(60.0, _global_remaining() * 0.5))
            if _probe_tunnel(cap):
                break
            if probe_try == 0:
                _emit_degraded(
                    f"tunnel probe dead after {cap:.0f}s; retrying once",
                    final=False,  # still going for a real record
                )
                time.sleep(
                    float(os.environ.get("ISHAPE_BENCH_RETRY_WAIT_S", "45"))
                )
            else:
                # salvage what is measurable without the chip: the quality
                # block runs on CPU (BASELINE.md quantity (d)) — the round
                # still lands NEW evidence even with a dead tunnel
                try:
                    rem = _global_remaining()
                    if rem > 150:
                        _PARTIAL.setdefault("detail", {}).update(
                            bench_quality_subprocess(
                                timeout_s=min(600.0, rem - 90)
                            )
                        )
                except Exception:
                    pass
                _bail("tunnel probe dead twice; backend wedged all round")

    # Layer 3: wedge watchdog — init can HANG in a futex instead of raising
    # when a killed prior client wedged the server (docs/PERF.md).
    watchdog_s = float(os.environ.get("ISHAPE_BENCH_WATCHDOG_S", "600"))

    def _watchdog() -> None:
        if _DEVICE_ALIVE.wait(timeout=watchdog_s):
            return
        if attempt < _MAX_ATTEMPTS - 1:
            _reexec(45, f"backend init wedged >{watchdog_s:.0f}s")
        _bail("backend init wedged and retries exhausted")

    threading.Thread(target=_watchdog, daemon=True).start()

    # Layer 4: outage exceptions re-exec; program errors surface (with a
    # degraded record carrying the error so the round is never JSON-less).
    try:
        main()
    except Exception as exc:
        if _backend_unavailable(exc) and attempt < _MAX_ATTEMPTS - 1:
            wait = float(os.environ.get("ISHAPE_BENCH_RETRY_WAIT_S", "60"))
            _reexec(wait, f"backend unavailable: {exc}")
        if not _JSON_EMITTED.is_set():
            _emit_degraded(f"{type(exc).__name__}: {exc}")
        raise


if __name__ == "__main__":
    _guarded_main()
