"""DragEngine — the headless product layer (reference DragStuff,
drag_utils.py:174-583).

Owns the model/decoder/statistics for one category plus per-session latent
state, and exposes the full editing workflow:

    engine = DragEngine.from_model_dir("models/chairs")   # torch ckpts
    engine.update_latent_params(seed=7)                   # generate + cache
    mesh = engine.mesh                                    # TriMesh
    engine.drag_edit(sources, targets, scale=1200, cof=0.4,
                     progress_callback=print)
    engine.fit_real_shape(mesh_path="chair.obj", path=workdir)  # + inversion

Everything device-side is jit-compiled once and cached on the instance; the
GUI-facing loops (drag, fit) run in compiled chunks so Python sees progress
ticks and a stop flag between chunks without ever retracing
(reference runs per-step Python: drag_utils.py:336-399).

State kept for parity with the reference: ``w``/``w0`` (the x_{w_time}
latent), per-step guidance features, per-step variances + variance_noise from
inversion, ``mesh``/``mesh0`` snapshots, and the ``tri_feat.npy`` /
``mesh_recon.obj`` cache contract (drag_utils.py:403-409,466-470).
"""

from __future__ import annotations

import copy
import os
import threading
import time
import warnings
from functools import partial
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ishapediting_tpu.config import PipelineConfig
from ishapediting_tpu.core.diffusion import (
    ddpm_inversion,
    p_sample_guidance,
    sample_loop_with_features,
)
from ishapediting_tpu.core.schedule import (
    Schedule,
    fast_edit_schedule,
    make_schedule,
    named_beta_schedule,
    validate_w_time,
)
from ishapediting_tpu.edit.drag import (
    DragProblem,
    build_drag_problem,
    make_drag_step,
)
from ishapediting_tpu.edit.features import regroup_features
from ishapediting_tpu.edit.fit import (
    fit_direct,
    fit_guided,
    latent_to_planes,
    sample_training_points,
)
from ishapediting_tpu.geometry.marching import grid_to_mesh
from ishapediting_tpu.geometry.mesh import TriMesh
from ishapediting_tpu.io.model_dir import (
    TriplaneStats,
    discover_model_dir,
    load_stats,
)
from ishapediting_tpu.models.unet import (
    feat_layer_shape,
    init_unet_params,
    unet_apply,
)
from ishapediting_tpu.ops.triplane import decode_grid, init_decoder_params


# completion barrier for wall-clock attribution (single shared home of the
# tunneled-backend fetch idiom + its warm-the-slice timing caveat)
from ishapediting_tpu.utils.device import await_device as _await_device


def latent_to_nchw(latent_nhwc: np.ndarray) -> np.ndarray:
    """Internal [1,H,W,C] -> reference [1,C,H,W] (tri_feat.npy contract)."""
    return np.ascontiguousarray(np.asarray(latent_nhwc).transpose(0, 3, 1, 2))


def latent_from_nchw(latent_nchw: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(latent_nchw).transpose(0, 2, 3, 1))


class DragEngine:
    def __init__(
        self,
        config: Optional[PipelineConfig] = None,
        unet_params: Optional[Dict] = None,
        decoder_params: Optional[Dict] = None,
        stats: Optional[TriplaneStats] = None,
        seed: int = 0,
        remat: bool = False,
    ):
        # remat default: OFF. The engine's guided paths run at batch 1,
        # where the full-scale UNet fwd+bwd fits HBM comfortably and remat
        # only costs compute — measured on-chip 4.04 s vs 4.63 s for the
        # 170-step drag (tools/probe_walls.py, docs/PERF.md "Wall
        # attribution"). Pass remat=True for memory-constrained variants
        # (e.g. large-batch engines sharing a chip).
        self.config = config or PipelineConfig()
        rng = jax.random.PRNGKey(seed)
        k1, k2 = jax.random.split(rng)
        self.unet_params = (
            unet_params
            if unet_params is not None
            else init_unet_params(k1, self.config.unet)
        )
        self.decoder_params = (
            decoder_params
            if decoder_params is not None
            else init_decoder_params(k2, in_channels=self.config.plane_channels)
        )
        self.stats = stats or TriplaneStats.identity(
            self.config.num_planes * self.config.plane_channels
        )
        self.sched: Schedule = make_schedule(
            self.config.diffusion.base_steps,
            self.config.diffusion.noise_schedule,
            self.config.diffusion.timestep_respacing,
            rescale_timesteps=self.config.diffusion.rescale_timesteps,
        )
        self._base_sched: Optional[Schedule] = (
            make_schedule(
                self.config.diffusion.base_steps,
                self.config.diffusion.noise_schedule,
                "",
                # the adapter inverts model_timesteps' rescale by this flag
                # (core/diffusion.py::xstart_model_adapter) — it must match
                # the respaced sched's, or a rescaled t_model is used raw as
                # a gather index (silent clamp)
                rescale_timesteps=self.config.diffusion.rescale_timesteps,
            )
            if self.config.diffusion.predict_xstart
            else None
        )
        self.remat = remat

        # session state (reference: drag_utils.py:193-208)
        self.latent_code: Optional[np.ndarray] = None
        self.w: Optional[jnp.ndarray] = None
        self.w0: Optional[jnp.ndarray] = None
        self.feature_guidance: Optional[jnp.ndarray] = None  # [w_time,3,s,s,C]
        self.variances: Optional[jnp.ndarray] = None
        self.variance_noise: Optional[jnp.ndarray] = None
        self.mesh: Optional[TriMesh] = None
        self.mesh0: Optional[TriMesh] = None
        self.edited_latent: Optional[np.ndarray] = None  # last drag result
        # per-step guidance losses of the last drag_edit ({"motion","mask"})
        self.last_drag_losses: Optional[Dict[str, np.ndarray]] = None
        # wall-clock attribution of the last public call: latent_inversion /
        # drag_edit / fit_real_shape fill last_phase_walls (with a "path"
        # tag); every get_mesh fills last_mesh_walls with its own breakdown.
        # Pure observability — tiny scalar-fetch barriers only, no extra
        # buffer traffic (see _await_device).
        self.last_phase_walls: Optional[Dict[str, float]] = None
        self.last_mesh_walls: Optional[Dict[str, float]] = None
        self._last_decode_walls: Dict[str, float] = {}
        # device-marching health: set when the fused decode+march program
        # fails to lower or overflows capacity twice in a row; pins the
        # engine to the host path until clear_params()
        self._device_march_broken = False
        self._march_overflows = 0
        self._march_failures = 0
        # true (n_cells, n_tris) of the last successful device march, PER
        # grid resolution: the kernel's warm wall is capacity-proportional
        # (ops/marching.py::default_capacities), so later meshes in a
        # session run at the smallest capacity rung that fits 1.2x the last
        # counts (preferring rungs the session already compiled — see
        # _decode_mesh_device). Keyed by res because counts scale ~res^2:
        # a 256-res hint applied to a 64-res ladder would overflow past its
        # top rung (worst-case wall), and the 64-res counts would then send
        # the next 256-res mesh to the bottom rung (guaranteed overflow
        # retry) — res alternation (GUI preview vs export) must not bounce
        # the capacity picks.
        self._march_hint: Dict[int, Tuple[int, int]] = {}
        self._last_march_stats: Dict[str, int] = {}
        self.train_flag = True  # cooperative stop for drag_edit
        self._lock = threading.Lock()
        self._jit_cache: Dict = {}
        # fast-edit schedules (drag_edit(edit_steps=...)), keyed by count:
        # (window-respaced Schedule, kept chain positions ascending)
        self._fast_edit_scheds: Dict[int, Tuple[Schedule, np.ndarray]] = {}
        # fast-fit schedules (fit_real_shape(fit_steps=...)), keyed by count
        self._fit_scheds: Dict[int, Schedule] = {}

    # ------------------------------------------------------------------
    # Construction from reference-format assets
    # ------------------------------------------------------------------

    @classmethod
    def from_model_dir(
        cls,
        main_path: str,
        config: Optional[PipelineConfig] = None,
        allow_identity_stats: bool = False,
        **kw,
    ) -> "DragEngine":
        """Load a reference-layout category directory
        (reference: drag_utils.py:213-249).

        A missing ``statistics/`` directory is an error — identity
        normalization on a real checkpoint decodes garbage meshes, and the
        reference fails loudly there too (drag_utils.py:236-238). Pass
        ``allow_identity_stats=True`` to proceed anyway (warns).

        Native ``unet.orbax``/``decoder.orbax`` directories (written by
        ``io.checkpoint.convert_model_dir`` or ``cli.train
        --export_model_dir``) are preferred over the torch ``.pt``
        checkpoints when both are present — no torch needed to serve a
        natively-trained model."""
        from ishapediting_tpu.io.torch_convert import (
            load_torch_checkpoint,
            load_torch_decoder,
        )

        info = discover_model_dir(main_path)
        if info.unet_orbax:
            from ishapediting_tpu.io.checkpoint import load_params

            unet_params = load_params(info.unet_orbax)
        elif info.unet_ckpt:
            unet_params = load_torch_checkpoint(info.unet_ckpt)
        else:
            raise FileNotFoundError(
                f"no ddpm*/ema* checkpoint or unet.orbax under {main_path}"
            )
        if info.decoder_orbax:
            from ishapediting_tpu.io.checkpoint import load_params

            decoder_params = load_params(info.decoder_orbax)
        elif info.decoder_ckpt:
            decoder_params = load_torch_decoder(info.decoder_ckpt)
        else:
            raise FileNotFoundError(
                f"no decoder .pt or decoder.orbax under {main_path}"
            )
        if info.stats_dir:
            stats = load_stats(info.stats_dir)
        elif allow_identity_stats:
            warnings.warn(
                f"no statistics/ under {main_path}: using identity triplane "
                "normalization — decoded occupancies will be wrong unless the "
                "checkpoint was trained on unnormalized latents",
                stacklevel=2,
            )
            stats = None
        else:
            raise FileNotFoundError(
                f"no statistics/ directory under {main_path} (expected "
                "statistics/<name>/{lower_bound,upper_bound}.npy — reference "
                "drag_utils.py:236-245); pass allow_identity_stats=True to "
                "load with identity normalization anyway"
            )
        return cls(
            config=config,
            unet_params=unet_params,
            decoder_params=decoder_params,
            stats=stats,
            **kw,
        )

    # ------------------------------------------------------------------
    # Model functions + jit cache
    # ------------------------------------------------------------------

    def _check_w_time(self) -> int:
        """Validate edit.w_time against the respaced chain at the EDITING
        entry points (generation-only engines, e.g. ``cli.generate
        --use_dpm 25``, legitimately carry an unused out-of-range default).
        See core.schedule.validate_w_time for why silence is the failure
        mode."""
        return validate_w_time(
            self.sched,
            self.config.edit.w_time,
            context="timestep_respacing="
            f"{self.config.diffusion.timestep_respacing!r}",
        )

    def _model_fn(self, feat: bool, remat: bool = False):
        """Model closure over the *current* params — only for non-jitted or
        externally-jitted use. Jitted engine functions must use
        ``_model_fn_p`` and pass params as an argument: closing over large
        params bakes them into the jaxpr as constants, which explodes compile
        time on some backends (measured: minutes -> hours on axon)."""
        fn = self._model_fn_p(feat, remat)
        params = self.unet_params
        return lambda x, t_orig: fn(params, x, t_orig)

    def model_fn_p(self, feat: bool = False, remat: bool = False):
        """Public params-first model function ``fn(params, x, t_orig)``.

        The supported way for external callers (``compat.noise2shape``,
        ``parallel.sampling``) to drive this engine's UNet inside their own
        jitted programs: pass ``engine.unet_params`` as the first argument so
        params stay function inputs, never jaxpr constants (see
        ``_model_fn``'s compile-time note). ``feat=True`` additionally
        returns the tapped guidance feature map."""
        return self._model_fn_p(feat, remat)

    def _model_fn_p(self, feat: bool, remat: bool = False):
        cfg = self.config.unet
        feat_layer = self.config.edit.feat_layer if feat else -1

        def fn(params, x, t_orig):
            return unet_apply(
                cfg, params, x, t_orig, feat_layer=feat_layer, remat=remat
            )

        if self._base_sched is not None:
            # x0-prediction checkpoints -> epsilon contract
            from ishapediting_tpu.core.diffusion import xstart_model_adapter

            base = self._base_sched
            raw = fn

            def fn(params, x, t_orig):  # noqa: F811
                return xstart_model_adapter(
                    base, lambda xx, tt: raw(params, xx, tt)
                )(x, t_orig)

        return fn

    def _jit(self, key, builder):
        with self._lock:
            if key not in self._jit_cache:
                self._jit_cache[key] = builder()
            return self._jit_cache[key]

    @property
    def half_range(self) -> jnp.ndarray:
        return jnp.asarray(self.stats.half_range)

    @property
    def middle(self) -> jnp.ndarray:
        return jnp.asarray(self.stats.middle)

    # ------------------------------------------------------------------
    # Generation (reference: update_latent_params, drag_utils.py:252-280)
    # ------------------------------------------------------------------

    def update_latent_params(
        self, latent: Optional[np.ndarray] = None, seed: int = 0
    ) -> np.ndarray:
        """Sample a shape from noise (or a given x_T), caching ``w`` and the
        per-step guidance features; returns the final normalized latent."""
        shape = (1,) + self.config.latent_shape
        if latent is None:
            latent = jax.random.normal(jax.random.PRNGKey(seed), shape)
        else:
            latent = jnp.asarray(latent, jnp.float32).reshape(shape)
        self.latent_code = np.asarray(latent)

        w_time = self._check_w_time()
        feat_dtype = jnp.dtype(self.config.edit.feat_store_dtype)
        mf = self._model_fn_p(feat=True)
        fn = self._jit(
            ("sample_feat", w_time, str(feat_dtype)),
            lambda: jax.jit(
                lambda params, x, r: sample_loop_with_features(
                    self.sched,
                    partial(mf, params),
                    x,
                    r,
                    w_time=w_time,
                    feat_postprocess=lambda f: regroup_features(f)[0].astype(
                        feat_dtype
                    ),
                    clip_denoised=self.config.diffusion.clip_denoised,
                )
            ),
        )
        out = fn(self.unet_params, latent, jax.random.PRNGKey(seed + 1))
        self.w = out["w"]
        self.w0 = self.w
        self.feature_guidance = out["features"]
        self.variances = None
        self.variance_noise = None
        x0 = out["sample"]
        self.mesh0 = self.get_mesh(x0)
        self.mesh = copy.deepcopy(self.mesh0)
        return np.asarray(x0)

    # ------------------------------------------------------------------
    # Latent -> mesh (reference: get_mesh, drag_utils.py:282-300)
    # ------------------------------------------------------------------

    def decode_latent_grid(
        self, latent: jnp.ndarray, res: Optional[int] = None
    ) -> np.ndarray:
        """Normalized latent -> dense occupancy logits [res,res,res].

        The fp16 grid (33 MB at 256^3) is fetched host-side; on the tunneled
        backend a single transfer runs ~28 MB/s, so when
        ``ISHAPE_FETCH_SLABS`` > 1 the fetch is split into that many row
        slabs pulled by concurrent threads (identical bytes; the tunnel
        multiplexes streams — measured in tools/probe_fetch.py)."""
        res = res or self.config.edit.shape_resolution
        t0 = time.perf_counter()
        planes = latent_to_planes(
            jnp.asarray(latent, jnp.float32).reshape((1,) + self.config.latent_shape),
            self.half_range,
            self.middle,
        )
        grid = decode_grid(
            self.decoder_params, planes, res=res, out_dtype=jnp.float16
        )
        _await_device(grid)
        decode_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        try:
            k = int(os.environ.get("ISHAPE_FETCH_SLABS", "0"))
        except ValueError:
            k = 0
        if k < 1:
            # unset: default to 4 concurrent slabs on the tunneled runtime
            # (streams multiplex there — tools/probe_fetch.py); plain 1 on
            # direct-attached backends where a single memcpy is optimal
            from ishapediting_tpu.ops.pallas_kernels import axon_runtime

            k = 4 if axon_runtime() else 1
        while k > 1 and res % k:  # largest divisor of res not exceeding k
            k -= 1
        if k > 1:
            from concurrent.futures import ThreadPoolExecutor

            step = res // k
            slabs = [grid[i * step : (i + 1) * step] for i in range(k)]
            with ThreadPoolExecutor(k) as ex:
                parts = list(ex.map(np.asarray, slabs))
            host = np.concatenate(parts, axis=0)
        else:
            host = np.asarray(grid)
        self._last_decode_walls = {
            "decode_device_s": round(decode_s, 3),
            "grid_fetch_s": round(time.perf_counter() - t0, 3),
        }
        return host.astype(np.float32)

    def get_mesh(
        self,
        latent: Optional[jnp.ndarray] = None,
        t: int = 0,
        smooth: int = 10,
        res: Optional[int] = None,
    ) -> TriMesh:
        """Finish any remaining ``t`` sampling steps, decode the occupancy
        grid, extract + smooth the mesh. ``res`` overrides the config's
        shape_resolution for this call."""
        if latent is None:
            latent = jax.random.normal(
                jax.random.PRNGKey(0), (1,) + self.config.latent_shape
            )
        latent = jnp.asarray(latent, jnp.float32).reshape(
            (1,) + self.config.latent_shape
        )
        walls: Dict[str, float] = {}
        t_all = time.perf_counter()
        if t > 0:
            fn = self._jit(
                ("finish_steps",),
                lambda: jax.jit(
                    self._finish_steps_fn, static_argnames=("t_start",)
                ),
            )
            t0 = time.perf_counter()
            latent = fn(self.unet_params, latent, jax.random.PRNGKey(1234), t_start=t)
            _await_device(latent)
            walls["finish_steps_s"] = round(time.perf_counter() - t0, 3)
        mesh = None
        res_eff = res or self.config.edit.shape_resolution
        # res > 512 would overflow the int32 edge-key packing
        # (ops/marching.py: keys = corner*16 + rank, max (512^3-1)*16+15 =
        # INT32_MAX); the float64 host path has no such bound.
        if res_eff <= 512 and self._march_on_device():
            t0 = time.perf_counter()
            try:
                mesh = self._decode_mesh_device(latent, res=res)  # None on overflow
                if mesh is None:
                    # None now means even the TOP capacity rung overflowed
                    # (res^3/8 cells — a heavily fragmented field, not a
                    # surface). One may be a pathological latent; two in a
                    # row means the workload itself doesn't fit — stop
                    # paying the wasted device attempts
                    # (ISHAPE_MARCH_IMPL=device re-forces it).
                    self._march_overflows += 1
                    if self._march_overflows >= 2:
                        warnings.warn(
                            "device marching capacity overflowed twice; "
                            "sticking to the host path for this engine "
                            "(set ISHAPE_MARCH_IMPL=device to force)"
                        )
                        self._device_march_broken = True
                else:
                    self._march_overflows = 0
                    self._march_failures = 0
            except Exception as exc:  # e.g. backend lowering gap — fall back
                # One failure may be transient (tunnel hiccup, OOM under
                # concurrent load); permanently pinning to the host path on
                # the first one would silently cost every later mesh its
                # device-marching win. Two in a row means the lowering itself
                # doesn't work here — stop paying the wasted device attempt.
                self._march_failures += 1
                sticky = self._march_failures >= 2
                warnings.warn(
                    f"device marching failed ({type(exc).__name__}: {exc}); "
                    + ("falling back to the host path for this engine"
                       if sticky else
                       "falling back to the host path for this call "
                       "(one retry remains before the fallback sticks)")
                )
                if sticky:
                    self._device_march_broken = True
            walls["device_march_s"] = round(time.perf_counter() - t0, 3)
        if mesh is None:
            grid = self.decode_latent_grid(latent, res=res)
            walls.update(self._last_decode_walls)
            t0 = time.perf_counter()
            mesh = grid_to_mesh(grid, iso=0.0, to_unit=True)
            walls["march_host_s"] = round(time.perf_counter() - t0, 3)
            walls["impl"] = "host"
        else:
            walls["impl"] = "device"
            walls.update(self._last_march_stats)
        if smooth > 0:
            t0 = time.perf_counter()
            mesh = mesh.filter_smooth_simple(smooth)
            walls["smooth_s"] = round(time.perf_counter() - t0, 3)
        walls["n_verts"] = len(mesh.vertices)
        walls["total_s"] = round(time.perf_counter() - t_all, 3)
        self.last_mesh_walls = walls
        return mesh

    def _march_on_device(self) -> bool:
        """Device marching keeps the occupancy grid in HBM and ships only
        the count-sized triangle payload — a large win wherever host<->device
        bandwidth is the bottleneck (docs/PERF.md "Harness quirk"). The host
        path stays the float64 reference on CPU."""
        impl = os.environ.get("ISHAPE_MARCH_IMPL", "auto")
        if impl == "device":
            return True
        if impl == "host" or self._device_march_broken:
            return False
        return jax.default_backend() != "cpu"

    def _decode_mesh_device(
        self, latent: jnp.ndarray, res: Optional[int] = None
    ) -> Optional[TriMesh]:
        """Decode + marching tetrahedra in ONE device program: normalized
        latent -> occupancy grid (stays in HBM) -> compacted welded-edge
        triangle payload; host only assembles the mesh. Returns None if a
        fixed capacity overflowed (caller falls back to the host path)."""
        from ishapediting_tpu.ops.marching import (
            assemble_mesh,
            capacity_ladder,
            default_capacities,
            fetch_rows,
            march_counts,
            marching_tets_device,
            pack_march_output,
            pick_capacity,
            unpack_march_payload,
        )

        res = res or self.config.edit.shape_resolution
        ladder = capacity_ladder(res)
        rung_reused = False
        # Capacity selection: the kernel's warm wall is proportional to
        # max_cells (docs/PERF.md "march capacity sweep"), so run at the
        # smallest rung that fits 1.2x the last successful counts; without a
        # hint, start at the measured-safe default. An overflow climbs the
        # ladder (the counts fetch is exact for cells, an undercount for
        # tris — pick_capacity's strict-climb contract) instead of dropping
        # to the host path; each rung is a separate compile, cached per
        # engine, so a session settles onto its right-size program.
        hint = self._march_hint.get(res)
        if hint is not None:
            # 1.2x margin over the last surface's exact counts: editing
            # moves counts by <<1% per step (measured, bench r04f walls),
            # and an occasional overflow costs one extra run at a cached
            # rung (one compile the first time) — far cheaper than the
            # capacity-proportional wall of a 2x-slack rung on every mesh
            hc, ht = hint
            picked = pick_capacity(
                ladder, int(1.2 * hc) + 1, int(1.2 * ht) + 1
            )
            max_cells, max_tris = picked or (ladder[-1], 3 * ladder[-1])
            # Prefer a rung this session ALREADY COMPILED when the raw hint
            # counts fit it exactly and it is no larger than the margined
            # pick: a fresh rung costs a march-program compile plus two
            # fetch-slice program compiles (~1-2 s each on the tunneled
            # backend) and a fetch in whatever window the tunnel is in —
            # far more than the occasional overflow retry (one wasted
            # kernel run + the climb this skipped) the wider margin
            # protects against. Exact fit, no extra margin: the hint IS the
            # counts of a surface that already marched successfully, so a
            # rung holding them raw is proven; margining here re-creates
            # the boundary bounce this exists to remove. Measured: the
            # bench fit surface sits at the 174762-cell rung boundary and
            # chip-side fp nondeterminism flips which side it lands on —
            # when the margined pick crossed to a fresh 262144 rung the
            # mesh tail was 11.8-11.9 s (r04m/r04o) vs 1.5-1.6 s on a
            # settled rung (r04n/r04p).
            if ("decode_march", res, max_cells, max_tris) not in self._jit_cache:
                with self._lock:
                    compiled = sorted(
                        (k[2], k[3])
                        for k in self._jit_cache
                        if len(k) == 4 and k[0] == "decode_march" and k[1] == res
                    )
                reuse = next(
                    (
                        (c, t)
                        for c, t in compiled
                        if hc <= c <= max_cells and ht <= t <= max_tris
                    ),
                    None,
                )
                if reuse is not None:
                    max_cells, max_tris = reuse
                    rung_reused = True
        else:
            max_cells, max_tris = default_capacities(res)
        # accept the same latent shapes the host path does (a flat or
        # unbatched latent reshapes identically in decode_latent_grid)
        latent = jnp.asarray(latent, jnp.float32).reshape(
            (1,) + self.config.latent_shape
        )

        def build(max_cells, max_tris):
            def run(dec, lat, half_range, middle):
                planes = latent_to_planes(lat, half_range, middle)
                # quantize through fp16 exactly like the host path's fetch
                # (decode_latent_grid) so both paths march the same field
                grid = decode_grid(
                    dec, planes, res=res, out_dtype=jnp.float16
                ).astype(jnp.float32)
                # packed single-array output: counts in row 0, triangles
                # after — a count-hinted caller consumes the whole mesh in
                # ONE quantized-shape round trip (round-trip latency and
                # per-shape fetch-program compiles were most of the device
                # path's cost on the tunneled backend, docs/PERF.md)
                return pack_march_output(
                    marching_tets_device(
                        grid, 0.0, max_cells=max_cells, max_tris=max_tris
                    )
                )

            return lambda: jax.jit(run)

        attempts = 0
        slab = None
        while True:
            fn = self._jit(
                ("decode_march", res, max_cells, max_tris),
                build(max_cells, max_tris),
            )
            out = fn(self.decoder_params, latent, self.half_range, self.middle)
            if hint is not None and attempts == 0:
                # warm path: speculate that counts moved <1.1x since the
                # last mesh (they move <<1% per edit step, bench r04f) and
                # fetch counts + triangles together in one round trip
                spec = fetch_rows(hint[1], max_tris)
                slab = np.asarray(out[:spec])
            else:
                slab = np.asarray(out[:1])  # counts-only (cold / retry)
            n_cells, n_tris = march_counts(slab)
            attempts += 1
            if n_cells <= max_cells and n_tris <= max_tris:
                break
            # climb only the overflowed dimension(s) strictly; within one
            # call the capacities never shrink (avoids compile churn)
            nxt = pick_capacity(
                ladder, n_cells, n_tris,
                min_cells=max_cells if n_cells > max_cells else 0,
                min_tris=max_tris if n_tris > max_tris else 0,
            )
            if nxt is None:
                return None  # beyond the top rung: host path handles it
            max_cells = max(max_cells, nxt[0])
            max_tris = max(max_tris, nxt[1])
        self._march_hint[res] = (n_cells, n_tris)
        fetch_trips = 1
        if len(slab) < n_tris + 1:
            # speculation fell short (or counts-only cold path): fetch the
            # full quantized slab from row 0 — the resulting (need, 5)
            # fetch program is exactly the shape the NEXT mesh's
            # speculative fetch uses, so the warm path's program compiles
            # here instead of on mesh #2
            need = fetch_rows(n_tris, max_tris)
            slab = np.asarray(out[:need])
            fetch_trips = 2
        self._last_march_stats = {
            "march_capacity": max_cells,
            "march_tris_capacity": max_tris,
            "march_cells": n_cells,
            "march_tris": n_tris,
            "march_attempts": attempts,
            "march_fetch_trips": fetch_trips,
            "march_rung_reused": rung_reused,
        }
        if n_tris == 0:
            return TriMesh(np.zeros((0, 3)), np.zeros((0, 3), np.int64))
        keys, tvals = unpack_march_payload(slab[1 : n_tris + 1])
        mesh = assemble_mesh(keys, tvals, res)
        mesh.vertices = mesh.vertices / res * 2.0 - 1.0
        return mesh

    def _finish_steps_fn(self, params, latent, rng, *, t_start, sched=None):
        model_fn = partial(self._model_fn_p(feat=False), params)
        sched = self.sched if sched is None else sched

        def body(carry, t):
            x, key = carry
            key, sub = jax.random.split(key)
            tb = jnp.full((1,), t, jnp.int32)
            out = p_sample_guidance(
                sched, model_fn, x, tb, sub,
                clip_denoised=self.config.diffusion.clip_denoised,
            )
            return (out["sample"], key), None

        (x, _), _ = jax.lax.scan(
            body, (latent, rng), jnp.arange(t_start - 1, -1, -1)
        )
        return x

    # ------------------------------------------------------------------
    # Drag editing (reference: training, drag_utils.py:302-399)
    # ------------------------------------------------------------------

    def _fast_edit_schedule(self, count: int) -> Tuple[Schedule, np.ndarray]:
        """Window-respaced schedule for FAST drag editing, cached per count
        (see :func:`ishapediting_tpu.core.schedule.fast_edit_schedule`)."""
        if count not in self._fast_edit_scheds:
            self._fast_edit_scheds[count] = fast_edit_schedule(
                self.sched,
                named_beta_schedule(
                    self.config.diffusion.noise_schedule,
                    self.config.diffusion.base_steps,
                ),
                self.config.edit.w_time,
                count,
                rescale_timesteps=self.config.diffusion.rescale_timesteps,
            )
        return self._fast_edit_scheds[count]

    def _fit_schedule(self, count: int) -> Schedule:
        """Coarser respaced chain for FAST real-shape fitting, cached per
        count (framework extension — the reference guides every step of the
        full chain, drag_utils.py:443-463). Unlike fast editing this needs
        no window alignment: the guided fit starts from pure noise and has
        no cached-feature contract, so a plain ``space_timesteps`` respacing
        of the base chain is the correct fast schedule."""
        if count not in self._fit_scheds:
            if count < 2:
                raise ValueError(f"fit_steps must be >= 2; got {count}")
            self._fit_scheds[count] = make_schedule(
                self.config.diffusion.base_steps,
                self.config.diffusion.noise_schedule,
                str(int(count)),
                rescale_timesteps=self.config.diffusion.rescale_timesteps,
            )
        return self._fit_scheds[count]

    def drag_edit(
        self,
        sources: np.ndarray,
        targets: np.ndarray,
        scale: Optional[float] = None,
        cof: Optional[float] = None,
        seed: int = 0,
        chunk: int = 10,
        noise_mode: str = "resample",
        progress_callback: Optional[Callable[[float], None]] = None,
        edit_steps: Optional[int] = None,
    ) -> TriMesh:
        """Run the guided edit from ``w``; returns (and caches) the edited
        mesh. ``scale``/``cof`` are traced scalars — changing them does not
        recompile. Cooperative stop: set ``engine.train_flag = False``; the
        remaining steps run unguided exactly like the reference
        (drag_utils.py:337-339,399).

        ``noise_mode`` (the reference's commented edit-mode variants,
        drag_utils.py:342-346, 388-396):
        - "resample" (shipped default, case 2): fresh noise each step;
        - "fixed_variance" (case 1): fresh noise, inversion-recorded variance;
        - "replay": inversion-recorded variance_noise replayed exactly.
        The last two require a preceding ``latent_inversion``/real-shape fit.

        ``edit_steps`` (fast editing, framework extension — defaults to
        ``config.edit.edit_steps``, None = reference behavior): run the
        guided walk on a window-respaced schedule of that many steps instead
        of all ``w_time`` (``_fast_edit_schedule``). The drag loop is batch-1
        fwd+bwd and inherently sequential, so interactive latency scales
        directly with the step count; guidance features come from the same
        inversion cache (rows of the kept positions). Resample noise only —
        recorded variances belong to the full step grid. Fewer, larger
        posterior steps integrate the same guidance field more coarsely;
        per-step guidance is ``variance * scale * grad`` and the respaced
        grid's larger per-step variance already compensates the lower step
        count — keep ``scale`` unchanged (measured: doubling it at
        aggressive reductions destroys the edit). On the gate asset,
        ``edit_steps >= ~2/3 * w_time`` preserves the guidance effect;
        below ~1/2 treat the result as a fast preview (docs/PERF.md
        "Fast editing")."""
        if self.w is None or self.feature_guidance is None:
            raise RuntimeError(
                "no cached latent: call update_latent_params() or "
                "fit_real_shape() first"
            )
        w_time = self._check_w_time()
        edit_cfg = self.config.edit
        scale = edit_cfg.grad_scale if scale is None else scale
        cof = edit_cfg.mask_weight if cof is None else cof
        if noise_mode not in ("resample", "fixed_variance", "replay"):
            raise ValueError(f"unknown noise_mode {noise_mode!r}")
        if edit_steps is None:
            edit_steps = edit_cfg.edit_steps
        fast = edit_steps is not None and edit_steps < w_time
        if fast and noise_mode != "resample":
            raise ValueError(
                "edit_steps (fast editing) supports noise_mode='resample' "
                "only: inversion-recorded variances/noise belong to the "
                "full per-step grid"
            )
        if noise_mode != "resample" and (
            self.variances is None or self.variance_noise is None
        ):
            raise RuntimeError(
                f"noise_mode={noise_mode!r} needs inversion-recorded "
                "variances: run latent_inversion()/fit_real_shape() first"
            )
        if fast:
            sched_edit, positions = self._fast_edit_schedule(int(edit_steps))
            n_steps = int(edit_steps)
        else:
            sched_edit, positions = self.sched, np.arange(w_time, dtype=np.int32)
            n_steps = w_time
        feat_width = self.feature_guidance.shape[-2]
        problem = build_drag_problem(
            sources,
            targets,
            r1=edit_cfg.r1,
            voxel_size=edit_cfg.voxel_size,
            feat_width=feat_width,
        )
        self.train_flag = True

        n_handles = problem.patch_grid.shape[1]
        step_fn = self._jit(
            (
                "drag_chunk", chunk, n_handles, edit_cfg.loss_type,
                noise_mode, n_steps if fast else 0,
            ),
            lambda: jax.jit(
                partial(
                    self._drag_chunk_fn,
                    loss_type=edit_cfg.loss_type,
                    noise_mode=noise_mode,
                    sched=sched_edit if fast else None,
                )
            ),
        )

        img = self.w
        rng = jax.random.PRNGKey(seed)
        t = n_steps
        stop_time = 0
        motion_hist, mask_hist = [], []
        t_all = time.perf_counter()

        def pad_chunk(arr):
            """[n, ...] -> [chunk, ...] by repeating the last entry; keeps the
            chunk program's input shapes static so the final partial chunk
            does not trace a second program per distinct remainder."""
            n = arr.shape[0]
            if n == chunk:
                return arr
            return jnp.concatenate(
                [arr, jnp.repeat(arr[-1:], chunk - n, axis=0)], axis=0
            )

        while t > 0:
            n = min(chunk, t)
            # padded steps carry t = -1 and are skipped inside the scan body
            ts = np.concatenate(
                [np.arange(t - 1, t - 1 - n, -1), np.full(chunk - n, -1)]
            )
            if fast:
                # fast step j <-> chain position positions[j] <-> cache row
                # w_time-1-positions[j]; rows are strided, so gather
                rows = w_time - 1 - positions[ts[:n]]
                feats = pad_chunk(
                    jnp.take(
                        self.feature_guidance, jnp.asarray(rows), axis=0
                    )
                )
            else:
                feats = pad_chunk(
                    jax.lax.dynamic_slice_in_dim(
                        self.feature_guidance, w_time - t, n, axis=0
                    )
                )
            if noise_mode == "resample":
                var_slice = vn_slice = jnp.zeros((chunk,), jnp.float32)  # unused
            else:
                var_slice = pad_chunk(
                    jax.lax.dynamic_slice_in_dim(self.variances, w_time - t, n, axis=0)
                )
                vn_slice = pad_chunk(
                    jax.lax.dynamic_slice_in_dim(
                        self.variance_noise, w_time - t, n, axis=0
                    )
                )
            img, motions, masks = step_fn(
                self.unet_params,
                img,
                jnp.asarray(ts),
                feats,
                var_slice,
                vn_slice,
                rng,
                problem,
                jnp.asarray(scale, jnp.float32),
                jnp.asarray(cof, jnp.float32),
            )
            # keep as device arrays — fetching here would sync every chunk
            motion_hist.append(motions[:n])
            mask_hist.append(masks[:n])
            t -= n
            if progress_callback is not None:
                progress_callback(1.0 - t / max(n_steps - 1.0, 1.0))
            if not self.train_flag:
                stop_time = t
                break
        # Per-step guidance losses, t = w_time-1 .. stop_time. Free to
        # surface (already computed for the gradient); the edit-effect
        # regression gate (tests/test_edit_gate.py) asserts on them and they
        # are useful product diagnostics for scale/cof tuning.
        self.last_drag_losses = {
            "motion": np.concatenate([np.asarray(m) for m in motion_hist])
            if motion_hist else np.zeros(0, np.float32),
            "mask": np.concatenate([np.asarray(m) for m in mask_hist])
            if mask_hist else np.zeros(0, np.float32),
        }
        if fast and stop_time > 0:
            # cooperative stop mid-walk: the remaining unguided steps belong
            # to the FAST schedule (get_mesh's finisher walks self.sched)
            fin = self._jit(
                ("finish_steps_fast", n_steps),
                lambda: jax.jit(
                    partial(self._finish_steps_fn, sched=sched_edit),
                    static_argnames=("t_start",),
                ),
            )
            img = fin(
                self.unet_params, img, jax.random.fold_in(rng, n_steps),
                t_start=stop_time,
            )
            stop_time = 0
        self.edited_latent = np.asarray(img)
        device_s = time.perf_counter() - t_all
        t0 = time.perf_counter()
        self.mesh = self.get_mesh(img, t=stop_time)
        self.last_phase_walls = {
            "path": "drag",
            "edit_steps": n_steps,
            "device_s": round(device_s, 3),
            "mesh_s": round(time.perf_counter() - t0, 3),
            "total_s": round(time.perf_counter() - t_all, 3),
        }
        return self.mesh

    def drag_loss_summary(self) -> Optional[Dict[str, float]]:
        """First/last per-step guidance diagnostics of the most recent
        ``drag_edit`` as plain floats, or None when none were recorded —
        the single formatting source for the CLI/serve/GUI surfaces."""
        losses = self.last_drag_losses
        if losses is None or not losses["motion"].size:
            return None
        return {
            "motion_first": float(losses["motion"][0]),
            "motion_last": float(losses["motion"][-1]),
            "mask_last": float(losses["mask"][-1]),
        }

    def _drag_chunk_fn(
        self, params, img, ts, feats, variances, variance_noises, rng,
        problem, scale, cof, *, loss_type, noise_mode="resample", sched=None,
    ):
        step = make_drag_step(
            self.sched if sched is None else sched,
            partial(self._model_fn_p(feat=True, remat=self.remat), params),
            problem,
            scale=scale,
            cof=cof,
            loss_type=loss_type,
            clip_denoised=self.config.diffusion.clip_denoised,
        )

        def body(im, inp):
            t, feat, var, vn = inp
            key = jax.random.fold_in(rng, t)

            def real_step(im):
                if noise_mode == "fixed_variance":
                    return step(im, t, feat, key, variance_override=var)
                if noise_mode == "replay":
                    return step(im, t, feat, key, variance_noise=vn)
                return step(im, t, feat, key)

            # t == -1 marks chunk padding (engine.drag_edit pads the final
            # partial chunk to keep shapes static); skip those steps.
            def skip(im):
                zero = jnp.float32(0.0)
                return im, (zero, zero)

            im, losses = jax.lax.cond(t >= 0, real_step, skip, im)
            return im, losses

        img, (motions, masks) = jax.lax.scan(
            body, img.astype(jnp.float32), (ts, feats, variances, variance_noises)
        )
        return img, motions, masks

    # ------------------------------------------------------------------
    # Real-shape fitting + inversion (reference: drag_utils.py:401-471,552-566)
    # ------------------------------------------------------------------

    def fit_real_shape(
        self,
        mesh: Optional[TriMesh] = None,
        mesh_path: Optional[str] = None,
        center_mesh: bool = True,
        tri_feat_path: Optional[str] = None,
        path: str = "./",
        seed: int = 0,
        fit_steps: Optional[int] = None,
    ) -> None:
        """Fit a user mesh to a triplane latent via classifier-guided
        reconstruction, cache the result (tri_feat.npy, NCHW — reference
        cache contract), then run the edit-friendly inversion.

        ``fit_steps`` (fast fitting, framework extension — defaults to
        ``config.fit.fit_steps``, None = reference behavior): run the
        guided reconstruction on a respaced chain of that many steps
        instead of the full ``num_timesteps``. Per-step guidance is
        ``variance * scale * grad`` and the respaced posterior variance is
        larger, so fewer steps still inject comparable total guidance;
        quality trade measured in docs/PERF.md "Fast fitting". The
        follow-up inversion always runs the full chain (the feature cache
        and replay contract that editing depends on are unchanged)."""
        if tri_feat_path is not None:
            latent = jnp.asarray(latent_from_nchw(np.load(tri_feat_path)))
            self.latent_inversion(latent)  # sets mesh/mesh0 from the replay
            return

        if mesh is None:
            if mesh_path is None:
                raise ValueError("need mesh, mesh_path, or tri_feat_path")
            mesh = TriMesh.read(mesh_path)
        if center_mesh:
            mesh = mesh.copy().normalize_unit_cube()

        if fit_steps is None:
            fit_steps = self.config.fit.fit_steps
        fast = fit_steps is not None and int(fit_steps) < self.sched.num_timesteps
        sched_fit = self._fit_schedule(int(fit_steps)) if fast else self.sched

        t_all = time.perf_counter()
        points, occ = sample_training_points(mesh, self.config.fit, seed=seed)
        points_s = time.perf_counter() - t_all
        mf = self._model_fn_p(feat=False, remat=self.remat)
        fit = self._jit(
            ("fit_guided", sched_fit.num_timesteps),
            lambda: jax.jit(
                lambda params, dec, pts, oc, r: fit_guided(
                    sched_fit,
                    partial(mf, params),
                    dec,
                    pts,
                    oc,
                    self.half_range,
                    self.middle,
                    r,
                    latent_shape=self.config.latent_shape,
                    batch_points=self.config.fit.batch_points,
                    scale=self.config.fit.grad_scale,
                    clip_denoised=self.config.diffusion.clip_denoised,
                )
            ),
        )
        t0 = time.perf_counter()
        latent = fit(
            self.unet_params, self.decoder_params,
            jnp.asarray(points), jnp.asarray(occ), jax.random.PRNGKey(seed),
        )
        _await_device(latent)
        guided_s = time.perf_counter() - t0
        os.makedirs(path, exist_ok=True)
        np.save(os.path.join(path, "tri_feat.npy"), latent_to_nchw(latent))
        self.clear_params()
        # latent_inversion decodes the replayed sample (== latent exactly, by
        # the replay identity) — one decode serves both mesh and mesh0.
        self.latent_inversion(latent)
        nested = self.last_phase_walls or {}
        self.last_phase_walls = {
            "path": "fit",
            "fit_steps": int(sched_fit.num_timesteps),
            "points_s": round(points_s, 3),
            "guided_s": round(guided_s, 3),
            "inversion_device_s": nested.get("device_s", 0.0),
            "mesh_s": nested.get("mesh_s", 0.0),
            "total_s": round(time.perf_counter() - t_all, 3),
        }
        self.mesh0.write(os.path.join(path, "mesh_recon.obj"))

    def fit_real_shape_direct(
        self,
        mesh: Optional[TriMesh] = None,
        mesh_path: Optional[str] = None,
        center_mesh: bool = True,
        path: str = "./",
        seed: int = 0,
    ) -> np.ndarray:
        """Direct-Adam triplane fit (reference train_triplane_opt,
        drag_utils.py:473-550). Returns + caches the normalized latent."""
        if mesh is None:
            if mesh_path is None:
                raise ValueError("need mesh or mesh_path")
            mesh = TriMesh.read(mesh_path)
        if center_mesh:
            mesh = mesh.copy().normalize_unit_cube()
        points, occ = sample_training_points(mesh, self.config.fit, seed=seed)
        latent = fit_direct(
            self.decoder_params,
            jnp.asarray(points),
            jnp.asarray(occ),
            self.half_range,
            self.middle,
            self.stats.means,
            self.stats.stds,
            jax.random.PRNGKey(seed),
            self.config.fit,
            latent_shape=self.config.latent_shape,
        )
        os.makedirs(path, exist_ok=True)
        np.save(os.path.join(path, "tri_feat_opt.npy"), latent_to_nchw(latent))
        self.get_mesh(latent).write(os.path.join(path, "mesh_opt.obj"))
        return np.asarray(latent)

    def latent_inversion(self, latent: jnp.ndarray, seed: int = 0) -> None:
        """Edit-friendly DDPM inversion: record w, per-step features,
        variances and variance_noise (reference: drag_utils.py:552-566)."""
        w_time = self._check_w_time()
        feat_dtype = jnp.dtype(self.config.edit.feat_store_dtype)
        chunk = self.config.edit.inversion_chunk
        mf = self._model_fn_p(feat=True)
        fn = self._jit(
            ("inversion", w_time, str(feat_dtype), chunk),
            lambda: jax.jit(
                lambda params, x, r: ddpm_inversion(
                    self.sched,
                    partial(mf, params),
                    x,
                    r,
                    steps=w_time,
                    feat_postprocess=lambda f: regroup_features(f).astype(
                        feat_dtype
                    ),
                    clip_denoised=self.config.diffusion.clip_denoised,
                    chunk=chunk,
                )
            ),
        )
        latent = jnp.asarray(latent, jnp.float32).reshape(
            (1,) + self.config.latent_shape
        )
        t_all = time.perf_counter()
        out = fn(self.unet_params, latent, jax.random.PRNGKey(seed))
        _await_device(out["latent"], out["features"], out["variance_noise"])
        device_s = time.perf_counter() - t_all
        self.w = out["latent"]
        self.w0 = self.w
        # ddpm_inversion returns [steps, B, ...]; the engine is single-shape
        # (B=1), so drop the batch axis from the feature stack (the drag loop
        # consumes [w_time, 3, s, s, C']); variances/variance_noise keep their
        # [steps, 1, H, W, C] per-step-batch shape.
        self.feature_guidance = out["features"][:, 0]
        self.variances = out["variances"]
        self.variance_noise = out["variance_noise"]
        t0 = time.perf_counter()
        self.mesh = self.get_mesh(out["sample"])
        self.mesh0 = copy.deepcopy(self.mesh)
        self.last_phase_walls = {
            "path": "inversion",
            "device_s": round(device_s, 3),
            "mesh_s": round(time.perf_counter() - t0, 3),
            "total_s": round(time.perf_counter() - t_all, 3),
        }

    def sample_latent(
        self, seed: int = 0, latent: Optional[jnp.ndarray] = None
    ) -> np.ndarray:
        """Plain ancestral sample -> normalized latent [1, H, W, C], WITHOUT
        the per-step feature caching of ``update_latent_params`` (for
        consumers that don't edit, e.g. morphing — the feature cache is the
        dominant memory cost of a generation)."""
        from ishapediting_tpu.core.diffusion import p_sample_loop

        shape = (1,) + self.config.latent_shape
        if latent is None:
            latent = jax.random.normal(jax.random.PRNGKey(seed), shape)
        else:
            latent = jnp.asarray(latent, jnp.float32).reshape(shape)
        mf = self._model_fn_p(feat=False)
        clip = self.config.diffusion.clip_denoised
        fn = self._jit(
            ("sample_plain",),
            lambda: jax.jit(
                lambda params, x, r: p_sample_loop(
                    self.sched, partial(mf, params), x, r, clip_denoised=clip
                )
            ),
        )
        return np.asarray(
            fn(self.unet_params, latent, jax.random.PRNGKey(seed + 1))
        )

    def morph(
        self,
        latent_a: jnp.ndarray,
        latent_b: jnp.ndarray,
        n: int = 5,
        mesh=None,
    ) -> np.ndarray:
        """Latent-space morph between two shapes (framework extension):
        DDIM-encode both normalized latents to the noise shell, slerp at
        ``n`` uniform mix weights, decode all frames in ONE batched DDIM
        scan (edit/morph.py). With ``mesh`` (a jax data mesh, n divisible
        by its data axis) the frame decode shards one trajectory per
        device. Returns normalized latents [n, H, W, C]; decode frames
        with ``get_mesh(latents[k][None])``."""
        from ishapediting_tpu.edit.morph import morph_latents

        if n < 2:
            raise ValueError(f"need at least 2 morph frames, got {n}")
        shape = (1,) + self.config.latent_shape
        a = jnp.asarray(latent_a, jnp.float32).reshape(shape)
        b = jnp.asarray(latent_b, jnp.float32).reshape(shape)
        alphas = tuple(float(x) for x in np.linspace(0.0, 1.0, n))
        mf = self._model_fn_p(feat=False)
        clip = self.config.diffusion.clip_denoised

        fn = self._jit(
            ("morph", n, mesh is not None and str(mesh.shape)),
            lambda: jax.jit(
                lambda params, xa, xb: morph_latents(
                    self.sched,
                    partial(mf, params),
                    xa[0],
                    xb[0],
                    alphas,
                    clip_denoised=clip,
                    mesh=mesh,
                )
            ),
        )
        return np.asarray(fn(self.unet_params, a, b))

    # ------------------------------------------------------------------
    # Session state (reference: drag_utils.py:568-583)
    # ------------------------------------------------------------------

    def clear_params(self) -> None:
        self.mesh0 = None
        self.mesh = None
        self.latent_code = None
        self.w0 = None
        self.w = None
        self.feature_guidance = None
        self.variances = None
        self.variance_noise = None
        self.last_drag_losses = None
        # give device marching another chance on the next workload
        self._device_march_broken = False
        self._march_overflows = 0
        self._march_failures = 0
        # _march_hint is deliberately KEPT: it is a performance cache (last
        # surface's exact counts), not session state — dropping it sends the
        # next decode to the never-elsewhere-used default rung with a
        # two-trip fetch whose fresh fetch-program compile + payload rides
        # whatever window the tunnel is in (the 11.8 s fit mesh tails of
        # r04m/o/q: fit_real_shape clears params before its inversion, so
        # every fit decode ran hintless). A stale hint costs at most one
        # overflow retry (adaptive climb) or an oversized speculative fetch.

    def reset_params(self) -> None:
        if self.mesh0 is not None:
            self.mesh = copy.deepcopy(self.mesh0)
        if self.w0 is not None:
            self.w = self.w0
