"""Device marching tetrahedra (ops/marching.py) vs the host reference
(geometry/marching.py): same decomposition, same interpolation, same
orientation rule — parity up to f32-vs-f64 rounding."""

import numpy as np
import pytest

import jax.numpy as jnp

from ishapediting_tpu.geometry.marching import grid_to_mesh, marching_tetrahedra
from ishapediting_tpu.ops.marching import (
    assemble_mesh,
    default_capacities,
    device_grid_to_mesh,
)


def _blob_grid(res, seed=0):
    rng = np.random.default_rng(seed)
    x = np.linspace(-1, 1, res, dtype=np.float32)
    X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
    g = 0.4 - np.sqrt(X**2 + 1.2 * Y**2 + 0.8 * Z**2)
    g = g + 0.06 * np.sin(5 * X + rng.uniform(0, 1)) * np.cos(4 * Y)
    return g.astype(np.float32)


def _tri_signatures(mesh):
    """Per-triangle signature: centroid + area (winding-free) — robust to
    vertex indexing/order differences."""
    v, t = mesh.vertices, mesh.triangles
    cent = v[t].mean(axis=1)
    area = 0.5 * np.linalg.norm(
        np.cross(v[t[:, 1]] - v[t[:, 0]], v[t[:, 2]] - v[t[:, 0]]), axis=1
    )
    return np.concatenate([cent, area[:, None]], axis=1)


def _assert_same_triangles(mesh_a, mesh_b, atol):
    """Symmetric nearest-neighbor match of triangle signatures within atol.
    (Sort-based row comparison is unstable for nearly-equal floats, and a
    strict bijection check trips on genuinely duplicate signatures from
    symmetric grids — equal counts + both directions matching is the
    robust multiset-equality proxy.)"""
    from scipy.spatial import cKDTree

    sa, sb = _tri_signatures(mesh_a), _tri_signatures(mesh_b)
    assert len(sa) == len(sb)
    d_ab = cKDTree(sb).query(sa)[0]
    d_ba = cKDTree(sa).query(sb)[0]
    assert d_ab.max() < atol, f"max a->b signature distance {d_ab.max():.2e}"
    assert d_ba.max() < atol, f"max b->a signature distance {d_ba.max():.2e}"


def _signed_volume(mesh):
    v, t = mesh.vertices, mesh.triangles
    return float(np.einsum("ij,ij->", v[t[:, 0]], np.cross(v[t[:, 1]], v[t[:, 2]]))) / 6.0


@pytest.mark.parametrize("res", [24, 48])
def test_device_matches_host(res):
    grid = _blob_grid(res)
    host = marching_tetrahedra(grid.astype(np.float64), iso=0.0)
    dev = device_grid_to_mesh(jnp.asarray(grid), iso=0.0, to_unit=False)
    assert dev is not None
    assert len(dev.triangles) == len(host.triangles)
    assert len(dev.vertices) == len(host.vertices)
    # voxel-unit coords; the packed payload carries f16 tvals (~2.4e-4
    # relative), so vertex parity vs the f64 host path is ~1e-3 voxels —
    # 8e-6 of the [-1,1] domain at the product's res=256
    _assert_same_triangles(dev, host, atol=2e-3)
    # identical winding convention -> signed volumes agree (not just |V|)
    assert _signed_volume(dev) == pytest.approx(_signed_volume(host), rel=1e-3)


def test_device_matches_host_unit_mapping():
    grid = _blob_grid(32, seed=3)
    host = grid_to_mesh(grid, iso=0.0, to_unit=True)
    dev = device_grid_to_mesh(jnp.asarray(grid), iso=0.0, to_unit=True)
    _assert_same_triangles(dev, host, atol=2e-4)


def test_overflow_returns_none():
    grid = _blob_grid(32)
    assert (
        device_grid_to_mesh(jnp.asarray(grid), max_cells=16, max_tris=48)
        is None
    )


def test_empty_grid():
    grid = -np.ones((16, 16, 16), np.float32)
    mesh = device_grid_to_mesh(jnp.asarray(grid))
    assert mesh is not None and len(mesh.triangles) == 0


def test_assemble_welds_shared_edges():
    grid = _blob_grid(24)
    dev = device_grid_to_mesh(jnp.asarray(grid), to_unit=False)
    # every interior edge shared by exactly 2 triangles -> watertight weld
    t = dev.triangles
    edges = np.sort(
        np.concatenate([t[:, [0, 1]], t[:, [1, 2]], t[:, [2, 0]]]), axis=1
    )
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert counts.max() <= 2


def test_engine_device_path(monkeypatch):
    """DragEngine.get_mesh through the fused decode+march program matches
    the host path on the tiny pipeline."""
    from tests.test_engine import TINY_PIPELINE
    from ishapediting_tpu.edit.engine import DragEngine
    import jax

    engine = DragEngine(TINY_PIPELINE, seed=0)
    latent = jax.random.normal(
        jax.random.PRNGKey(7), (1,) + TINY_PIPELINE.latent_shape
    )
    monkeypatch.setenv("ISHAPE_MARCH_IMPL", "host")
    host_mesh = engine.get_mesh(latent, smooth=0)
    monkeypatch.setenv("ISHAPE_MARCH_IMPL", "device")
    dev_mesh = engine.get_mesh(latent, smooth=0)
    assert len(dev_mesh.triangles) == len(host_mesh.triangles)
    if len(host_mesh.triangles):
        _assert_same_triangles(dev_mesh, host_mesh, atol=5e-4)


def test_engine_device_failure_falls_back_loudly(monkeypatch):
    """A device-program failure warns and falls back per-call; only a
    SECOND consecutive failure pins the engine to the host path — a single
    transient (tunnel hiccup) must not permanently cost the device-marching
    win (ADVICE r3)."""
    import warnings

    from tests.test_engine import TINY_PIPELINE
    from ishapediting_tpu.edit.engine import DragEngine
    import jax

    monkeypatch.setenv("ISHAPE_MARCH_IMPL", "device")
    monkeypatch.setattr(
        DragEngine,
        "_decode_mesh_device",
        lambda self, latent, res=None: (_ for _ in ()).throw(RuntimeError("boom")),
    )
    engine = DragEngine(TINY_PIPELINE, seed=0)
    latent = jax.random.normal(
        jax.random.PRNGKey(7), (1,) + TINY_PIPELINE.latent_shape
    )
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        mesh = engine.get_mesh(latent, smooth=0)
    assert any("one retry remains" in str(w.message) for w in caught)
    assert len(mesh.triangles) > 0
    assert not engine._device_march_broken  # first failure: not sticky yet
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        mesh = engine.get_mesh(latent, smooth=0)
    assert any(
        "falling back to the host path for this engine" in str(w.message)
        for w in caught
    )
    assert len(mesh.triangles) > 0
    monkeypatch.setenv("ISHAPE_MARCH_IMPL", "auto")
    assert engine._device_march_broken and not engine._march_on_device()


def test_engine_device_success_resets_failure_count(monkeypatch):
    """A success between two failures resets the transient-failure counter
    (only *consecutive* failures pin the engine)."""
    import warnings

    from tests.test_engine import TINY_PIPELINE
    from ishapediting_tpu.edit.engine import DragEngine
    import jax

    monkeypatch.setenv("ISHAPE_MARCH_IMPL", "device")
    engine = DragEngine(TINY_PIPELINE, seed=0)
    latent = jax.random.normal(
        jax.random.PRNGKey(7), (1,) + TINY_PIPELINE.latent_shape
    )
    real = DragEngine._decode_mesh_device

    def flaky(self, lat, res=None):
        if engine._march_failures == 0 and not flaky.failed_once:
            flaky.failed_once = True
            raise RuntimeError("transient")
        return real(self, lat, res=res)

    flaky.failed_once = False
    monkeypatch.setattr(DragEngine, "_decode_mesh_device", flaky)
    with warnings.catch_warnings(record=True):
        warnings.simplefilter("always")
        engine.get_mesh(latent, smooth=0)  # fails once -> host fallback
    assert engine._march_failures == 1
    engine.get_mesh(latent, smooth=0)  # device path succeeds
    assert engine._march_failures == 0 and not engine._device_march_broken


def test_engine_reuses_compiled_rung(monkeypatch):
    """When the margined hint pick lands on a rung the session never
    compiled but the raw hint counts (2% margin) fit an already-compiled
    rung no larger, the engine stays on the compiled rung — a fresh rung
    costs a march-program compile plus fetch-slice program compiles
    (docs/PERF.md: r04o's fit surface paid an 11.8 s mesh tail this way)."""
    from tests.test_engine import TINY_PIPELINE
    from ishapediting_tpu.edit.engine import DragEngine
    import jax

    monkeypatch.setenv("ISHAPE_MARCH_IMPL", "device")
    # the tiny preset's res=16 ladder has a single rung, which would make
    # every case below vacuous — substitute a multi-rung ladder around the
    # default (8192, 24576) capacities
    monkeypatch.setattr(
        "ishapediting_tpu.ops.marching.capacity_ladder",
        lambda res: (4096, 6144, 8192, 12288),
    )
    engine = DragEngine(TINY_PIPELINE, seed=0)
    latent = jax.random.normal(
        jax.random.PRNGKey(7), (1,) + TINY_PIPELINE.latent_shape
    )
    engine.get_mesh(latent, smooth=0)
    stats1 = dict(engine._last_march_stats)
    cap, tcap = stats1["march_capacity"], stats1["march_tris_capacity"]
    assert stats1["march_attempts"] == 1

    # hint whose 1.2x margined pick climbs past the compiled rung while the
    # raw counts still fit it exactly — the boundary case: the hint IS the
    # counts of a surface that already marched successfully at this rung
    hc, ht = cap, tcap
    assert int(1.2 * hc) + 1 > cap
    res = engine.config.edit.shape_resolution
    engine._march_hint[res] = (hc, ht)
    engine.get_mesh(latent, smooth=0)
    stats2 = engine._last_march_stats
    assert stats2["march_capacity"] == cap
    assert stats2["march_tris_capacity"] == tcap
    assert stats2["march_attempts"] == 1
    assert stats2["march_rung_reused"]

    # raw hint counts ABOVE the compiled rung: no reuse, the margined pick
    # stands (a fresh larger rung)
    engine._march_hint[res] = (cap + 1, tcap + 1)
    engine.get_mesh(latent, smooth=0)
    stats3 = engine._last_march_stats
    assert stats3["march_capacity"] > cap
    assert not stats3["march_rung_reused"]


def test_clear_params_keeps_march_hint(monkeypatch):
    """clear_params resets the edit session but KEEPS the march hint — it
    is a performance cache, and fit_real_shape clears params before its
    follow-up inversion, so dropping it sent every fit decode to the
    hintless default rung with a two-trip fetch (the 11.8 s fit mesh
    tails of r04m/r04o/r04q; docs/PERF.md capture-list note)."""
    from tests.test_engine import TINY_PIPELINE
    from ishapediting_tpu.edit.engine import DragEngine
    import jax

    monkeypatch.setenv("ISHAPE_MARCH_IMPL", "device")
    engine = DragEngine(TINY_PIPELINE, seed=0)
    latent = jax.random.normal(
        jax.random.PRNGKey(7), (1,) + TINY_PIPELINE.latent_shape
    )
    engine.get_mesh(latent, smooth=0)
    hint = dict(engine._march_hint)
    assert hint  # a successful march recorded its per-res counts
    engine.clear_params()
    assert engine._march_hint == hint
    # the next decode speculates off the kept hint: single fetch trip
    engine.get_mesh(latent, smooth=0)
    assert engine._last_march_stats["march_fetch_trips"] == 1


def test_march_hint_keyed_by_res(monkeypatch):
    """Hints are per-resolution: alternating res (GUI preview vs export)
    must not bounce the capacity picks — a 256-res hint applied to a
    64-res ladder overflows past its top rung, and the 64-res counts
    would then send the next 256-res mesh to the bottom rung (guaranteed
    overflow retry)."""
    from tests.test_engine import TINY_PIPELINE
    from ishapediting_tpu.edit.engine import DragEngine
    import jax

    monkeypatch.setenv("ISHAPE_MARCH_IMPL", "device")
    engine = DragEngine(TINY_PIPELINE, seed=0)
    latent = jax.random.normal(
        jax.random.PRNGKey(7), (1,) + TINY_PIPELINE.latent_shape
    )
    res_hi = engine.config.edit.shape_resolution
    res_lo = max(8, res_hi // 2)
    engine.get_mesh(latent, smooth=0)
    hi_stats = dict(engine._last_march_stats)
    engine.get_mesh(latent, smooth=0, res=res_lo)
    assert set(engine._march_hint) == {res_hi, res_lo}
    # back at the high res: same settled capacity, single attempt, and the
    # kept per-res hint keeps the fetch at one round trip
    engine.get_mesh(latent, smooth=0)
    stats = engine._last_march_stats
    assert stats["march_capacity"] == hi_stats["march_capacity"]
    assert stats["march_attempts"] == 1
    assert stats["march_fetch_trips"] == 1


def test_engine_overflow_sticks_after_two(monkeypatch):
    """Capacity overflow (None) twice in a row pins the engine to the host
    path with a warning; a single overflow does not."""
    import warnings

    from tests.test_engine import TINY_PIPELINE
    from ishapediting_tpu.edit.engine import DragEngine
    import jax

    monkeypatch.setenv("ISHAPE_MARCH_IMPL", "device")
    monkeypatch.setattr(
        DragEngine, "_decode_mesh_device", lambda self, latent, res=None: None
    )
    engine = DragEngine(TINY_PIPELINE, seed=0)
    latent = jax.random.normal(
        jax.random.PRNGKey(7), (1,) + TINY_PIPELINE.latent_shape
    )
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        engine.get_mesh(latent, smooth=0)
    assert not getattr(engine, "_device_march_broken", False)
    assert not any("overflowed twice" in str(w.message) for w in caught)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        mesh = engine.get_mesh(latent, smooth=0)
    assert any("overflowed twice" in str(w.message) for w in caught)
    assert engine._device_march_broken and len(mesh.triangles) >= 0
    monkeypatch.setenv("ISHAPE_MARCH_IMPL", "auto")
    assert not engine._march_on_device()


def test_res_above_512_rejected():
    """res > 512 would overflow the int32 edge-key packing (max key is
    exactly INT32_MAX at 512^3); the kernel must refuse, not corrupt."""
    import jax

    from ishapediting_tpu.ops.marching import marching_tets_device

    spec = jax.ShapeDtypeStruct((513, 513, 513), jnp.float32)
    with pytest.raises(ValueError, match="res <= 512"):
        jax.eval_shape(
            lambda g: marching_tets_device(g, 0.0, max_cells=8, max_tris=24),
            spec,
        )


def test_engine_res_guard_skips_device_path(monkeypatch):
    """get_mesh(res>512) must not attempt device marching even when forced
    (the int32 key bound); it decodes through the host path instead."""
    from tests.test_engine import TINY_PIPELINE
    from ishapediting_tpu.edit.engine import DragEngine
    import jax
    import numpy as np

    monkeypatch.setenv("ISHAPE_MARCH_IMPL", "device")
    calls = []
    monkeypatch.setattr(
        DragEngine,
        "_decode_mesh_device",
        lambda self, latent, res=None: calls.append(res) or None,
    )
    # tiny fake grid so the host fallback doesn't actually decode 600^3
    monkeypatch.setattr(
        DragEngine,
        "decode_latent_grid",
        lambda self, latent, res=None: _blob_grid(16),
    )
    engine = DragEngine(TINY_PIPELINE, seed=0)
    latent = jax.random.normal(
        jax.random.PRNGKey(7), (1,) + TINY_PIPELINE.latent_shape
    )
    mesh = engine.get_mesh(latent, smooth=0, res=600)
    assert calls == []  # device path never attempted
    assert len(mesh.triangles) > 0
    monkeypatch.setenv("ISHAPE_MARCH_IMPL", "auto")


def test_default_capacities_margin():
    # measured-safe default: 1/64 of cells, ~2x the ~0.7% active cells of a
    # realistic surface (tools/probe_march_cap.py); overflow climbs
    # capacity_ladder on-device instead of dropping to the host path
    mc, mt = default_capacities(256)
    assert mc == 256**3 // 64 and mt == 3 * mc


def test_capacity_ladder_and_pick():
    from ishapediting_tpu.ops.marching import capacity_ladder, pick_capacity

    ladder = capacity_ladder(256)
    assert list(ladder) == sorted(set(ladder))
    assert ladder[0] == 256**3 // 256 and ladder[-1] == 256**3 // 8
    assert pick_capacity(ladder, 1, 1) == (ladder[0], 3 * ladder[0])
    assert pick_capacity(ladder, ladder[0] + 1, 1) == (ladder[1], 3 * ladder[0])
    # tris and cells pick independently: a tris-bound surface (>3 tris per
    # active cell) must not bounce the cells capacity up with it
    assert pick_capacity(ladder, 1, 3 * ladder[0] + 1) == (
        ladder[0], 3 * ladder[1]
    )
    # strict climb above an overflowed capacity (kernel tris undercount)
    assert pick_capacity(ladder, 1, 1, min_cells=ladder[0]) == (
        ladder[1], 3 * ladder[0]
    )
    assert pick_capacity(ladder, 1, 1, min_tris=3 * ladder[0]) == (
        ladder[0], 3 * ladder[1]
    )
    assert pick_capacity(ladder, 256**3, 1) is None
    assert pick_capacity(ladder, 1, 4 * 256**3) is None
    # small grids collapse onto the 8192-cell floor
    assert capacity_ladder(16) == (8192,)


def test_engine_adaptive_capacity(monkeypatch):
    """Overflowing the starting capacity climbs the ladder ON DEVICE
    (instead of falling back to host), and the next get_mesh starts at the
    settled rung via the session hint."""
    from tests.test_engine import TINY_PIPELINE
    from ishapediting_tpu.edit.engine import DragEngine
    import ishapediting_tpu.ops.marching as M
    import jax

    engine = DragEngine(TINY_PIPELINE, seed=0)
    latent = jax.random.normal(
        jax.random.PRNGKey(7), (1,) + TINY_PIPELINE.latent_shape
    )
    monkeypatch.setenv("ISHAPE_MARCH_IMPL", "host")
    host_mesh = engine.get_mesh(latent, smooth=0)
    n_tris = len(host_mesh.triangles)
    assert n_tris > 3
    # bottom rung too small for the surface's triangles, top rung fits
    lo = max(n_tris // 6, 1)
    monkeypatch.setattr(M, "capacity_ladder", lambda res: (lo, 8192))
    monkeypatch.setattr(M, "default_capacities", lambda res: (lo, 3 * lo))
    monkeypatch.setenv("ISHAPE_MARCH_IMPL", "device")
    dev_mesh = engine.get_mesh(latent, smooth=0)
    walls = engine.last_mesh_walls
    assert walls["impl"] == "device"
    assert walls["march_attempts"] == 2
    # only the overflowed tris capacity climbed; the cells capacity stays
    # on its fitting rung (independent pick)
    assert walls["march_capacity"] == lo
    assert walls["march_tris_capacity"] == 3 * 8192
    assert len(dev_mesh.triangles) == n_tris
    assert engine._march_overflows == 0  # recovered, not a host fallback
    # session hint: the next mesh picks a fitting pair up front, no retry
    engine.get_mesh(latent, smooth=0)
    walls = engine.last_mesh_walls
    assert walls["march_attempts"] == 1
    assert walls["march_tris_capacity"] >= n_tris


def test_pack_unpack_roundtrip_exact():
    """pack_march_output/unpack_march_payload round trip: keys pass through
    bit-exactly as int32; tvals come back as the exact f32 widening of
    their f16 quantization (ONE host round trip on the tunneled backend —
    ops/marching.py). Duplicated edges must still carry bit-identical t so
    the host weld is unaffected."""
    import jax

    from ishapediting_tpu.ops.marching import (
        marching_tets_device,
        pack_march_output,
        unpack_march_payload,
    )

    g = jnp.asarray(_blob_grid(20))
    mc, mt = default_capacities(20)
    raw = jax.jit(
        lambda x: marching_tets_device(x, 0.0, max_cells=mc, max_tris=mt)
    )(g)
    packed = jax.jit(
        lambda x: pack_march_output(
            marching_tets_device(x, 0.0, max_cells=mc, max_tris=mt)
        )
    )(g)
    assert packed.shape == (mt + 1, 5) and packed.dtype == jnp.int32
    from ishapediting_tpu.ops.marching import march_counts

    n_cells, n = march_counts(np.asarray(packed[:1]))
    assert n_cells == int(raw["n_cells"]) and n == int(raw["n_tris"])
    keys, tvals = unpack_march_payload(np.asarray(packed[1 : n + 1]))
    np.testing.assert_array_equal(keys, np.asarray(raw["keys"][:n]))
    expect = np.asarray(raw["tvals"][:n]).astype(np.float16).astype(np.float32)
    np.testing.assert_array_equal(tvals, expect)
    # weld safety: every duplicate edge key carries an identical packed t
    flat_k = keys.reshape(-1)
    flat_t = tvals.reshape(-1)
    uniq, inv = np.unique(flat_k, return_inverse=True)
    per_key = {}
    for k, t in zip(inv, flat_t):
        assert per_key.setdefault(k, t) == t
    assert len(uniq) < len(flat_k)  # the blob really has shared edges


def test_fetch_rows_quantized():
    """fetch_rows returns quantum-aligned, capacity-capped row counts that
    cover the hint with >=10% margin (stable fetch-program shapes on the
    tunneled backend)."""
    from ishapediting_tpu.ops.marching import FETCH_QUANTUM, fetch_rows

    assert fetch_rows(0, 10**9) == FETCH_QUANTUM
    r = fetch_rows(100_000, 10**9)
    assert r % FETCH_QUANTUM == 0 and r >= int(1.1 * 100_000) + 2
    # cap at the full payload (max_tris + 1 rows incl. counts row)
    assert fetch_rows(100_000, 100_000) == 100_001
    # nearby counts reuse one shape: the whole point of the quantum
    assert fetch_rows(100_000, 10**9) == fetch_rows(101_000, 10**9)


def test_engine_speculative_fetch_shortfall(monkeypatch):
    """The warm consume speculates one fetch sized by the previous mesh's
    count; a stale hint (counts jumped >10%, e.g. a new shape) must fall
    back to a second full-slab fetch and still assemble the right mesh,
    and the refreshed hint restores the single-trip path on the next call
    (engine._decode_mesh_device)."""
    from tests.test_engine import TINY_PIPELINE
    from ishapediting_tpu.edit.engine import DragEngine
    import ishapediting_tpu.ops.marching as M
    import jax

    engine = DragEngine(TINY_PIPELINE, seed=0)
    latent = jax.random.normal(
        jax.random.PRNGKey(7), (1,) + TINY_PIPELINE.latent_shape
    )
    monkeypatch.setenv("ISHAPE_MARCH_IMPL", "device")
    # tiny quantum so a stale hint really undershoots the tri count
    monkeypatch.setattr(M, "FETCH_QUANTUM", 16)
    mesh0 = engine.get_mesh(latent, smooth=0)
    n_tris = engine._last_march_stats["march_tris"]
    assert n_tris > 64
    res = engine.config.edit.shape_resolution
    engine._march_hint[res] = (engine._march_hint[res][0], 8)  # stale: way under
    mesh1 = engine.get_mesh(latent, smooth=0)
    stats = engine._last_march_stats
    assert stats["march_fetch_trips"] == 2  # speculation fell short
    assert stats["march_attempts"] == 1  # no capacity climb involved
    np.testing.assert_array_equal(mesh0.vertices, mesh1.vertices)
    np.testing.assert_array_equal(mesh0.triangles, mesh1.triangles)
    # refreshed hint: back to ONE round trip
    engine.get_mesh(latent, smooth=0)
    assert engine._last_march_stats["march_fetch_trips"] == 1


def test_gather_gradient_path_matches_dense(monkeypatch):
    """Grids past _DENSE_GRAD_MAX_RES orient triangles via six per-axis
    centroid gathers instead of the dense [r^3,3] gradient grid (HBM cost
    at res>256) — both must realize np.gradient's central-diff/one-sided
    stencil identically, i.e. the same winding on every triangle."""
    import ishapediting_tpu.ops.marching as m

    grid = _blob_grid(32)
    dense = device_grid_to_mesh(jnp.asarray(grid), iso=0.0, to_unit=False)
    monkeypatch.setattr(m, "_DENSE_GRAD_MAX_RES", 0)
    gathered = device_grid_to_mesh(jnp.asarray(grid), iso=0.0, to_unit=False)
    assert dense is not None and gathered is not None
    np.testing.assert_array_equal(dense.triangles, gathered.triangles)
    np.testing.assert_allclose(dense.vertices, gathered.vertices, atol=0)
    assert _signed_volume(dense) == pytest.approx(_signed_volume(gathered))
