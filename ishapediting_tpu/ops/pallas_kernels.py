"""Pallas TPU kernels for the UNet's fused hot ops (SURVEY.md §7.1).

Two kernels, both VPU/MXU-shaped for real TPU hardware:

- ``groupnorm_silu``: GroupNorm(32, fp32 stats) + optional FiLM scale-shift
  + SiLU in two streaming passes (stats accumulation, then normalize+act),
  grid over (batch, row-tiles) so VMEM holds only a [tile, W, C] slice with
  the channel axis on the 128-wide lanes. Replaces three HBM round-trips
  (GN read/write, FiLM, SiLU) with two.
- ``attention_qkv``: ADM QKVAttentionLegacy (double-sqrt scaling, fp32
  softmax) for <=1024-token blocks, grid over (batch, heads); q/k/v slices,
  the [T, T] logits and the softmax all stay resident in VMEM.

Both are wrapped in ``jax.custom_vjp`` whose backward recomputes through the
pure-JAX reference composition (``ops.nn.group_norm`` + SiLU,
``ops.attention.qkv_attention``), so the guidance paths that differentiate
through the UNet (edit/drag.py, edit/fit.py) keep exact autodiff semantics.

Gating (``pallas_enabled``): on by default only on a genuine TPU backend.
The axon harness backend cannot run Mosaic (hangs — docs/PERF.md), and on
CPU/GPU XLA's own fusion is already adequate; there the kernels still run
under ``interpret=True`` (used by the test suite for numerical parity).
``ISHAPE_PALLAS`` overrides: ``0`` off, ``1`` on, ``auto`` (default).
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu is importable on non-TPU backends; kernels then need interpret
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False


def axon_runtime() -> bool:
    """Is the current backend the axon harness runtime? It reports platform
    "tpu" but identifies itself in ``platform_version``. Single source of
    truth for this detection — bench.py and the Mosaic gate both use it
    (the runtime has already renamed itself once; fix detection HERE)."""
    try:
        from jax._src import xla_bridge

        version = getattr(xla_bridge.get_backend(), "platform_version", "")
        return "axon" in version.lower()
    except Exception:  # pragma: no cover
        return False


def _genuine_tpu() -> bool:
    """True only on a real TPU backend that can run Mosaic (the axon
    backend cannot — hangs, docs/PERF.md)."""
    try:
        return jax.default_backend() == "tpu" and not axon_runtime()
    except Exception:  # pragma: no cover
        return False


def pallas_enabled() -> bool:
    """Should the UNet dispatch to these kernels? (trace-time decision)"""
    choice = os.environ.get("ISHAPE_PALLAS", "auto")
    if choice == "0":
        return False
    if choice == "1":
        return _HAS_PLTPU
    return _HAS_PLTPU and _genuine_tpu()


def _interpret() -> bool:
    """Interpret mode off only on a genuine (Mosaic-capable) TPU backend."""
    return not _genuine_tpu()


def _vmem_spec(*args, **kw):
    if _HAS_PLTPU:
        kw.setdefault("memory_space", pltpu.VMEM)
    return pl.BlockSpec(*args, **kw)


def _effective_groups(c: int, num_groups: int) -> int:
    g = min(num_groups, c)
    while c % g:
        g -= 1
    return g


def _row_tile(h: int, w: int, c: int, itemsize: int, budget: int = 1 << 21) -> int:
    """Largest divisor of ``h`` whose [tile, W, C] slice stays under ~2 MB."""
    th = max(1, min(h, budget // max(1, w * c * itemsize)))
    while h % th:
        th -= 1
    return th


# ---------------------------------------------------------------------------
# fused GroupNorm + FiLM + SiLU
# ---------------------------------------------------------------------------


def _gn_stats_kernel(g: int, x_ref, out_ref):
    """Accumulate per-(batch, group) sum and sum-of-squares over row tiles."""
    t = pl.program_id(1)
    xv = x_ref[0].astype(jnp.float32)  # [th, W, C]
    th, w, c = xv.shape
    xr = xv.reshape(th * w, g, c // g)
    s = jnp.sum(xr, axis=(0, 2))  # [G]
    s2 = jnp.sum(xr * xr, axis=(0, 2))

    @pl.when(t == 0)
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    out_ref[0, 0, :] += s
    out_ref[0, 1, :] += s2


def _gn_norm_kernel(g: int, eps: float, count: float, film: bool, *refs):
    if film:
        x_ref, stats_ref, sb_ref, film_ref, out_ref = refs
    else:
        x_ref, stats_ref, sb_ref, out_ref = refs
    xv = x_ref[0].astype(jnp.float32)  # [th, W, C]
    th, w, c = xv.shape
    cg = c // g
    mean = stats_ref[0, 0, :] / count  # [G]
    var = stats_ref[0, 1, :] / count - mean * mean
    inv = jax.lax.rsqrt(var + eps)

    xr = xv.reshape(th * w, g, cg)
    yr = (xr - mean[None, :, None]) * inv[None, :, None]
    y = yr.reshape(th * w, c)
    y = y * sb_ref[0, :].astype(jnp.float32) + sb_ref[1, :].astype(jnp.float32)
    if film:
        fs = film_ref[0, 0, :].astype(jnp.float32)
        fb = film_ref[0, 1, :].astype(jnp.float32)
        y = y * (1.0 + fs) + fb
    y = y * jax.nn.sigmoid(y)  # SiLU
    out_ref[0] = y.reshape(th, w, c).astype(out_ref.dtype)


def _gn_silu_pallas(
    x: jnp.ndarray,
    sb: jnp.ndarray,
    film_sb: Optional[jnp.ndarray],
    num_groups: int,
    eps: float,
) -> jnp.ndarray:
    n, h, w, c = x.shape
    g = _effective_groups(c, num_groups)
    th = _row_tile(h, w, c, x.dtype.itemsize)
    grid = (n, h // th)
    interp = _interpret()

    stats = pl.pallas_call(
        functools.partial(_gn_stats_kernel, g),
        grid=grid,
        in_specs=[_vmem_spec((1, th, w, c), lambda i, t: (i, t, 0, 0))],
        out_specs=_vmem_spec((1, 2, g), lambda i, t: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, 2, g), jnp.float32),
        interpret=interp,
    )(x)

    count = float(h * w * (c // g))
    in_specs = [
        _vmem_spec((1, th, w, c), lambda i, t: (i, t, 0, 0)),
        _vmem_spec((1, 2, g), lambda i, t: (i, 0, 0)),
        _vmem_spec((2, c), lambda i, t: (0, 0)),
    ]
    args = [x, stats, sb]
    if film_sb is not None:
        in_specs.append(_vmem_spec((1, 2, c), lambda i, t: (i, 0, 0)))
        args.append(film_sb)
    return pl.pallas_call(
        functools.partial(_gn_norm_kernel, g, eps, count, film_sb is not None),
        grid=grid,
        in_specs=in_specs,
        out_specs=_vmem_spec((1, th, w, c), lambda i, t: (i, t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interp,
    )(*args)


def _gn_silu_reference(x, sb, film_sb, num_groups, eps):
    """Pure-JAX composition — backward path and numerical oracle."""
    from ishapediting_tpu.ops.nn import group_norm, silu

    y = group_norm(x, sb[0], sb[1], num_groups=num_groups, eps=eps)
    if film_sb is not None:
        y = y.astype(jnp.float32) * (
            1.0 + film_sb[:, 0, None, None, :].astype(jnp.float32)
        ) + film_sb[:, 1, None, None, :].astype(jnp.float32)
        y = y.astype(x.dtype)
    return silu(y)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _gn_silu(x, sb, film_sb, num_groups, eps):
    return _gn_silu_pallas(x, sb, film_sb, num_groups, eps)


def _gn_silu_fwd(x, sb, film_sb, num_groups, eps):
    return _gn_silu_pallas(x, sb, film_sb, num_groups, eps), (x, sb, film_sb)


def _gn_silu_bwd(num_groups, eps, res, ct):
    x, sb, film_sb = res
    if film_sb is None:
        _, vjp = jax.vjp(
            lambda a, b: _gn_silu_reference(a, b, None, num_groups, eps), x, sb
        )
        dx, dsb = vjp(ct)
        return dx, dsb, None
    _, vjp = jax.vjp(
        lambda a, b, f: _gn_silu_reference(a, b, f, num_groups, eps), x, sb, film_sb
    )
    return vjp(ct)


_gn_silu.defvjp(_gn_silu_fwd, _gn_silu_bwd)


def groupnorm_silu(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    num_groups: int = 32,
    eps: float = 1e-5,
    film: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
) -> jnp.ndarray:
    """Fused ``silu(group_norm(x) [ * (1+fs) + fb ])`` over NHWC input.

    ``film``: optional (scale, shift), each broadcastable to [N, 1, 1, C]
    (the ADM scale-shift-norm FiLM, reference: unet.py:245-252).
    """
    n, _, _, c = x.shape
    sb = jnp.stack([scale, bias]).reshape(2, c)
    film_sb = None
    if film is not None:
        fs = jnp.broadcast_to(film[0].reshape(n, 1, 1, c)[:, 0, 0, :], (n, c))
        fb = jnp.broadcast_to(film[1].reshape(n, 1, 1, c)[:, 0, 0, :], (n, c))
        film_sb = jnp.stack([fs, fb], axis=1)  # [N, 2, C]
    return _gn_silu(x, sb, film_sb, num_groups, eps)


# ---------------------------------------------------------------------------
# fused QKV attention (ADM legacy ordering)
# ---------------------------------------------------------------------------


def _attn_kernel(ch: int, x_ref, out_ref):
    """One (batch, head): qkv slice [1, T, 3ch] -> out [1, T, ch]."""
    q = x_ref[0, :, 0:ch]
    k = x_ref[0, :, ch : 2 * ch]
    v = x_ref[0, :, 2 * ch : 3 * ch]
    s = float(ch) ** -0.25
    logits = jax.lax.dot_general(
        (q.astype(jnp.float32) * s),
        (k.astype(jnp.float32) * s),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [T, T]
    weights = jax.nn.softmax(logits, axis=-1)
    out = jnp.dot(
        weights.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    out_ref[0] = out.astype(out_ref.dtype)


def _attn_pallas(qkv: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    n, t, width = qkv.shape
    assert width % (3 * num_heads) == 0, (width, num_heads)
    ch = width // (3 * num_heads)
    # fold heads into the leading (grid) axis so every block spans its full
    # trailing dims (Mosaic requires last-two block dims divisible by (8,128)
    # or equal to the array dims); the transposes fuse into neighbors
    x = qkv.reshape(n, t, num_heads, 3 * ch).transpose(0, 2, 1, 3)
    x = x.reshape(n * num_heads, t, 3 * ch)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, ch),
        grid=(n * num_heads,),
        in_specs=[_vmem_spec((1, t, 3 * ch), lambda i: (i, 0, 0))],
        out_specs=_vmem_spec((1, t, ch), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n * num_heads, t, ch), qkv.dtype),
        interpret=_interpret(),
    )(x)
    out = out.reshape(n, num_heads, t, ch).transpose(0, 2, 1, 3)
    return out.reshape(n, t, num_heads * ch)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def attention_qkv(qkv: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """Fused ADM attention; same contract as ``ops.attention.qkv_attention``
    (qkv [N, T, H*3*ch], per-head q/k/v contiguous; reference:
    unet.py:328-354)."""
    return _attn_pallas(qkv, num_heads)


def _attn_fwd(qkv, num_heads):
    return _attn_pallas(qkv, num_heads), (qkv,)


def _attn_bwd(num_heads, res, ct):
    # the DENSE formulation, not the dispatching wrapper (recursion!)
    from ishapediting_tpu.ops.attention import dense_qkv_attention

    (qkv,) = res
    _, vjp = jax.vjp(lambda a: dense_qkv_attention(a, num_heads), qkv)
    return vjp(ct)


attention_qkv.defvjp(_attn_fwd, _attn_bwd)
