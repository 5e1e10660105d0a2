"""NN primitives for the ADM UNet, NHWC layout, TPU precision policy.

Semantics match the reference's primitives (reference: nn.py:16-120,
unet.py:81-140) but the implementation is JAX/XLA-first: NHWC convolutions
(XLA tiles these onto the MXU), fp32 GroupNorm statistics with results cast
back to the compute dtype, and shape-static resampling.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax


def silu(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(x)


def group_norm(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    num_groups: int = 32,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """GroupNorm over NHWC input; statistics in fp32, output cast back to the
    input dtype (reference GroupNorm32: nn.py:16-18, 32 groups: nn.py:92-99).
    """
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    n, h, w, c = x32.shape
    # The published models always have c as a multiple of 32; fall back to
    # the largest valid divisor for miniature test configs (torch
    # GroupNorm(32, c) would reject those outright, so no parity concern).
    g = min(num_groups, c)
    while c % g:
        g -= 1
    xg = x32.reshape(n, h, w, g, c // g)
    mean = jnp.mean(xg, axis=(1, 2, 4), keepdims=True)
    var = jnp.mean(jnp.square(xg - mean), axis=(1, 2, 4), keepdims=True)
    xg = (xg - mean) * lax.rsqrt(var + eps)
    out = xg.reshape(n, h, w, c) * scale.astype(jnp.float32) + bias.astype(
        jnp.float32
    )
    return out.astype(orig_dtype)


_CONV_IMPL_CACHE: Optional[str] = None


def _conv_impl() -> str:
    """Select the conv lowering.

    ``ISHAPE_CONV_IMPL`` = xla | im2col | tap | auto (default auto).

    auto: backends that report cpu/tpu/gpu lower ``lax.conv_general_dilated``
    onto the fast path (measured on the current axon runtime: native conv
    beats the matmul formulations 1.5x at model scale — docs/PERF.md
    "Runtime update"); other backends (e.g. the older axon runtime, whose
    native conv ran ~30x below its matmul rate) get the tap-accumulated
    matmul formulation.
    """
    global _CONV_IMPL_CACHE
    if _CONV_IMPL_CACHE is None:
        import os

        choice = os.environ.get("ISHAPE_CONV_IMPL", "auto")
        if choice == "auto":
            try:
                backend = jax.default_backend()
            except Exception:  # noqa: BLE001
                backend = "cpu"
            choice = "xla" if backend in ("cpu", "tpu", "gpu") else "tap"
        _CONV_IMPL_CACHE = choice
    return _CONV_IMPL_CACHE


def conv2d_xla(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray] = None,
    stride: int = 1,
    padding: int = 0,
) -> jnp.ndarray:
    """Native conv op, NHWC x HWIO -> NHWC, computed in x.dtype (the TPU MXU
    accumulates bf16 x bf16 in fp32 internally; keeping the HLO result dtype
    == operand dtype keeps the conv differentiable)."""
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    out = lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=dn,
    )
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def conv2d_im2col(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray] = None,
    stride: int = 1,
    padding: int = 0,
) -> jnp.ndarray:
    """Convolution as one big matmul over explicitly gathered patches.

    On backends whose conv lowering is slow but whose matmul path is fast,
    this is a large win on both forward and backward (the VJP is all matmuls
    and pad-adds — no conv primitives anywhere, which matters for the edit
    paths that differentiate through the whole UNet).
    """
    kh, kw, cin, cout = w.shape
    n, h, wdt, _ = x.shape
    if kh == kw == 1 and padding == 0:
        out = jnp.einsum("nhwc,co->nhwo", x[:, ::stride, ::stride], w[0, 0].astype(x.dtype))
        if b is not None:
            out = out + b.astype(out.dtype)
        return out
    xp = jnp.pad(x, ((0, 0), (padding, padding), (padding, padding), (0, 0)))
    h_out = (h + 2 * padding - kh) // stride + 1
    w_out = (wdt + 2 * padding - kw) // stride + 1
    patches = []
    for dy in range(kh):
        for dx in range(kw):
            sl = lax.slice(
                xp,
                (0, dy, dx, 0),
                (n, dy + (h_out - 1) * stride + 1, dx + (w_out - 1) * stride + 1, cin),
                (1, stride, stride, 1),
            )
            patches.append(sl)
    lhs = jnp.concatenate(patches, axis=-1)  # [N, H', W', kh*kw*C]
    # HWIO row-major (dy, dx, cin) matches the patch concat order exactly
    out = jnp.einsum(
        "nhwk,ko->nhwo", lhs, w.reshape(kh * kw * cin, cout).astype(x.dtype)
    )
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def conv2d_tap(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray] = None,
    stride: int = 1,
    padding: int = 0,
) -> jnp.ndarray:
    """Convolution as kh*kw accumulated matmuls (one per kernel tap).

    Unlike ``conv2d_im2col`` this never materializes the [N,H,W,kh*kw*C]
    patch tensor — each tap is an input-sized slice fed straight into a
    matmul whose partial products accumulate. Measured on the axon backend
    (tools/probe_conv.py, inside a scan): 140 vs 115 TF/s at 64^2x512 and
    parity at 128^2x256 against the patch-concat formulation, because the
    concat's extra 2x activation write+read traffic disappears.
    """
    kh, kw, cin, cout = w.shape
    if kh == kw == 1 and padding == 0:
        out = jnp.einsum(
            "nhwc,co->nhwo", x[:, ::stride, ::stride], w[0, 0].astype(x.dtype)
        )
        if b is not None:
            out = out + b.astype(out.dtype)
        return out
    n, h, wdt, _ = x.shape
    xp = jnp.pad(x, ((0, 0), (padding, padding), (padding, padding), (0, 0)))
    h_out = (h + 2 * padding - kh) // stride + 1
    w_out = (wdt + 2 * padding - kw) // stride + 1
    acc = None
    for dy in range(kh):
        for dx in range(kw):
            sl = lax.slice(
                xp,
                (0, dy, dx, 0),
                (n, dy + (h_out - 1) * stride + 1, dx + (w_out - 1) * stride + 1, cin),
                (1, stride, stride, 1),
            )
            part = jnp.einsum("nhwc,co->nhwo", sl, w[dy, dx].astype(x.dtype))
            acc = part if acc is None else acc + part
    if b is not None:
        acc = acc + b.astype(acc.dtype)
    return acc


def conv2d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray] = None,
    stride: int = 1,
    padding: int = 0,
) -> jnp.ndarray:
    """2D convolution, NHWC x HWIO -> NHWC (implementation per backend)."""
    impl = _conv_impl()
    if impl == "im2col":
        return conv2d_im2col(x, w, b, stride, padding)
    if impl == "tap":
        return conv2d_tap(x, w, b, stride, padding)
    return conv2d_xla(x, w, b, stride, padding)


def linear(x: jnp.ndarray, w: jnp.ndarray, b: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Dense layer; ``w`` stored (in, out). Computed in x.dtype (see conv2d)."""
    out = jnp.dot(x, w.astype(x.dtype))
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def avg_pool_2x(x: jnp.ndarray) -> jnp.ndarray:
    """2x2 stride-2 average pool over NHWC (reference Downsample with
    use_conv=False: unet.py:113-140)."""
    return lax.reduce_window(
        x.astype(jnp.float32),
        0.0,
        lax.add,
        window_dimensions=(1, 2, 2, 1),
        window_strides=(1, 2, 2, 1),
        padding="VALID",
    ).astype(x.dtype) * 0.25


def nearest_upsample_2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor 2x upsample over NHWC (reference Upsample:
    unet.py:100-110, F.interpolate mode='nearest')."""
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, 2 * h, 2 * w, c)


def timestep_embedding(
    timesteps: jnp.ndarray, dim: int, max_period: int = 10000
) -> jnp.ndarray:
    """Sinusoidal timestep embeddings, cos-first ordering
    (reference: nn.py:102-120). Always computed in fp32."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period)
        * jnp.arange(0, half, dtype=jnp.float32)
        / half
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    embedding = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        embedding = jnp.concatenate(
            [embedding, jnp.zeros_like(embedding[:, :1])], axis=-1
        )
    return embedding


def group_norm_silu(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    num_groups: int = 32,
    eps: float = 1e-5,
    film=None,
) -> jnp.ndarray:
    """``silu(group_norm(x) [FiLM])`` — the UNet's most common op chain
    (every ResBlock runs it twice; reference: unet.py:214-252). On a genuine
    TPU backend this dispatches to the fused two-pass Pallas kernel
    (``ops/pallas_kernels.py``); elsewhere the XLA composition below is used.

    ``film``: optional (scale, shift) broadcastable to [N, 1, 1, C] — the
    ADM scale-shift-norm FiLM applied between GroupNorm and SiLU.
    """
    from ishapediting_tpu.ops import pallas_kernels as pk

    if pk.pallas_enabled():
        return pk.groupnorm_silu(x, scale, bias, num_groups, eps, film)
    y = group_norm(x, scale, bias, num_groups, eps)
    if film is not None:
        y = y * (1 + film[0]) + film[1]
    return silu(y)


def channel_nearest_resize(x: jnp.ndarray, new_c: int, axis: int = -1) -> jnp.ndarray:
    """Nearest-neighbor resize along one axis, matching
    ``F.interpolate(mode='nearest')`` index mapping floor(i * src / dst)
    (used by the feature regroup, reference: drag_utils.py:146-151)."""
    src = x.shape[axis]
    idx = jnp.floor(jnp.arange(new_c) * (src / new_c)).astype(jnp.int32)
    return jnp.take(x, idx, axis=axis)
