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
    g = num_groups
    xg = x32.reshape(n, h, w, g, c // g)
    mean = jnp.mean(xg, axis=(1, 2, 4), keepdims=True)
    var = jnp.mean(jnp.square(xg - mean), axis=(1, 2, 4), keepdims=True)
    xg = (xg - mean) * lax.rsqrt(var + eps)
    out = xg.reshape(n, h, w, c) * scale.astype(jnp.float32) + bias.astype(
        jnp.float32
    )
    return out.astype(orig_dtype)


def conv2d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray] = None,
    stride: int = 1,
    padding: int = 0,
) -> jnp.ndarray:
    """2D convolution, NHWC x HWIO -> NHWC. Accumulates in fp32 on the MXU."""
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    out = lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=dn,
        preferred_element_type=jnp.float32,
    )
    if b is not None:
        out = out + b.astype(jnp.float32)
    return out.astype(x.dtype)


def linear(x: jnp.ndarray, w: jnp.ndarray, b: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Dense layer; ``w`` stored (in, out)."""
    out = jnp.dot(x, w.astype(x.dtype), preferred_element_type=jnp.float32)
    if b is not None:
        out = out + b.astype(jnp.float32)
    return out.astype(x.dtype)


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


def channel_nearest_resize(x: jnp.ndarray, new_c: int, axis: int = -1) -> jnp.ndarray:
    """Nearest-neighbor resize along one axis, matching
    ``F.interpolate(mode='nearest')`` index mapping floor(i * src / dst)
    (used by the feature regroup, reference: drag_utils.py:146-151)."""
    src = x.shape[axis]
    idx = jnp.floor(jnp.arange(new_c) * (src / new_c)).astype(jnp.int32)
    return jnp.take(x, idx, axis=axis)
