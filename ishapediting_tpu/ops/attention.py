"""ADM-style QKV self-attention for small token counts (<= 1024).

Semantics follow QKVAttentionLegacy (reference: unet.py:328-354): qkv comes
from a 1x1 projection with channel layout [heads * 3 * head_dim] (heads
outermost, q/k/v inner), attention logits use the double-sqrt scaling
``(q/ch^0.25) @ (k/ch^0.25)`` and the softmax runs in fp32.

The largest sequence in the published model is 32^2 = 1024 tokens at 512
channels (SURVEY.md §5.7), so sequence sharding is never needed. On a
genuine TPU backend this dispatches to the fused Pallas kernel
(``ops/pallas_kernels.py``: q/k/v, the [T, T] logits and the softmax stay
resident in VMEM per (batch, head)); elsewhere the dense XLA formulation
below is used (the axon harness backend cannot run Mosaic — docs/PERF.md).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dense_qkv_attention(qkv: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """Dense XLA formulation; also the autodiff oracle for the Pallas path.
    ``qkv``: [N, T, H*3*ch] (legacy channel order: per-head q,k,v
    contiguous). Returns [N, T, H*ch]."""
    n, t, width = qkv.shape
    assert width % (3 * num_heads) == 0, (width, num_heads)
    ch = width // (3 * num_heads)
    qkv = qkv.reshape(n, t, num_heads, 3 * ch)
    q, k, v = jnp.split(qkv, 3, axis=-1)  # [N, T, H, ch] each

    scale = 1.0 / (ch ** 0.25)
    logits = jnp.einsum("nthc,nshc->nhts", q * scale, k * scale)
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    out = jnp.einsum("nhts,nshc->nthc", weights.astype(v.dtype), v)
    return out.reshape(n, t, num_heads * ch)


def qkv_attention(qkv: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """Apply attention (backend-dispatching; see module docstring)."""
    from ishapediting_tpu.ops import pallas_kernels as pk

    if pk.pallas_enabled():
        return pk.attention_qkv(qkv, num_heads)
    return dense_qkv_attention(qkv, num_heads)
