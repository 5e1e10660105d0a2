"""Golden tests of the NN primitives against PyTorch CPU functional ops."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from ishapediting_tpu.ops.attention import qkv_attention
from ishapediting_tpu.ops.grid_sample import grid_sample_2d
from ishapediting_tpu.ops.nn import (
    avg_pool_2x,
    channel_nearest_resize,
    conv2d,
    group_norm,
    nearest_upsample_2x,
    silu,
    timestep_embedding,
)


def test_grid_sample_matches_torch(rng):
    feat = rng.standard_normal((2, 9, 13, 5)).astype(np.float32)
    grid = (rng.random((2, 4, 7, 2)).astype(np.float32) * 2.6 - 1.3)  # incl OOB
    ours = np.asarray(grid_sample_2d(jnp.asarray(feat), jnp.asarray(grid)))
    theirs = F.grid_sample(
        torch.from_numpy(feat).permute(0, 3, 1, 2),
        torch.from_numpy(grid),
        mode="bilinear",
        padding_mode="zeros",
        align_corners=True,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_grid_sample_exact_corners(rng):
    feat = rng.standard_normal((1, 8, 8, 3)).astype(np.float32)
    grid = np.array([[[[-1.0, -1.0], [1.0, 1.0], [1.0, -1.0]]]], np.float32)
    out = np.asarray(grid_sample_2d(jnp.asarray(feat), jnp.asarray(grid)))[0, 0]
    np.testing.assert_allclose(out[0], feat[0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(out[1], feat[0, 7, 7], atol=1e-6)
    np.testing.assert_allclose(out[2], feat[0, 0, 7], atol=1e-6)  # (x=1,y=-1)


def test_group_norm_matches_torch(rng):
    x = rng.standard_normal((2, 6, 6, 64)).astype(np.float32)
    scale = rng.standard_normal(64).astype(np.float32)
    bias = rng.standard_normal(64).astype(np.float32)
    ours = np.asarray(
        group_norm(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias), 32)
    )
    theirs = F.group_norm(
        torch.from_numpy(x).permute(0, 3, 1, 2),
        32,
        torch.from_numpy(scale),
        torch.from_numpy(bias),
        eps=1e-5,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-4)


def test_conv2d_matches_torch(rng):
    x = rng.standard_normal((2, 8, 8, 4)).astype(np.float32)
    w = rng.standard_normal((3, 3, 4, 6)).astype(np.float32)
    b = rng.standard_normal(6).astype(np.float32)
    ours = np.asarray(conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), padding=1))
    theirs = F.conv2d(
        torch.from_numpy(x).permute(0, 3, 1, 2),
        torch.from_numpy(w).permute(3, 2, 0, 1),
        torch.from_numpy(b),
        padding=1,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-4)


def test_conv2d_stride2(rng):
    x = rng.standard_normal((1, 8, 8, 4)).astype(np.float32)
    w = rng.standard_normal((3, 3, 4, 4)).astype(np.float32)
    ours = np.asarray(conv2d(jnp.asarray(x), jnp.asarray(w), None, stride=2, padding=1))
    theirs = F.conv2d(
        torch.from_numpy(x).permute(0, 3, 1, 2),
        torch.from_numpy(w).permute(3, 2, 0, 1),
        stride=2,
        padding=1,
    ).permute(0, 2, 3, 1).numpy()
    assert ours.shape == (1, 4, 4, 4)
    np.testing.assert_allclose(ours, theirs, atol=1e-4)


def test_pool_and_upsample_match_torch(rng):
    x = rng.standard_normal((2, 6, 6, 3)).astype(np.float32)
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    np.testing.assert_allclose(
        np.asarray(avg_pool_2x(jnp.asarray(x))),
        F.avg_pool2d(xt, 2, 2).permute(0, 2, 3, 1).numpy(),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(nearest_upsample_2x(jnp.asarray(x))),
        F.interpolate(xt, scale_factor=2, mode="nearest").permute(0, 2, 3, 1).numpy(),
        atol=1e-6,
    )


def test_timestep_embedding_cos_first():
    """cos-first ordering (reference nn.py:117)."""
    emb = np.asarray(timestep_embedding(jnp.array([0.0]), 8))
    np.testing.assert_allclose(emb[0, :4], np.ones(4), atol=1e-6)
    np.testing.assert_allclose(emb[0, 4:], np.zeros(4), atol=1e-6)
    # spot-check a frequency
    t = 37.0
    emb = np.asarray(timestep_embedding(jnp.array([t]), 128))
    freqs = np.exp(-np.log(10000) * np.arange(64) / 64)
    np.testing.assert_allclose(emb[0, :64], np.cos(t * freqs), atol=1e-4)
    np.testing.assert_allclose(emb[0, 64:], np.sin(t * freqs), atol=1e-4)


def test_channel_nearest_resize_matches_torch(rng):
    x = rng.standard_normal((4, 4, 2, 256)).astype(np.float32)
    ours = np.asarray(channel_nearest_resize(jnp.asarray(x), 255, axis=-1))
    # reference does F.interpolate(..., (B, expect)) on a [s,s,B,C] tensor
    theirs = F.interpolate(torch.from_numpy(x), size=(2, 255), mode="nearest").numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_qkv_attention_matches_torch(rng):
    n, t, heads, ch = 2, 16, 3, 8
    width = heads * 3 * ch
    qkv = rng.standard_normal((n, t, width)).astype(np.float32)
    ours = np.asarray(qkv_attention(jnp.asarray(qkv), heads))

    # torch reference: QKVAttentionLegacy semantics (unet.py:337-354) applied
    # to the channel-last layout.
    qkv_t = torch.from_numpy(qkv)  # [N, T, H*3c]
    qkv_t = qkv_t.reshape(n, t, heads, 3 * ch)
    q, k, v = qkv_t.split(ch, dim=-1)
    scale = 1 / np.sqrt(np.sqrt(ch))
    weight = torch.einsum("nthc,nshc->nhts", q * scale, k * scale)
    weight = torch.softmax(weight.float(), dim=-1)
    out = torch.einsum("nhts,nshc->nthc", weight, v).reshape(n, t, heads * ch)
    np.testing.assert_allclose(ours, out.numpy(), atol=1e-4)


def test_silu():
    x = jnp.array([-1.0, 0.0, 2.0])
    np.testing.assert_allclose(
        np.asarray(silu(x)),
        F.silu(torch.tensor([-1.0, 0.0, 2.0])).numpy(),
        atol=1e-6,
    )


def test_conv2d_im2col_matches_xla(rng):
    from ishapediting_tpu.ops.nn import conv2d_im2col, conv2d_xla

    for (kh, stride, pad, cin, cout) in [(3, 1, 1, 4, 6), (3, 2, 1, 4, 4), (1, 1, 0, 5, 7)]:
        x = jnp.asarray(rng.standard_normal((2, 8, 8, cin)).astype(np.float32))
        w = jnp.asarray(rng.standard_normal((kh, kh, cin, cout)).astype(np.float32))
        b = jnp.asarray(rng.standard_normal(cout).astype(np.float32))
        a = np.asarray(conv2d_xla(x, w, b, stride=stride, padding=pad))
        bb = np.asarray(conv2d_im2col(x, w, b, stride=stride, padding=pad))
        np.testing.assert_allclose(a, bb, atol=1e-4), (kh, stride)


def test_conv2d_im2col_grad_matches(rng):
    import jax
    from ishapediting_tpu.ops.nn import conv2d_im2col, conv2d_xla

    x = jnp.asarray(rng.standard_normal((1, 6, 6, 3)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 5)).astype(np.float32))
    g1 = jax.grad(lambda x: jnp.sum(conv2d_xla(x, w, None, padding=1) ** 2))(x)
    g2 = jax.grad(lambda x: jnp.sum(conv2d_im2col(x, w, None, padding=1) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-3)
