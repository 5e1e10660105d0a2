"""Pallas kernel parity (interpret mode on CPU) vs the XLA compositions.

The kernels target genuine TPU backends (ops/pallas_kernels.py gating);
interpret mode checks the numerics and the custom-VJP wiring here.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ishapediting_tpu.ops import pallas_kernels as pk
from ishapediting_tpu.ops.attention import dense_qkv_attention
from ishapediting_tpu.ops.nn import group_norm, group_norm_silu, silu


def ref_gn_silu(x, scale, bias, num_groups=32, eps=1e-5, film=None):
    y = group_norm(x, scale, bias, num_groups=num_groups, eps=eps)
    if film is not None:
        y = y * (1 + film[0]) + film[1]
    return silu(y)


@pytest.mark.parametrize("dtype,atol", [(jnp.float32, 2e-5), (jnp.bfloat16, 2e-2)])
@pytest.mark.parametrize("shape,groups", [((2, 8, 8, 64), 32), ((1, 6, 10, 24), 32)])
def test_groupnorm_silu_parity(dtype, atol, shape, groups):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=shape) * 2 + 0.5, dtype)
    c = shape[-1]
    scale = jnp.asarray(rng.normal(size=c) * 0.1 + 1.0, jnp.float32)
    bias = jnp.asarray(rng.normal(size=c) * 0.1, jnp.float32)
    got = pk.groupnorm_silu(x, scale, bias, num_groups=groups)
    want = ref_gn_silu(x, scale, bias, num_groups=groups)
    assert got.dtype == x.dtype
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=atol
    )


def test_groupnorm_silu_film_parity():
    rng = np.random.default_rng(1)
    n, c = 2, 32
    x = jnp.asarray(rng.normal(size=(n, 4, 4, c)), jnp.float32)
    scale = jnp.ones(c)
    bias = jnp.zeros(c)
    fs = jnp.asarray(rng.normal(size=(n, 1, 1, c)) * 0.2, jnp.float32)
    fb = jnp.asarray(rng.normal(size=(n, 1, 1, c)) * 0.2, jnp.float32)
    got = pk.groupnorm_silu(x, scale, bias, film=(fs, fb))
    want = ref_gn_silu(x, scale, bias, film=(fs, fb))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)


def test_groupnorm_silu_grads_flow():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 32)), jnp.float32)
    scale = jnp.ones(32)
    bias = jnp.zeros(32)

    def loss_pk(x, s, b):
        return jnp.sum(pk.groupnorm_silu(x, s, b) ** 2)

    def loss_ref(x, s, b):
        return jnp.sum(ref_gn_silu(x, s, b) ** 2)

    g_pk = jax.grad(loss_pk, argnums=(0, 1, 2))(x, scale, bias)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
    for a, b in zip(g_pk, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


@pytest.mark.parametrize("dtype,atol", [(jnp.float32, 2e-5), (jnp.bfloat16, 2e-2)])
def test_attention_parity(dtype, atol):
    rng = np.random.default_rng(3)
    n, t, heads, ch = 2, 16, 4, 8
    qkv = jnp.asarray(rng.normal(size=(n, t, heads * 3 * ch)), dtype)
    got = pk.attention_qkv(qkv, heads)
    want = dense_qkv_attention(qkv, heads)
    assert got.shape == want.shape == (n, t, heads * ch)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=atol
    )


def test_attention_grads_flow():
    rng = np.random.default_rng(4)
    qkv = jnp.asarray(rng.normal(size=(1, 8, 2 * 3 * 4)), jnp.float32)
    g_pk = jax.grad(lambda a: jnp.sum(pk.attention_qkv(a, 2) ** 2))(qkv)
    g_ref = jax.grad(lambda a: jnp.sum(dense_qkv_attention(a, 2) ** 2))(qkv)
    np.testing.assert_allclose(np.asarray(g_pk), np.asarray(g_ref), atol=1e-4)


def test_dispatch_gating(monkeypatch):
    monkeypatch.setenv("ISHAPE_PALLAS", "0")
    assert not pk.pallas_enabled()
    monkeypatch.setenv("ISHAPE_PALLAS", "1")
    assert pk.pallas_enabled()
    monkeypatch.setenv("ISHAPE_PALLAS", "auto")
    # CPU test backend: off by default (Mosaic only on genuine TPU)
    assert not pk.pallas_enabled()


def test_unet_forward_matches_with_pallas(monkeypatch):
    """Whole tiny UNet: pallas-dispatched forward == XLA forward."""
    from ishapediting_tpu.config import UNetConfig
    from ishapediting_tpu.models.unet import init_unet_params, unet_apply

    cfg = UNetConfig(
        image_size=8,
        in_channels=6,
        model_channels=16,
        out_channels=12,
        num_res_blocks=1,
        attention_ds=(2,),
        channel_mult=(1, 2),
        num_head_channels=8,
        dropout=0.0,
        compute_dtype="float32",
    )
    params = init_unet_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 6))
    t = jnp.array([3], jnp.int32)

    monkeypatch.setenv("ISHAPE_PALLAS", "0")
    want, feat_want = unet_apply(cfg, params, x, t, feat_layer=1)
    monkeypatch.setenv("ISHAPE_PALLAS", "1")
    got, feat_got = unet_apply(cfg, params, x, t, feat_layer=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(feat_got), np.asarray(feat_want), atol=5e-5
    )
