import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from ishapediting_tpu.ops.triplane import (
    decode_grid,
    decode_points,
    decode_points_chunked,
    init_decoder_params,
    l2_reg,
    sample_plane_features,
    tv_reg,
)


@pytest.fixture
def decoder():
    return init_decoder_params(jax.random.PRNGKey(0))


@pytest.fixture
def planes(rng):
    return jnp.asarray(rng.standard_normal((3, 16, 16, 32)).astype(np.float32))


def _torch_decode(dec, planes_nhwc, coords):
    """Golden decode with torch ops following MultiTriplane semantics
    (reference: axisnetworks.py:537-562)."""
    planes = torch.from_numpy(np.asarray(planes_nhwc)).permute(0, 3, 1, 2)

    def sample(plane, coords2d):
        g = torch.from_numpy(coords2d).reshape(1, 1, -1, 2)
        out = F.grid_sample(
            plane[None], g, mode="bilinear", padding_mode="zeros",
            align_corners=True,
        )
        return out[0, :, 0, :].T  # [N, C]

    feats = (
        sample(planes[0], coords[:, 0:2])
        + sample(planes[1], coords[:, 1:3])
        + sample(planes[2], coords[:, ::2])
    )
    x = 2 * np.pi * feats @ torch.from_numpy(np.asarray(dec["fourier_B"]))
    h = torch.cat([torch.sin(x), torch.cos(x)], dim=-1)
    h = torch.relu(h @ torch.from_numpy(np.asarray(dec["dense1"]["w"])) +
                   torch.from_numpy(np.asarray(dec["dense1"]["b"])))
    h = torch.relu(h @ torch.from_numpy(np.asarray(dec["dense2"]["w"])) +
                   torch.from_numpy(np.asarray(dec["dense2"]["b"])))
    return (h @ torch.from_numpy(np.asarray(dec["dense3"]["w"])) +
            torch.from_numpy(np.asarray(dec["dense3"]["b"]))).numpy()


def test_decode_points_matches_torch(decoder, planes, rng):
    coords = rng.uniform(-1, 1, (257, 3)).astype(np.float32)
    ours = np.asarray(decode_points(decoder, planes, jnp.asarray(coords)))
    golden = _torch_decode(decoder, planes, coords)
    np.testing.assert_allclose(ours, golden, atol=2e-4)


def test_decode_points_chunked(decoder, planes, rng):
    coords = rng.uniform(-1, 1, (1000, 3)).astype(np.float32)
    a = np.asarray(decode_points(decoder, planes, jnp.asarray(coords)))
    b = np.asarray(decode_points_chunked(decoder, planes, jnp.asarray(coords), chunk=256))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_decode_grid_matches_pointwise(decoder, planes):
    """The dense separable-resize path must agree with the gather path on the
    exact lattice coordinates."""
    res = 8
    grid = np.asarray(
        decode_grid(decoder, planes, res=res, chunk=4, compute_dtype=jnp.float32)
    )
    x = np.linspace(-1, 1, res).astype(np.float32)
    X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
    coords = np.stack([X, Y, Z], axis=-1).reshape(-1, 3)
    pointwise = np.asarray(
        decode_points(decoder, planes, jnp.asarray(coords))
    ).reshape(res, res, res)
    np.testing.assert_allclose(grid, pointwise, atol=5e-4)


def test_decode_grid_bf16_close_to_fp32(decoder, planes):
    g32 = np.asarray(decode_grid(decoder, planes, res=16, chunk=8, compute_dtype=jnp.float32))
    g16 = np.asarray(decode_grid(decoder, planes, res=16, chunk=8, compute_dtype=jnp.bfloat16))
    # logits are O(1); bf16 matmuls should stay within a few 1e-2
    assert np.abs(g32 - g16).max() < 0.05 * max(1.0, np.abs(g32).max())


def test_decode_points_grad_wrt_planes(decoder, planes, rng):
    """BCE guidance differentiates w.r.t. the planes
    (reference: drag_utils.py:449-457)."""
    coords = jnp.asarray(rng.uniform(-1, 1, (64, 3)).astype(np.float32))
    labels = jnp.asarray((rng.random((64, 1)) > 0.5).astype(np.float32))

    def loss(p):
        logits = decode_points(decoder, p, coords)
        return jnp.mean(
            jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))
        )

    g = jax.grad(loss)(planes)
    assert g.shape == planes.shape
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


def test_regularizers_match_torch(planes):
    p = torch.from_numpy(np.asarray(planes)).permute(0, 3, 1, 2)  # [3,C,H,W]
    tv = sum(
        ((e[:, 1:] - e[:, :-1]) ** 2).sum() ** 0.5
        + ((e[:, :, 1:] - e[:, :, :-1]) ** 2).sum() ** 0.5
        for e in p
    )
    l2 = sum((e ** 2).sum() ** 0.5 for e in p)
    np.testing.assert_allclose(float(tv_reg(planes)), float(tv), rtol=1e-5)
    np.testing.assert_allclose(float(l2_reg(planes)), float(l2), rtol=1e-5)


def test_sample_plane_features_convention(decoder):
    """Plane axis conventions: xy plane indexed (x->col, y->row) etc."""
    planes = np.zeros((3, 8, 8, 32), np.float32)
    planes[0, 2, 5, :] = 1.0  # xy plane, row=y idx 2, col=x idx 5
    # coordinate with x at pixel 5, y at pixel 2 (align_corners: -1 + 2*i/7)
    x = -1 + 2 * 5 / 7
    y = -1 + 2 * 2 / 7
    feats = np.asarray(
        sample_plane_features(jnp.asarray(planes), jnp.asarray([[x, y, -1.0]]))
    )
    np.testing.assert_allclose(feats[0], np.ones(32), atol=1e-5)
