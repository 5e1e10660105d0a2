"""End-to-end quality check: direct triplane fit of an analytic shape must
reproduce its surface (mesh -> points -> planes -> grid -> mesh)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ishapediting_tpu.config import FitConfig
from ishapediting_tpu.edit.fit import (
    fit_direct,
    latent_to_planes,
    sample_training_points,
)
from ishapediting_tpu.geometry.marching import grid_to_mesh
from ishapediting_tpu.geometry.metrics import chamfer_distance
from ishapediting_tpu.ops.triplane import decode_grid, init_decoder_params


def test_direct_fit_scan_matches_eager_loop():
    """The single-program lax.scan fit must be bit-identical to the
    per-step-dispatch loop it replaced (same rng split sequence)."""
    rng = np.random.default_rng(0)
    pts = (rng.random((600, 3)) * 2 - 1).astype(np.float32)
    occ = (np.linalg.norm(pts, axis=1) < 0.5).astype(np.float32)
    dec = init_decoder_params(
        jax.random.PRNGKey(1), in_channels=8, mapping=16, hidden=32
    )
    cfg = FitConfig(points_size=600, batch_points=200, opt_epochs=2, opt_lr=3e-3)
    hr, mid = jnp.ones(24), jnp.zeros(24)
    kwargs = dict(latent_shape=(16, 16, 24))
    args = (
        dec, jnp.asarray(pts), jnp.asarray(occ), hr, mid,
        np.zeros(24, np.float32), np.full(24, 0.001, np.float32),
    )
    scanned = fit_direct(*args, jax.random.PRNGKey(7), cfg, **kwargs)
    eager = fit_direct(
        *args, jax.random.PRNGKey(7), cfg, _eager_loop=True, **kwargs
    )
    np.testing.assert_array_equal(np.asarray(scanned), np.asarray(eager))


@pytest.mark.slow
def test_direct_fit_reconstructs_sphere():
    x = np.linspace(-1, 1, 48)
    X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
    sphere = grid_to_mesh((0.55 - np.sqrt(X**2 + Y**2 + Z**2)).astype(np.float32))

    cfg = FitConfig(points_size=50_000, batch_points=10_000, opt_epochs=30, opt_lr=3e-3)
    pts, occ = sample_training_points(sphere, cfg, seed=0)
    dec = init_decoder_params(
        jax.random.PRNGKey(1), in_channels=16, mapping=32, hidden=64
    )
    hr, mid = jnp.ones(48), jnp.zeros(48)
    latent = fit_direct(
        dec, jnp.asarray(pts), jnp.asarray(occ), hr, mid,
        np.zeros(48, np.float32), np.full(48, 0.001, np.float32),
        jax.random.PRNGKey(2), cfg, latent_shape=(64, 64, 48),
    )
    planes = latent_to_planes(latent, hr, mid)
    grid = np.asarray(decode_grid(dec, planes, res=64, compute_dtype=jnp.float32))
    mesh = grid_to_mesh(grid)
    cd = chamfer_distance(sphere, mesh, 20_000)
    assert cd < 0.01, f"chamfer {cd} too high — fit failed"
