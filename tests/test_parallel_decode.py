"""Mesh-sharded dense decode on the virtual 8-device mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ishapediting_tpu.ops.triplane import decode_grid, init_decoder_params
from ishapediting_tpu.parallel.decode import decode_grid_sharded
from ishapediting_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def dec_and_planes():
    dec = init_decoder_params(jax.random.PRNGKey(0), in_channels=4, mapping=8,
                              hidden=16)
    planes = jax.random.normal(jax.random.PRNGKey(1), (3, 8, 8, 4), jnp.float32)
    return dec, planes


def test_sharded_decode_matches_single_device(dec_and_planes):
    """Bit-identical to decode_grid: same precompute, same slab kernel."""
    dec, planes = dec_and_planes
    mesh = make_mesh(8)
    ref = np.asarray(decode_grid(dec, planes, res=32, compute_dtype=jnp.float32))
    out = decode_grid_sharded(
        dec, planes, mesh, res=32, compute_dtype=jnp.float32
    )
    assert out.shape == (32, 32, 32)
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_sharded_decode_is_row_sharded(dec_and_planes):
    """The output lives sharded over axis 0 across ALL mesh devices — no
    gather happens until the host asks for it."""
    dec, planes = dec_and_planes
    mesh = make_mesh(8, model_parallel=2)
    out = decode_grid_sharded(dec, planes, mesh, res=32)
    assert len(out.sharding.device_set) == 8
    # each device holds a contiguous [4, 32, 32] x-slab
    shard_shapes = {s.data.shape for s in out.addressable_shards}
    assert shard_shapes == {(4, 32, 32)}


def test_sharded_decode_2d_mesh_matches(dec_and_planes):
    """data x model meshes linearize row-major to the same row order."""
    dec, planes = dec_and_planes
    ref = np.asarray(decode_grid(dec, planes, res=16, compute_dtype=jnp.float32))
    out = decode_grid_sharded(
        dec, planes, make_mesh(8, model_parallel=4), res=16,
        compute_dtype=jnp.float32,
    )
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_sharded_decode_out_dtype_and_bad_res(dec_and_planes):
    dec, planes = dec_and_planes
    mesh = make_mesh(8)
    out = decode_grid_sharded(dec, planes, mesh, res=16, out_dtype=jnp.float16)
    assert out.dtype == jnp.float16
    with pytest.raises(ValueError, match="divide"):
        decode_grid_sharded(dec, planes, mesh, res=17)


def test_batched_decode_matches_per_sample(dec_and_planes):
    """decode_grids_batched: one grid per device, each bit-identical to the
    single-device decode of that triplane."""
    from ishapediting_tpu.parallel.decode import decode_grids_batched

    dec, _ = dec_and_planes
    planes_b = jax.random.normal(
        jax.random.PRNGKey(7), (8, 3, 8, 8, 4), jnp.float32
    )
    mesh = make_mesh(8)
    out = decode_grids_batched(
        dec, planes_b, mesh, res=16, compute_dtype=jnp.float32
    )
    assert out.shape == (8, 16, 16, 16)
    # batch axis sharded: one grid per device
    assert {s.data.shape for s in out.addressable_shards} == {(1, 16, 16, 16)}
    for i in (0, 3, 7):
        ref = decode_grid(dec, planes_b[i], res=16, compute_dtype=jnp.float32)
        np.testing.assert_array_equal(np.asarray(out[i]), np.asarray(ref))
    with pytest.raises(ValueError, match="divide"):
        decode_grids_batched(dec, planes_b[:3], mesh, res=16)
