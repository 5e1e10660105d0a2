import numpy as np
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from ishapediting_tpu.edit.features import (
    complement_masks,
    make_offsets,
    neighborhood_points,
    plane_grids,
    regroup_features,
)


def _torch_resize_feat_align(feature_nchw: torch.Tensor, cat_var=True):
    """Spec re-statement of the reference regroup (drag_utils.py:141-159),
    used as a golden oracle."""
    b, c2 = feature_nchw.shape[:2]
    c = c2 // 2
    mean, var = torch.split(feature_nchw, c, dim=1)
    if c % 3:
        expect = c - c % 3
        mean = F.interpolate(mean.permute(2, 3, 0, 1), (b, expect)).permute(2, 3, 0, 1)
        var = F.interpolate(var.permute(2, 3, 0, 1), (b, expect)).permute(2, 3, 0, 1)
    m = mean.reshape(3, -1, mean.shape[2], mean.shape[3])
    if not cat_var:
        return m.float()
    v = var.reshape(3, -1, mean.shape[2], mean.shape[3])
    return torch.cat((m, v), dim=1).float()


def test_regroup_matches_reference_semantics(rng):
    # feat_layer=8 shape: [1, 64, 64, 512]
    feat = rng.standard_normal((1, 16, 16, 512)).astype(np.float32)
    ours = np.asarray(regroup_features(jnp.asarray(feat)))  # [1,3,16,16,170]
    golden = _torch_resize_feat_align(
        torch.from_numpy(feat).permute(0, 3, 1, 2)
    ).numpy()  # [3,170,16,16]
    assert ours.shape == (1, 3, 16, 16, 170)
    np.testing.assert_allclose(
        ours[0].transpose(0, 3, 1, 2), golden, atol=1e-6
    )


def test_regroup_divisible_channels(rng):
    feat = rng.standard_normal((1, 8, 8, 12)).astype(np.float32)
    ours = np.asarray(regroup_features(jnp.asarray(feat)))
    golden = _torch_resize_feat_align(torch.from_numpy(feat).permute(0, 3, 1, 2)).numpy()
    np.testing.assert_allclose(ours[0].transpose(0, 3, 1, 2), golden, atol=1e-6)


def test_regroup_mean_only(rng):
    feat = rng.standard_normal((1, 8, 8, 12)).astype(np.float32)
    ours = np.asarray(regroup_features(jnp.asarray(feat), cat_var=False))
    golden = _torch_resize_feat_align(
        torch.from_numpy(feat).permute(0, 3, 1, 2), cat_var=False
    ).numpy()
    np.testing.assert_allclose(ours[0].transpose(0, 3, 1, 2), golden, atol=1e-6)


def test_make_offsets():
    off = make_offsets(2)
    assert off.shape == (125, 3)
    assert off.min() == -2 and off.max() == 2
    # ij meshgrid ordering: first coordinate slowest
    np.testing.assert_array_equal(off[0], [-2, -2, -2])
    np.testing.assert_array_equal(off[-1], [2, 2, 2])


def test_plane_grids_projections():
    pnt = np.array([[[0.1, 0.2, 0.3]]], np.float32)  # [1,1,3]
    grids = plane_grids(pnt)
    assert grids.shape == (3, 1, 1, 2)
    np.testing.assert_allclose(grids[0, 0, 0], [0.1, 0.2])  # xy
    np.testing.assert_allclose(grids[1, 0, 0], [0.2, 0.3])  # yz
    np.testing.assert_allclose(grids[2, 0, 0], [0.1, 0.3])  # xz


def test_complement_masks_match_set_semantics(rng):
    width = 16
    src = rng.uniform(-0.9, 0.9, (2, 3)).astype(np.float32)
    tgt = rng.uniform(-0.9, 0.9, (2, 3)).astype(np.float32)
    patch = neighborhood_points(src, r=1, voxel_size=2 / 16)
    shift = neighborhood_points(tgt, r=1, voxel_size=2 / 16)
    mask, count = complement_masks(patch, shift, width)

    # golden: literal set arithmetic (reference drag_utils.py:322-334)
    pts = np.concatenate([patch.reshape(-1, 3), shift.reshape(-1, 3)], 0)
    ints = np.clip(np.round((pts + 1) * (width - 1) / 2).astype(int), 0, width - 1)
    total = {(i, j) for i in range(width) for j in range(width)}
    for plane, (a, b) in enumerate([(1, 0), (2, 1), (2, 0)]):
        content = {(p[a], p[b]) for p in ints}
        comp = total - content
        golden = np.zeros((width, width), np.float32)
        for (i, j) in comp:
            golden[i, j] = 1.0
        np.testing.assert_array_equal(mask[plane], golden)
    assert count == mask.sum()
