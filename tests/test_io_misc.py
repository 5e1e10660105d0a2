"""Coverage for checkpoint conversion dir-contract, cloud2mesh batch
pipeline, batch image crop, and non-DDIM sharded sampling."""

import os

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from tests.test_torch_convert import _torch_state_dict_from_params


def _fake_model_dir(tmp_path, cfg, rng):
    from ishapediting_tpu.models.unet import init_unet_params

    params = init_unet_params(jax.random.PRNGKey(0), cfg)
    sd = _torch_state_dict_from_params(params)
    root = tmp_path / "model"
    (root / "ddpm_fake_ckpts").mkdir(parents=True)
    (root / "statistics" / "fake_stats").mkdir(parents=True)
    torch.save(sd, root / "ddpm_fake_ckpts" / "ema_0.9999_000001.pt")
    dec_sd = {
        "0._B": torch.randn(2, 4),
        "1.weight": torch.randn(16, 8), "1.bias": torch.randn(16),
        "3.weight": torch.randn(16, 16), "3.bias": torch.randn(16),
        "5.weight": torch.randn(1, 16), "5.bias": torch.randn(1),
    }
    torch.save(dec_sd, root / "fake_decoder.pt")
    c = cfg.in_channels
    np.save(root / "statistics" / "fake_stats" / "lower_bound.npy", -np.ones(c, np.float32))
    np.save(root / "statistics" / "fake_stats" / "upper_bound.npy", np.ones(c, np.float32))
    return str(root), params


def test_convert_model_dir_and_engine_load(tmp_path, rng):
    from ishapediting_tpu.edit.engine import DragEngine
    from ishapediting_tpu.io.checkpoint import convert_model_dir, load_params
    from tests.test_engine import TINY_PIPELINE

    root, params = _fake_model_dir(tmp_path, TINY_PIPELINE.unet, rng)
    convert_model_dir(root)
    assert os.path.isdir(os.path.join(root, "unet.orbax"))
    assert os.path.isdir(os.path.join(root, "decoder.orbax"))
    back = load_params(os.path.join(root, "unet.orbax"))
    np.testing.assert_array_equal(
        np.asarray(back["out.0"]["scale"]), np.asarray(params["out.0"]["scale"])
    )

    # the engine loads the same dir through the reference discovery contract
    engine = DragEngine.from_model_dir(root, config=TINY_PIPELINE)
    for prefix in params:
        for leaf in params[prefix]:
            np.testing.assert_allclose(
                np.asarray(engine.unet_params[prefix][leaf]),
                np.asarray(params[prefix][leaf]),
                atol=1e-6,
            )
    np.testing.assert_allclose(engine.stats.half_range, np.ones(6), atol=1e-6)


def test_missing_stats_is_loud(tmp_path, rng):
    """A model dir without statistics/ must refuse to load by default (the
    reference fails loudly too, drag_utils.py:236-245) and warn when forced
    via allow_identity_stats=True."""
    import shutil
    import warnings

    from ishapediting_tpu.edit.engine import DragEngine
    from tests.test_engine import TINY_PIPELINE

    root, _ = _fake_model_dir(tmp_path, TINY_PIPELINE.unet, rng)
    shutil.rmtree(os.path.join(root, "statistics"))

    with pytest.raises(FileNotFoundError, match="statistics"):
        DragEngine.from_model_dir(root, config=TINY_PIPELINE)

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        engine = DragEngine.from_model_dir(
            root, config=TINY_PIPELINE, allow_identity_stats=True
        )
    assert any("identity" in str(w.message) for w in caught)
    np.testing.assert_array_equal(
        engine.stats.half_range, np.ones(TINY_PIPELINE.unet.in_channels)
    )


def test_cloud2mesh_directory_contract(tmp_path):
    from ishapediting_tpu.geometry.marching import grid_to_mesh
    from ishapediting_tpu.geometry.recon import cloud2mesh

    x = np.linspace(-1, 1, 32)
    X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
    sphere = grid_to_mesh((0.5 - np.sqrt(X**2 + Y**2 + Z**2)).astype(np.float32))
    pts = sphere.sample_points_uniformly(8000, seed=0)
    c = sphere.vertices.mean(axis=0)
    normals = (pts - c) / np.linalg.norm(pts - c, axis=1, keepdims=True)
    d = tmp_path / "cat" / "obj0"
    d.mkdir(parents=True)
    np.savez(d / "pointcloud.npz", points=pts, normals=normals)

    cloud2mesh(str(tmp_path), resolution=48)
    for name in ("mesh_origin.obj", "mesh_scale.obj", "mesh_scale_smooth.obj"):
        assert os.path.exists(d / name), name
    # idempotent: second run skips existing outputs without error
    cloud2mesh(str(tmp_path), resolution=48)


def test_crop_images_rgba_batch(tmp_path):
    from PIL import Image

    from ishapediting_tpu.utils.images import crop_images_rgba

    for i in range(2):
        a = np.zeros((64, 64, 4), np.uint8)
        a[10 + i * 5 : 30, 20:40] = [255, 0, 0, 255]
        Image.fromarray(a).save(tmp_path / f"im{i}.png")
    crop_images_rgba(str(tmp_path))
    out = np.asarray(Image.open(tmp_path / "Resize" / "im0.png"))
    # union bbox: rows 10..29, cols 20..39
    assert out.shape == (20, 20, 4)


def test_image_utils_each_downsample_jpg(tmp_path):
    """Per-image bbox crop, downsample, and png->jpg white-background
    conversion (reference: meshProcess.py:181-252)."""
    from PIL import Image

    from ishapediting_tpu.utils.images import (
        crop_images_rgba_each,
        down_sample,
        png_to_jpg,
    )

    for i in range(2):
        a = np.zeros((64, 64, 4), np.uint8)
        a[10 + i * 5 : 30, 20:40] = [255, 0, 0, 255]
        Image.fromarray(a).save(tmp_path / f"im{i}.png")

    crop_images_rgba_each(str(tmp_path))  # per-image bbox, not the union
    out0 = np.asarray(Image.open(tmp_path / "png" / "im0.png"))
    out1 = np.asarray(Image.open(tmp_path / "png" / "im1.png"))
    assert out0.shape == (20, 20, 4) and out1.shape == (15, 20, 4)
    crop_images_rgba_each(str(tmp_path), save_format="jpg")
    assert (tmp_path / "jpg" / "im0.jpg").exists()
    with pytest.raises(NotImplementedError):
        crop_images_rgba_each(str(tmp_path), save_format="bmp")

    down_sample(str(tmp_path))
    assert Image.open(tmp_path / "DownSample" / "im0.png").size == (32, 32)

    png_to_jpg(str(tmp_path))
    j = np.asarray(Image.open(tmp_path / "im0.jpg"))
    assert j.shape == (64, 64, 3)
    assert (j[0, 0] > 250).all()  # alpha=0 region -> white background


def test_noise2shape_compat():
    """compat.noise2shape returns unnormalized NHWC triplanes and handles a
    num_samples that is not a batch multiple (reference:
    image_sample.py:138-201)."""
    from ishapediting_tpu.compat import noise2shape
    from ishapediting_tpu.config import preset
    from ishapediting_tpu.edit.engine import DragEngine

    engine = DragEngine(preset("tiny"), seed=0)
    out = noise2shape(num_samples=3, batch_size=2, engine=engine)
    assert out.shape == (3,) + engine.config.latent_shape
    assert np.isfinite(out).all()


def test_sample_sharded_ddpm_path():
    from ishapediting_tpu.core.schedule import make_schedule
    from ishapediting_tpu.parallel.mesh import make_mesh
    from ishapediting_tpu.parallel.sampling import sample_sharded
    from tests.test_diffusion import toy_model

    sched = make_schedule(1000, "linear", "5")
    out = sample_sharded(
        sched,
        None,
        make_mesh(4),
        batch_size=4,
        latent_shape=(8, 8, 6),
        rng=jax.random.PRNGKey(0),
        use_ddim=False,
        model_fn_p=lambda p, x, t: toy_model(x, t),
        params={},
    )
    assert out.shape == (4, 8, 8, 6)
    assert np.isfinite(np.asarray(out)).all()
