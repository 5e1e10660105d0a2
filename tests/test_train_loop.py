"""Training driver: checkpoint/resume, NaN guard, dataset, decoder training."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ishapediting_tpu.core.schedule import make_schedule
from ishapediting_tpu.io.dataset import (
    MultiOccupancyDataset,
    OccupancyDataset,
    TriplaneDataset,
)
from ishapediting_tpu.io.model_dir import TriplaneStats
from ishapediting_tpu.models.unet import init_unet_params
from ishapediting_tpu.train.loop import latest_checkpoint, train
from tests.test_train_parallel import TINY


def _batches(rng, n=4):
    while True:
        yield np.clip(rng.standard_normal((n, 8, 8, 6)).astype(np.float32), -1, 1)


def test_train_checkpoint_and_resume(tmp_path, rng):
    sched = make_schedule(100, "linear", "")
    params = init_unet_params(jax.random.PRNGKey(0), TINY)
    ckpt_dir = str(tmp_path / "ckpts")
    state = train(
        TINY, sched, params, _batches(rng),
        total_steps=4, ckpt_dir=ckpt_dir, ckpt_every=2, log_every=100,
    )
    assert int(state.step) == 4
    assert latest_checkpoint(ckpt_dir).endswith("step_4")

    # resume continues from step 4
    state2 = train(
        TINY, sched, params, _batches(rng),
        total_steps=6, ckpt_dir=ckpt_dir, ckpt_every=10, log_every=100,
    )
    assert int(state2.step) == 6


def test_train_nan_guard(tmp_path, rng):
    sched = make_schedule(100, "linear", "")
    params = init_unet_params(jax.random.PRNGKey(0), TINY)

    def bad_batches():
        while True:
            yield np.full((2, 8, 8, 6), np.nan, np.float32)

    with pytest.raises(FloatingPointError):
        train(
            TINY, sched, params, bad_batches(),
            total_steps=10, ckpt_dir=None, max_bad_steps=3, log_every=100,
        )


def test_triplane_dataset(tmp_path, rng):
    stats = TriplaneStats(
        half_range=np.full(6, 2.0, np.float32), middle=np.ones(6, np.float32)
    )
    for i in range(5):
        np.save(tmp_path / f"{i}.npy", rng.standard_normal((6, 8, 8)).astype(np.float32))
    ds = TriplaneDataset(str(tmp_path), stats, channels=6)
    assert len(ds) == 5
    batch = next(ds.batches(2, seed=0))
    assert batch.shape == (2, 8, 8, 6)
    # normalization applied: x = (tri - middle)/half_range
    raw = np.load(ds.files[0]).transpose(1, 2, 0)
    normalized = ds._load(ds.files[0])
    np.testing.assert_allclose(normalized, (raw - 1.0) / 2.0, atol=1e-6)


def test_occupancy_datasets(rng):
    pts = rng.uniform(-1, 1, (100, 3)).astype(np.float32)
    occ = (rng.random(100) > 0.5).astype(np.float32)
    ds = OccupancyDataset(pts, occ)
    p, o = next(ds.batches(16))
    assert p.shape == (16, 3) and o.shape == (16,)
    multi = MultiOccupancyDataset([ds, ds])
    obj, p, o = next(multi.batches(8))
    assert obj in (0, 1) and p.shape == (8, 3)


def test_decoder_training_learns_sphere(rng):
    """Joint decoder training must fit a simple occupancy function."""
    from ishapediting_tpu.ops.triplane import decode_points
    from ishapediting_tpu.train.decoder import train_decoder

    pts = rng.uniform(-1, 1, (20000, 3)).astype(np.float32)
    occ = (np.linalg.norm(pts, axis=1) < 0.5).astype(np.float32)
    ds = OccupancyDataset(pts, occ)
    multi = MultiOccupancyDataset([ds])
    params, bank = train_decoder(
        multi.batches(2048, seed=0),
        num_objs=1, steps=150, resolution=32, channels=8, lr=3e-3,
        log_every=1000,
    )
    test_pts = rng.uniform(-1, 1, (2000, 3)).astype(np.float32)
    logits = np.asarray(decode_points(params, bank[0], jnp.asarray(test_pts)))[:, 0]
    pred = logits > 0
    truth = np.linalg.norm(test_pts, axis=1) < 0.5
    acc = (pred == truth).mean()
    assert acc > 0.9, acc


@pytest.mark.slow
def test_ddpm_learns_and_redenoises_tiny_dataset(rng):
    """Train<->sample consistency with a real learned model: after training
    on a 4-latent dataset, re-denoising a moderately-noised training latent
    must return close to it (validates the whole train+sample stack; the
    sampler alone is validated analytically in test_diffusion)."""
    from ishapediting_tpu.core.diffusion import q_sample, sample_partial
    from ishapediting_tpu.models.unet import unet_apply

    cfg = TINY  # 8x8x6, fp32
    sched = make_schedule(100, "linear", "")
    data = np.clip(rng.standard_normal((4, 8, 8, 6)).astype(np.float32) * 0.4, -1, 1)
    params = init_unet_params(jax.random.PRNGKey(0), cfg)
    from ishapediting_tpu.train.trainer import make_optimizer, make_train_step, init_train_state

    opt = make_optimizer(1e-3)
    step = jax.jit(make_train_step(cfg, sched, opt, remat=False, ema_rate=0.99))
    state = init_train_state(params, opt)
    for i in range(1500):
        idx = rng.integers(0, 4, 8)
        state, metrics = step(state, jnp.asarray(data[idx]), jax.random.PRNGKey(i))
    assert float(metrics["mse"]) < 0.08

    p = state.ema_params
    mf = lambda x, t: unet_apply(cfg, p, x, t)
    t0 = 30
    noised = q_sample(
        sched, jnp.asarray(data[:1]), jnp.full((1,), t0, jnp.int32),
        jax.random.normal(jax.random.PRNGKey(3), (1, 8, 8, 6)),
    )
    redo = np.asarray(
        sample_partial(sched, mf, noised, jax.random.PRNGKey(4), t_start=t0)["sample"]
    )
    dist = np.linalg.norm(redo[0] - data[0])
    norm = np.linalg.norm(data[0])
    assert dist < 0.4 * norm, (dist, norm)


@pytest.mark.slow
def test_train_ema_sample_mesh_beats_random_baseline(rng):
    """Closes the trainer loop at MESH level: train the product trainer
    (train.loop.train) on jittered copies of a sphere triplane latent, then
    EMA-sample from pure noise, decode through the (jointly trained)
    decoder, extract the mesh, and require it to beat a random-init UNet's
    sample by CD to the training shape. Proves checkpointable training
    state produces usable samples end-to-end (reference has no trainer —
    its fp16_util.py:147-231 scaffolding never closes this loop).
    Recorded (round 5 probe): EMA CD 0.034-0.085 across seeds vs random
    0.22-0.29; gates at <0.15 absolute and <0.6x the random baseline."""
    from ishapediting_tpu.config import UNetConfig
    from ishapediting_tpu.core.diffusion import ddim_sample_loop
    from ishapediting_tpu.geometry.marching import grid_to_mesh
    from ishapediting_tpu.geometry.metrics import chamfer_distance
    from ishapediting_tpu.models.unet import unet_apply
    from ishapediting_tpu.ops.triplane import decode_grid
    from ishapediting_tpu.train.decoder import train_decoder

    pts = rng.uniform(-1, 1, (20000, 3)).astype(np.float32)
    occ = (np.linalg.norm(pts, axis=1) < 0.55).astype(np.float32)
    ds = MultiOccupancyDataset([OccupancyDataset(pts, occ)])
    dec, bank = train_decoder(
        ds.batches(2048, seed=0), num_objs=1, steps=250,
        resolution=8, channels=6, lr=3e-3, log_every=10_000,
    )
    planes0 = bank[0]
    ref_mesh = grid_to_mesh(
        np.asarray(decode_grid(dec, planes0, res=32, compute_dtype=jnp.float32))
    )
    assert len(ref_mesh.triangles) > 0, "decoder failed to learn the sphere"
    latent0 = np.asarray(planes0).transpose(1, 2, 0, 3).reshape(1, 8, 8, 18)
    scale = float(np.abs(latent0).max())
    data_norm = latent0 / scale  # keep targets in [-1,1] for clip_denoised

    cfg = UNetConfig(
        image_size=8, in_channels=18, model_channels=32, out_channels=36,
        num_res_blocks=1, attention_ds=(4,), channel_mult=(1, 2),
        num_head_channels=16, dropout=0.0, compute_dtype="float32",
    )
    sched = make_schedule(50, "linear", "")

    def batches():
        while True:
            yield data_norm.repeat(16, axis=0) + 0.02 * rng.standard_normal(
                (16, 8, 8, 18)
            ).astype(np.float32)

    params = init_unet_params(jax.random.PRNGKey(0), cfg)
    state = train(
        cfg, sched, params, batches(), total_steps=2500, ckpt_dir=None,
        log_every=10_000, lr=3e-3, ema_rate=0.995,
    )

    def sample_cd(p, seed):
        mf = lambda x, t: unet_apply(cfg, p, x, t)
        x_T = jax.random.normal(jax.random.PRNGKey(seed), (1, 8, 8, 18))
        lat = np.asarray(
            ddim_sample_loop(sched, mf, x_T, jax.random.PRNGKey(seed + 1))
        )
        planes = jnp.asarray((lat * scale)[0].reshape(8, 8, 3, 6).transpose(2, 0, 1, 3))
        g = np.asarray(decode_grid(dec, planes, res=32, compute_dtype=jnp.float32))
        m = grid_to_mesh(g)
        if len(m.triangles) == 0:
            return float("inf")
        return chamfer_distance(ref_mesh, m, 20_000)

    cd_trained = min(sample_cd(state.ema_params, s) for s in (10, 20))
    cd_random = min(
        sample_cd(init_unet_params(jax.random.PRNGKey(42), cfg), s)
        for s in (10, 20)
    )
    assert cd_trained < 0.15, f"trained sample CD {cd_trained} too high"
    assert cd_trained < 0.6 * cd_random, (
        f"trained CD {cd_trained} does not beat random baseline {cd_random}"
    )


def test_train_export_then_serve_roundtrip(tmp_path):
    """cli.train --export_model_dir writes a serveable category dir
    (unet.orbax EMA + decoder.orbax + explicit identity statistics) and
    DragEngine.from_model_dir loads it with NO torch checkpoints involved —
    the native train -> serve contract (the torch-layout counterpart:
    reference drag_utils.py:213-228)."""
    from ishapediting_tpu.cli.train import main as train_main
    from ishapediting_tpu.config import preset
    from ishapediting_tpu.edit.engine import DragEngine
    from ishapediting_tpu.io.checkpoint import save_params
    from ishapediting_tpu.ops.triplane import init_decoder_params

    dec = init_decoder_params(jax.random.PRNGKey(5), in_channels=2)
    save_params(str(tmp_path / "dec.orbax"), dec)
    model_dir = str(tmp_path / "model")
    train_main([
        "--preset", "tiny", "--synthetic", "4", "--steps", "4",
        "--batch_size", "2", "--ckpt_dir", str(tmp_path / "ckpts"),
        "--export_model_dir", model_dir,
        "--decoder_from", str(tmp_path / "dec.orbax"),
    ])
    assert os.path.isdir(os.path.join(model_dir, "unet.orbax"))
    assert os.path.isdir(os.path.join(model_dir, "decoder.orbax"))
    assert os.path.exists(
        os.path.join(model_dir, "statistics", "identity", "lower_bound.npy")
    )
    engine = DragEngine.from_model_dir(model_dir, config=preset("tiny"))
    engine.update_latent_params(seed=0)
    assert engine.w is not None, "loaded engine failed to sample"
    assert np.isfinite(np.asarray(engine.w)).all()
