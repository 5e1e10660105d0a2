"""Quality gate for the classifier-guided real-shape fit (fit_guided).

The reference's actual real-shape path is ``train_triplane``
(drag_utils.py:401-471): classifier-guided DDPM reconstruction with BCE on
occupancy labels. This test trains a miniature decoder + triplane DDPM from
scratch on procedural spheres (the examples/toy_pipeline.py recipe), then
fits a HELD-OUT sphere via fit_guided and asserts:

1. the fitted latent decodes to a mesh with Chamfer distance below threshold
   vs the input mesh (reconstruction quality, not just contract);
2. the edit-friendly inversion of the fit replays to the same latent exactly
   and its decoded mesh matches the reconstruction (the "Inversion" button
   contract, main.py:441-457).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ishapediting_tpu.config import (
    DiffusionConfig,
    EditConfig,
    FitConfig,
    PipelineConfig,
    UNetConfig,
)
from ishapediting_tpu.core.schedule import make_schedule
from ishapediting_tpu.edit.engine import DragEngine
from ishapediting_tpu.edit.fit import sample_training_points
from ishapediting_tpu.geometry.marching import grid_to_mesh
from ishapediting_tpu.geometry.metrics import chamfer_distance
from ishapediting_tpu.io.model_dir import TriplaneStats
from ishapediting_tpu.models.unet import init_unet_params
from ishapediting_tpu.train.decoder import train_decoder
from ishapediting_tpu.train.loop import train

PLANE_RES, PLANE_CH = 16, 8


def sphere_mesh(center_x: float, radius: float, res: int = 48):
    x = np.linspace(-1, 1, res)
    X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
    grid = radius - np.sqrt((X - center_x) ** 2 + Y**2 + Z**2)
    return grid_to_mesh(grid.astype(np.float32))


@pytest.fixture(scope="module")
def toy_system():
    """Train decoder + plane bank + tiny DDPM on 8 procedural spheres."""
    rng = np.random.default_rng(0)
    n = 8
    centers = np.stack(
        [rng.uniform(-0.25, 0.25, n), np.zeros(n), np.zeros(n)], axis=1
    ).astype(np.float32)
    radii = rng.uniform(0.3, 0.5, n).astype(np.float32)

    def occupancy(obj_idx, pts):
        return (
            np.linalg.norm(pts - centers[obj_idx], axis=1) < radii[obj_idx]
        ).astype(np.float32)

    def dec_batches():
        while True:
            obj = int(rng.integers(0, n))
            u = rng.uniform(-1, 1, (1024, 3)).astype(np.float32)
            sdir = rng.standard_normal((1024, 3)).astype(np.float32)
            sdir /= np.linalg.norm(sdir, axis=1, keepdims=True)
            s = centers[obj] + sdir * (
                radii[obj] + rng.normal(0, 0.05, (1024, 1))
            ).astype(np.float32)
            pts = np.concatenate([u, s], axis=0)
            yield obj, pts, occupancy(obj, pts)

    dec_params, bank = train_decoder(
        dec_batches(),
        num_objs=n,
        steps=500,
        resolution=PLANE_RES,
        channels=PLANE_CH,
        mapping=16,
        hidden=64,
        lr=3e-3,
        seed=0,
        log_every=1000,
    )
    bank_np = np.asarray(bank)
    flat = bank_np.transpose(0, 2, 3, 1, 4).reshape(
        n, PLANE_RES, PLANE_RES, 3 * PLANE_CH
    )
    mean = flat.mean(axis=(0, 1, 2))
    std = flat.std(axis=(0, 1, 2))
    stats = TriplaneStats(
        half_range=np.maximum(2.5 * std, 1e-6).astype(np.float32),
        middle=mean.astype(np.float32),
    )
    latents = np.clip((flat - stats.middle) / stats.half_range, -1, 1)

    cfg = PipelineConfig(
        unet=UNetConfig(
            image_size=PLANE_RES,
            in_channels=3 * PLANE_CH,
            model_channels=32,
            out_channels=6 * PLANE_CH,
            num_res_blocks=1,
            attention_ds=(4,),
            channel_mult=(1, 2),
            num_head_channels=16,
            dropout=0.0,
            compute_dtype="float32",
        ),
        diffusion=DiffusionConfig(base_steps=100, timestep_respacing="25"),
        edit=EditConfig(w_time=12, feat_layer=1, shape_resolution=48, r1=2,
                        feat_store_dtype="float32"),
        fit=FitConfig(points_size=20_000, batch_points=4_000, grad_scale=600.0),
        plane_channels=PLANE_CH,
    )
    train_sched = make_schedule(100, "linear", "")

    def ddpm_batches():
        while True:
            yield latents[rng.integers(0, n, 8)]

    state = train(
        cfg.unet,
        train_sched,
        init_unet_params(jax.random.PRNGKey(0), cfg.unet),
        ddpm_batches(),
        total_steps=2500,
        ckpt_dir=None,
        lr=1e-3,
        log_every=10_000,
        ema_rate=0.999,
    )
    engine = DragEngine(
        cfg,
        unet_params=state.ema_params,
        decoder_params=dec_params,
        stats=stats,
        remat=False,
    )
    return engine


@pytest.mark.slow
def test_fit_guided_reconstructs_held_out_sphere(toy_system, tmp_path):
    engine = toy_system
    # held-out shape: center/radius inside the training distribution but not
    # one of the 8 training spheres
    target_mesh = sphere_mesh(center_x=0.1, radius=0.42)

    engine.fit_real_shape(mesh=target_mesh, center_mesh=False, path=str(tmp_path))
    recon = engine.mesh0
    assert recon is not None and len(recon.vertices) > 0, "fit produced no surface"
    cd = chamfer_distance(target_mesh, recon, 20_000)
    # toy decoder voxel scale is 2/16 = 0.125; CD well under one plane cell
    # means the guided fit actually reconstructed the target surface
    assert cd < 0.06, f"fit_guided chamfer {cd:.4f} too high"

    # the tri_feat.npy cache contract (reference: drag_utils.py:403-409)
    assert (tmp_path / "tri_feat.npy").exists()
    assert (tmp_path / "mesh_recon.obj").exists()

    # inversion-replay consistency: fit_real_shape already ran
    # latent_inversion; the replayed sample decoded into engine.mesh, which
    # must match the reconstruction it was replayed from
    cd_replay = chamfer_distance(recon, engine.mesh, 20_000)
    assert cd_replay < 1e-3, f"inversion replay mesh drifted: {cd_replay:.5f}"

    # and the cached latent must round-trip through the cache path
    engine2_mesh_before = engine.mesh
    engine.fit_real_shape(tri_feat_path=str(tmp_path / "tri_feat.npy"))
    # chamfer between two independent 20k samplings of the same surface is
    # O(1e-4); 1e-3 still catches any real drift (wrong transpose/seed ~ 1e-1)
    cd_cache = chamfer_distance(engine2_mesh_before, engine.mesh, 20_000)
    assert cd_cache < 1e-3, f"tri_feat cache path changed the mesh: {cd_cache}"


@pytest.mark.slow
def test_fast_fit_matches_full_fit_quality(toy_system, tmp_path):
    """Fast fitting (fit_steps, framework extension): the guided fit on a
    respaced chain of 10 of 25 steps must still reconstruct the held-out
    sphere. Per-step guidance is variance * scale * grad and the respaced
    posterior variance is larger, so fewer steps inject comparable total
    guidance; this pins the claim with a measured Chamfer gate at the same
    threshold as the full fit."""
    engine = toy_system
    target_mesh = sphere_mesh(center_x=0.1, radius=0.42)

    engine.fit_real_shape(
        mesh=target_mesh, center_mesh=False, path=str(tmp_path), fit_steps=10
    )
    assert engine.last_phase_walls["fit_steps"] == 10
    recon = engine.mesh0
    assert recon is not None and len(recon.vertices) > 0, "fast fit: no surface"
    cd = chamfer_distance(target_mesh, recon, 20_000)
    assert cd < 0.06, f"fast fit chamfer {cd:.4f} too high"
