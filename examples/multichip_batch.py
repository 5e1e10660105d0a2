"""End-to-end multi-chip batch editing demo (runs on a virtual CPU mesh).

Demonstrates the framework's whole parallel surface on N independent
shapes, each stage a single sharded program over the (data, model) mesh:

  1. sample N latents            (parallel.sampling.sample_sharded)
  2. edit-friendly inversion     (edit.batch.invert_batched)
  3. guided drag of all N shapes (edit.batch.drag_edit_batched, replay mode)
  4. decode N grids, one/device  (parallel.decode.decode_grids_batched)
  5. host marching + .obj export

The reference is strictly single-shape, single-GPU (drag_utils.py:303-304
raises for num_samples > 1; generate.py decodes sequentially).

By default this pins an 8-device virtual CPU mesh so it runs anywhere:

    python examples/multichip_batch.py --out /tmp/multichip

On a real TPU pod slice, pass --real_devices to use every visible chip.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/multichip")
    ap.add_argument("--shapes", type=int, default=8)
    ap.add_argument("--real_devices", action="store_true",
                    help="use the visible accelerator devices instead of "
                         "pinning an 8-device virtual CPU mesh")
    args = ap.parse_args()

    if not args.real_devices:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    if not args.real_devices:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from ishapediting_tpu.config import preset
    from ishapediting_tpu.core.schedule import make_schedule
    from ishapediting_tpu.edit.batch import (
        build_batched_problems,
        drag_edit_batched,
        invert_batched,
    )
    from ishapediting_tpu.edit.fit import latents_to_planes
    from ishapediting_tpu.geometry.marching import grid_to_mesh
    from ishapediting_tpu.models.unet import init_unet_params, unet_apply
    from ishapediting_tpu.parallel.decode import decode_grids_batched
    from ishapediting_tpu.parallel.mesh import make_mesh
    from ishapediting_tpu.parallel.sampling import sample_sharded

    n = args.shapes
    n_dev = len(jax.devices())
    if n % n_dev:
        sys.exit(f"--shapes {n} must divide by the {n_dev} devices")
    cfg = preset("tiny")
    sched = make_schedule(
        cfg.diffusion.base_steps,
        cfg.diffusion.noise_schedule,
        cfg.diffusion.timestep_respacing,
    )
    mesh = make_mesh(n_dev, model_parallel=2 if n_dev % 2 == 0 and n_dev >= 4 else 1)
    dp = mesh.shape["data"]
    if n % dp:
        sys.exit(f"--shapes {n} must divide by the data axis ({dp})")
    params = init_unet_params(jax.random.PRNGKey(0), cfg.unet)

    def model_fn_p(p, x, t):
        return unet_apply(cfg.unet, p, x, t, feat_layer=cfg.edit.feat_layer)

    print(f"mesh: data={dp} x model={mesh.shape['model']}  shapes: {n}")

    t0 = time.time()
    latents = sample_sharded(
        sched, None, mesh, batch_size=n, latent_shape=cfg.latent_shape,
        rng=jax.random.PRNGKey(1), model_fn_p=model_fn_p, params=params,
    )
    print(f"1. sampled {n} latents          {time.time()-t0:6.1f}s")

    t0 = time.time()
    inv = invert_batched(
        sched, model_fn_p, params, jnp.asarray(latents),
        jax.random.PRNGKey(2), w_time=cfg.edit.w_time, mesh=mesh,
    )
    err = float(jnp.max(jnp.abs(inv["sample"] - latents)))
    print(f"2. inverted (replay err {err:.1e}) {time.time()-t0:6.1f}s")

    t0 = time.time()
    src = [np.array([[0.1, 0.0, 0.0]], np.float32) for _ in range(n)]
    tgt = [s + np.array([[0.2, 0.0, 0.0]], np.float32) for s in src]
    problems = build_batched_problems(
        src, tgt, r1=cfg.edit.r1, voxel_size=cfg.edit.voxel_size,
        feat_width=inv["features"].shape[-2],
    )
    edited = drag_edit_batched(
        sched, model_fn_p, params, inv["w"], inv["features"], problems,
        jax.random.PRNGKey(3), w_time=cfg.edit.w_time, scale=50.0, cof=0.2,
        mesh=mesh, noise_mode="replay",
        variances_batch=inv["variances"],
        variance_noise_batch=inv["variance_noise"],
    )
    delta = float(jnp.abs(edited[:, 0] - latents).mean())
    print(f"3. dragged {n} shapes (|d|={delta:.4f}) {time.time()-t0:6.1f}s")

    t0 = time.time()
    # decoder is random here (no checkpoints in the demo); grids still
    # exercise the real sharded decode path
    from ishapediting_tpu.ops.triplane import init_decoder_params

    dec = init_decoder_params(
        jax.random.PRNGKey(4), in_channels=cfg.plane_channels
    )
    half_range = jnp.ones((), jnp.float32)
    middle = jnp.zeros((), jnp.float32)
    planes_b = latents_to_planes(edited[:, 0], half_range, middle)
    grids = decode_grids_batched(
        dec, planes_b, mesh, res=cfg.edit.shape_resolution,
        out_dtype=jnp.float16,
    )
    os.makedirs(args.out, exist_ok=True)
    n_written = 0
    for i in range(n):
        mesh_i = grid_to_mesh(
            np.asarray(grids[i]).astype(np.float32), iso=0.0, to_unit=True
        )
        if len(mesh_i.triangles):
            mesh_i.write(os.path.join(args.out, f"{i}.obj"))
            n_written += 1
    print(f"4. decoded {n} grids, wrote {n_written} meshes "
          f"{time.time()-t0:6.1f}s -> {args.out}")


if __name__ == "__main__":
    main()
