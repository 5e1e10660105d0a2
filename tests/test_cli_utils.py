import json
import os

import numpy as np
import pytest

from ishapediting_tpu.cli.edit import parse_edit_log, write_edit_log
from ishapediting_tpu.utils.logger import KVLogger, configure


def test_edit_log_roundtrip(tmp_path):
    path = str(tmp_path / "EditLog")
    src = np.array([[0.1, 0.2, 0.3], [-0.4, 0.5, -0.6]], np.float32)
    tgt = np.array([[0.2, 0.2, 0.3], [-0.4, 0.6, -0.6]], np.float32)
    write_edit_log(path, "01", src, tgt, 1200, 0.4)
    write_edit_log(path, "02", src[:1], tgt[:1], 600, 0.2)
    edits = parse_edit_log(path)
    assert set(edits) == {"01", "02"}
    np.testing.assert_allclose(edits["01"]["sources"], src, atol=1e-6)
    np.testing.assert_allclose(edits["01"]["targets"], tgt, atol=1e-6)
    assert edits["01"]["scale"] == 1200
    assert edits["01"]["lam"] == 0.4
    assert edits["02"]["sources"].shape == (1, 3)


def test_kv_logger_writers(tmp_path, capsys):
    logger = KVLogger(str(tmp_path), formats=("stdout", "json", "csv"))
    logger.logkv("loss", 1.5)
    logger.logkv_mean("acc", 1.0)
    logger.logkv_mean("acc", 0.0)
    with logger.profile_kv("fwd"):
        pass
    out = logger.dumpkvs()
    assert out["loss"] == 1.5
    assert out["acc"] == pytest.approx(0.5)
    assert "time/fwd" in out
    captured = capsys.readouterr().out
    assert "loss" in captured
    with open(tmp_path / "progress.jsonl") as f:
        rec = json.loads(f.readline())
    assert rec["loss"] == 1.5
    assert os.path.exists(tmp_path / "progress.csv")


def test_logger_profile_decorator():
    logger = KVLogger(None)

    @logger.profile("work")
    def work():
        return 42

    assert work() == 42
    out = logger.dumpkvs()
    assert "time/work" in out


def test_orbax_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp

    from ishapediting_tpu.io.checkpoint import load_params, save_params

    params = {"a": {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.ones(3)}}
    path = str(tmp_path / "ckpt.orbax")
    save_params(path, params)
    back = load_params(path, target=params)
    np.testing.assert_array_equal(np.asarray(back["a"]["w"]), np.asarray(params["a"]["w"]))


def test_generate_cli_smoke(tmp_path):
    """Tiny end-to-end CLI run with random init (CPU)."""
    import ishapediting_tpu.cli.generate as gen

    gen.main([
        "--random_init",
        "--preset", "tiny",
        "--num_samples", "2",
        "--batch_size", "2",
        "--num_steps", "5",
        "--use_ddim",
        "--shape_resolution", "16",
        "--save_dir", str(tmp_path),
    ])
    assert os.path.exists(tmp_path / "triplanes" / "0.npy")
    assert os.path.exists(tmp_path / "triplanes" / "1.npy")
    tri = np.load(tmp_path / "triplanes" / "0.npy")
    assert tri.shape == (6, 16, 16)  # NCHW reference contract
    assert os.path.exists(tmp_path / "objects" / "0.obj")


def test_generate_cli_save_intermediate(tmp_path):
    """Per-step snapshot hooks (reference save_intermediate,
    image_sample.py:70-102): dumps <obj>_it<idx>.npy at the requested loop
    indices, in NCHW physical scale; the last-index snapshot must equal the
    final saved triplane."""
    import ishapediting_tpu.cli.generate as gen

    gen.main([
        "--random_init", "--preset", "tiny",
        "--num_samples", "2", "--batch_size", "2",
        "--num_steps", "5", "--skip_decode",
        "--save_intermediate", "0,2,4",
        "--save_dir", str(tmp_path),
    ])
    for obj in (0, 1):
        for idx in (0, 2, 4):
            path = tmp_path / "intermediate_tensors" / f"{obj}_it{idx}.npy"
            assert path.exists(), path
    last = np.load(tmp_path / "intermediate_tensors" / "0_it4.npy")
    final = np.load(tmp_path / "triplanes" / "0.npy")
    assert last.shape == final.shape  # NCHW
    np.testing.assert_allclose(last, final, atol=1e-5)


def test_save_intermediate_same_samples_as_plain_run(tmp_path):
    """--save_intermediate hand-mirrors sample_sharded's rng derivation
    (x_T from PRNGKey(seed+batch), loop rng from fold_in(key, 1)); this
    pins the 'SAME samples as a plain run' guarantee so any future change
    to either derivation fails loudly instead of silently dumping
    intermediates of different samples."""
    import ishapediting_tpu.cli.generate as gen

    common = [
        "--random_init", "--preset", "tiny",
        "--num_samples", "2", "--batch_size", "2",
        "--num_steps", "5", "--skip_decode", "--seed", "11",
    ]
    gen.main(common + ["--save_dir", str(tmp_path / "plain")])
    gen.main(
        common
        + ["--save_intermediate", "4", "--save_dir", str(tmp_path / "snap")]
    )
    for obj in (0, 1):
        a = np.load(tmp_path / "plain" / "triplanes" / f"{obj}.npy")
        b = np.load(tmp_path / "snap" / "triplanes" / f"{obj}.npy")
        np.testing.assert_allclose(a, b, atol=1e-5)


def test_snapshot_loop_matches_plain_loop():
    """p_sample_loop_snapshots must produce the same final sample as
    p_sample_loop under the same rng, and its snapshot buffer must hold the
    post-step samples at the requested loop indices."""
    import jax
    from ishapediting_tpu.core.diffusion import (
        p_sample_loop,
        p_sample_loop_snapshots,
    )
    from ishapediting_tpu.core.schedule import make_schedule
    from tests.test_diffusion import SHAPE, toy_model

    sched = make_schedule(1000, "linear", "10")
    x_T = jax.random.normal(jax.random.PRNGKey(0), SHAPE)
    rng = jax.random.PRNGKey(1)
    plain = p_sample_loop(sched, toy_model, x_T, rng)
    out = p_sample_loop_snapshots(
        sched, toy_model, x_T, rng, snapshot_steps=(0, 4, 9)
    )
    np.testing.assert_allclose(
        np.asarray(out["sample"]), np.asarray(plain), atol=1e-6
    )
    # last loop index (9 of 10 steps) is the final sample
    np.testing.assert_allclose(
        np.asarray(out["snapshots"][2]), np.asarray(plain), atol=1e-6
    )
    # snapshots are distinct along the trajectory
    assert np.abs(np.asarray(out["snapshots"][0] - out["snapshots"][2])).max() > 0


def test_distributed_mean_kvs_single_process():
    from ishapediting_tpu.utils.logger import distributed_mean_kvs

    out = distributed_mean_kvs({"loss": 1.5, "acc": 0.5})
    assert out == {"loss": 1.5, "acc": 0.5}


def test_generate_cli_tiny_default_steps(tmp_path):
    """Regression: default --num_steps must not crash the tiny preset
    (preset clamps; the CLI must not re-apply respacing)."""
    import ishapediting_tpu.cli.generate as gen

    gen.main([
        "--random_init", "--preset", "tiny",
        "--num_samples", "1", "--batch_size", "1",
        "--shape_resolution", "8", "--skip_decode",
        "--save_dir", str(tmp_path),
    ])
    assert os.path.exists(tmp_path / "triplanes" / "0.npy")


def test_generate_cli_use_dpm(tmp_path):
    """--use_dpm routes sampling through dpm_solver_sample_loop (ddim-style
    respacing grid) and still writes the triplane contract; combining it
    with --save_intermediate is rejected loudly (the snapshot loop covers
    ddpm/ddim only)."""
    import pytest

    import ishapediting_tpu.cli.generate as gen

    gen.main([
        "--random_init", "--preset", "tiny",
        "--num_samples", "1", "--batch_size", "1",
        "--num_steps", "5", "--use_dpm", "--skip_decode",
        "--save_dir", str(tmp_path),
    ])
    tri = np.load(tmp_path / "triplanes" / "0.npy")
    assert np.isfinite(tri).all()
    with pytest.raises(SystemExit):
        gen.main([
            "--random_init", "--preset", "tiny",
            "--num_samples", "1", "--batch_size", "1",
            "--num_steps", "5", "--use_dpm", "--skip_decode",
            "--save_intermediate", "0", "--save_dir", str(tmp_path),
        ])


def test_generate_cli_dpm_reports_realized_steps(tmp_path, capsys):
    """Duplicate log-SNR snaps collapse near the base count — the CLI must
    tell the user the realized step count (VERDICT r3 next-item 6): on the
    tiny preset's 100-step base, requesting 25 realizes 24."""
    import ishapediting_tpu.cli.generate as gen

    gen.main([
        "--random_init", "--preset", "tiny",
        "--num_samples", "1", "--batch_size", "1",
        "--num_steps", "25", "--use_dpm", "--skip_decode",
        "--save_dir", str(tmp_path),
    ])
    out = capsys.readouterr().out
    assert (
        "dpm respacing: requested 25 steps, realized 24 "
        "(duplicate log-SNR snaps collapsed)" in out
    )


def test_generate_cli_sharded_decode_matches_plain(tmp_path):
    """--sharded_decode (one grid per device) writes the same meshes as the
    sequential per-sample path — same samples, same fp16-quantized grid,
    same marching."""
    import ishapediting_tpu.cli.generate as gen
    from ishapediting_tpu.geometry.mesh import TriMesh

    common = [
        "--random_init", "--preset", "tiny",
        "--num_samples", "2", "--batch_size", "2",
        "--shape_resolution", "16",
    ]
    gen.main(common + ["--save_dir", str(tmp_path / "plain")])
    gen.main(common + ["--sharded_decode", "--save_dir", str(tmp_path / "sh")])
    for i in range(2):
        a = TriMesh.read(tmp_path / "plain" / "objects" / f"{i}.obj")
        b = TriMesh.read(tmp_path / "sh" / "objects" / f"{i}.obj")
        assert len(a.vertices) == len(b.vertices) > 0
        np.testing.assert_allclose(a.vertices, b.vertices, atol=1e-5)


def test_snapshot_steps_out_of_range_is_value_error():
    """--save_intermediate indices past the chain length raise ValueError
    (user-facing validation, not an assert that python -O strips)."""
    import jax
    import pytest

    from ishapediting_tpu.core.diffusion import p_sample_loop_snapshots
    from ishapediting_tpu.core.schedule import make_schedule
    from tests.test_diffusion import SHAPE, toy_model

    sched = make_schedule(1000, "linear", "10")
    x_T = jax.random.normal(jax.random.PRNGKey(0), SHAPE)
    with pytest.raises(ValueError, match="loop indices"):
        p_sample_loop_snapshots(
            sched, toy_model, x_T, jax.random.PRNGKey(1),
            snapshot_steps=(100,),
        )


def test_decode_cli_single_and_layouts(tmp_path):
    """cli.decode mirrors the reference visualize.py main() contract
    (visualize.py:108-128): triplane .npy -> .obj via the decoder. NCHW
    [3C,H,W] (the generate.py save format), [3,C,H,W], and our NHWC
    [3,H,W,C] must all decode to the identical mesh."""
    import ishapediting_tpu.cli.decode as dec

    rng = np.random.RandomState(0)
    nhwc = rng.randn(3, 8, 8, 32).astype(np.float32) * 2
    nchw = nhwc.transpose(0, 3, 1, 2)
    flat = nchw.reshape(96, 8, 8)
    paths = {}
    for name, arr in [("nhwc", nhwc), ("nchw", nchw), ("flat", flat)]:
        p = tmp_path / f"{name}.npy"
        np.save(p, arr)
        paths[name] = str(p)

    meshes = {}
    for name, p in paths.items():
        out = str(tmp_path / f"{name}.obj")
        dec.main(["--input", p, "--output", out,
                  "--random_init", "--res", "12"])
        assert os.path.exists(out)
        from ishapediting_tpu.geometry.mesh import TriMesh

        meshes[name] = TriMesh.read(out)
    ref = meshes["nhwc"]
    assert len(ref.vertices) > 0
    for name in ("nchw", "flat"):
        np.testing.assert_allclose(
            meshes[name].vertices, ref.vertices, atol=1e-5
        )


def test_decode_cli_multi_input_smooth_cross_section(tmp_path):
    """Directory mode: multiple inputs write <stem>.obj each (one decoder /
    one compiled grid program); --smooth and --cross_section engage."""
    import ishapediting_tpu.cli.decode as dec

    rng = np.random.RandomState(1)
    inputs = []
    for i in range(2):
        p = tmp_path / f"tri{i}.npy"
        np.save(p, rng.randn(96, 8, 8).astype(np.float32) * 2)
        inputs.append(str(p))
    out_dir = tmp_path / "objs"
    dec.main(["--input", *inputs, "--output", str(out_dir),
              "--random_init", "--res", "12", "--smooth", "2",
              "--cross_section", "unused-in-dir-mode"])
    for i in range(2):
        assert (out_dir / f"tri{i}.obj").exists()
        assert (out_dir / f"tri{i}_cross.png").exists()


def test_decode_cli_rejects_bad_shape(tmp_path):
    import ishapediting_tpu.cli.decode as dec

    p = tmp_path / "bad.npy"
    np.save(p, np.zeros((5, 8, 8), np.float32))
    with pytest.raises(SystemExit, match="not divisible by 3"):
        dec.main(["--input", str(p), "--output", str(tmp_path / "x.obj"),
                  "--random_init"])


def test_decode_cli_flat_cube_planes_are_nchw(tmp_path):
    """The flattened [3C,H,W] input's layout is KNOWN (generate.py saves
    NCHW) — it must transpose unconditionally even when C == H makes the
    4-dim heuristic ambiguous ([96,32,32] -> planes [3,32,32,32])."""
    import ishapediting_tpu.cli.decode as dec
    from ishapediting_tpu.geometry.mesh import TriMesh

    rng = np.random.RandomState(2)
    nhwc = rng.randn(3, 32, 32, 32).astype(np.float32)
    flat = nhwc.transpose(0, 3, 1, 2).reshape(96, 32, 32)
    p_flat = tmp_path / "flat.npy"
    p_nhwc = tmp_path / "cube_nhwc.npy"
    np.save(p_flat, flat)
    np.save(p_nhwc, nhwc)
    for name in ("flat", "cube_nhwc"):
        dec.main(["--input", str(tmp_path / f"{name}.npy"),
                  "--output", str(tmp_path / f"{name}.obj"),
                  "--random_init", "--res", "12"])
    a = TriMesh.read(str(tmp_path / "flat.obj"))
    b = TriMesh.read(str(tmp_path / "cube_nhwc.obj"))
    np.testing.assert_allclose(a.vertices, b.vertices, atol=1e-5)
