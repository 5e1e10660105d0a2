"""End-to-end smoke of the batched editing CLI on the tiny preset."""

import os

import numpy as np

from ishapediting_tpu.cli.batch_edit import main as batch_main
from ishapediting_tpu.cli.edit import parse_edit_log


def test_batch_edit_cli_generated(tmp_path):
    out = tmp_path / "out"
    batch_main(
        [
            "--random_init",
            "--preset", "tiny",
            "--latent_seed", "1",
            "--latent_seed", "2",
            "--source", "0.2", "0", "0",
            "--target", "0.4", "0", "0",
            "--scale", "30",
            "--noise_mode", "replay",
            "--out", str(out),
        ]
    )
    for name in ("original01.obj", "original02.obj", "edit01.obj", "edit02.obj"):
        assert (out / name).exists(), name
    log = parse_edit_log(str(out / "EditLog"))
    assert set(log) == {"01", "02"}
    np.testing.assert_allclose(log["01"]["sources"], [[0.2, 0, 0]])
    np.testing.assert_allclose(log["02"]["targets"], [[0.4, 0, 0]])


def test_batch_edit_cli_fast_edit(tmp_path, capsys):
    # --edit_steps respaces the batched walk (and forces resample noise
    # even though the CLI default is replay)
    out = tmp_path / "out"
    batch_main(
        [
            "--random_init",
            "--preset", "tiny",
            "--latent_seed", "1",
            "--source", "0.2", "0", "0",
            "--target", "0.4", "0", "0",
            "--scale", "30",
            "--edit_steps", "3",
            "--out", str(out),
        ]
    )
    assert (out / "edit01.obj").exists()
    text = capsys.readouterr().out
    assert "fast editing: 3 of" in text and "resample" in text


def test_batch_edit_cli_validates_args(tmp_path):
    import pytest

    with pytest.raises(SystemExit):
        batch_main(["--random_init", "--preset", "tiny", "--out", str(tmp_path)])
    with pytest.raises(SystemExit):
        batch_main(
            ["--random_init", "--preset", "tiny", "--latent_seed", "1",
             "--out", str(tmp_path)]
        )
