"""Typed-config parity with the reference's flag vocabulary
(reference: script_util.py:10-71,132-187; generate.py:64-71)."""

import numpy as np
import pytest

from ishapediting_tpu.config import UNetConfig, preset
from ishapediting_tpu.models.unet import build_layout


def test_published_model_defaults():
    cfg = UNetConfig()
    ref = UNetConfig.from_reference_args()  # reference defaults
    assert cfg == ref
    assert cfg.channel_mult == (1, 1, 2, 3, 4)
    assert cfg.attention_ds == (4, 8, 16)  # 32,16,8 resolutions at 128^2
    assert cfg.out_channels == 192  # learn_sigma doubles 96


@pytest.mark.parametrize(
    "image_size,mult",
    [
        (64, (1, 2, 3, 4)),
        (128, (1, 1, 2, 3, 4)),
        (256, (1, 1, 2, 2, 4, 4)),
        (512, (0.5, 1, 1, 2, 2, 4, 4)),
    ],
)
def test_channel_mult_table(image_size, mult):
    """The per-image-size channel_mult table (script_util.py:157-170),
    including the fractional 512 entry."""
    cfg = UNetConfig.from_reference_args(
        image_size=image_size, attention_resolutions=f"{image_size // 4}"
    )
    assert cfg.channel_mult == mult
    layout = build_layout(cfg)
    # first level width = int(mult[0] * model_channels), never zero
    first_res = layout.input_blocks[1][0]
    assert first_res.out_ch == int(mult[0] * cfg.model_channels)
    assert first_res.out_ch > 0


def test_explicit_channel_mult_string():
    cfg = UNetConfig.from_reference_args(
        image_size=32, channel_mult="1,2,4", attention_resolutions="8"
    )
    assert cfg.channel_mult == (1, 2, 4)
    assert cfg.attention_ds == (4,)


def test_learn_sigma_false_keeps_out_channels():
    cfg = UNetConfig.from_reference_args(learn_sigma=False)
    assert cfg.out_channels == cfg.in_channels == 96


def test_preset_rejects_unknown_category():
    with pytest.raises(ValueError):
        preset("boats")


def test_preset_respacing_strings():
    assert preset("chairs", 200).diffusion.timestep_respacing == "200"
    assert preset("cars", 50, use_ddim=True).diffusion.timestep_respacing == "ddim50"
    tiny = preset("tiny", num_steps=999)
    assert tiny.diffusion.timestep_respacing == "10"  # capped for smoke runs
