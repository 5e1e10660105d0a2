"""Converter round-trip: build a torch module graph *by shape contract* (ADM
state_dict naming), convert, and check the tree matches our init exactly."""

import numpy as np
import torch
import jax
import jax.numpy as jnp

from ishapediting_tpu.config import UNetConfig
from ishapediting_tpu.io.torch_convert import (
    convert_decoder_state_dict,
    convert_torch_state_dict,
)
from ishapediting_tpu.models.unet import init_unet_params
from tests.test_unet import TINY


def _torch_state_dict_from_params(params):
    """Invert our conversion rules to synthesize a torch-style state_dict."""
    sd = {}
    for prefix, entry in params.items():
        if "scale" in entry:  # GroupNorm
            sd[f"{prefix}.weight"] = torch.from_numpy(np.asarray(entry["scale"]))
            sd[f"{prefix}.bias"] = torch.from_numpy(np.asarray(entry["bias"]))
        elif "w" in entry:
            w = np.asarray(entry["w"])
            if w.ndim == 4:  # HWIO -> OIHW
                sd[f"{prefix}.weight"] = torch.from_numpy(w.transpose(3, 2, 0, 1).copy())
            elif prefix == "label_emb":
                sd[f"{prefix}.weight"] = torch.from_numpy(w.copy())
            elif prefix.endswith((".qkv", ".proj_out")):  # Conv1d (O, I, 1)
                sd[f"{prefix}.weight"] = torch.from_numpy(w.T[:, :, None].copy())
            else:  # Linear (O, I)
                sd[f"{prefix}.weight"] = torch.from_numpy(w.T.copy())
            if "b" in entry:
                sd[f"{prefix}.bias"] = torch.from_numpy(np.asarray(entry["b"]))
        else:
            for leaf, v in entry.items():
                sd[f"{prefix}.{leaf}"] = torch.from_numpy(np.asarray(v))
    return sd


def test_unet_convert_roundtrip():
    params = init_unet_params(jax.random.PRNGKey(0), TINY)
    sd = _torch_state_dict_from_params(params)
    back = convert_torch_state_dict(sd)
    assert set(back.keys()) == set(params.keys())
    for prefix in params:
        assert set(back[prefix].keys()) == set(params[prefix].keys()), prefix
        for leaf in params[prefix]:
            np.testing.assert_array_equal(
                np.asarray(back[prefix][leaf]), np.asarray(params[prefix][leaf]),
                err_msg=f"{prefix}.{leaf}",
            )


def test_unet_convert_published_key_vocabulary():
    """The published checkpoint's key set must be exactly the converter's
    expected vocabulary: synthesize from the full-size config and convert."""
    cfg = UNetConfig(compute_dtype="float32")
    # Avoid materializing 421M params: just check a few representative keys
    # exist in the layout-derived init for a scaled-down but same-topology cfg.
    small = UNetConfig(
        image_size=32,
        model_channels=8,
        in_channels=6,
        out_channels=12,
        channel_mult=(1, 1, 2, 3, 4),
        num_res_blocks=2,
        attention_ds=(4, 8, 16),
        num_head_channels=4,
        compute_dtype="float32",
    )
    params = init_unet_params(jax.random.PRNGKey(0), small)
    keys = set(params.keys())
    # The reference state_dict for this topology contains these module prefixes
    for expect in [
        "time_embed.0",
        "time_embed.2",
        "input_blocks.0.0",
        "input_blocks.1.0.in_layers.0",
        "input_blocks.1.0.in_layers.2",
        "input_blocks.1.0.emb_layers.1",
        "input_blocks.1.0.out_layers.0",
        "input_blocks.1.0.out_layers.3",
        "input_blocks.3.0.in_layers.0",  # down resblock
        "input_blocks.7.0.skip_connection",  # channel change 256->512 level
        "input_blocks.7.1.norm",  # first attention
        "input_blocks.7.1.qkv",
        "input_blocks.7.1.proj_out",
        "middle_block.0.in_layers.0",
        "middle_block.1.qkv",
        "middle_block.2.out_layers.3",
        "output_blocks.0.0.in_layers.0",
        "output_blocks.2.2.in_layers.0",  # up resblock appended after attn
        "output_blocks.14.0.out_layers.3",
        "out.0",
        "out.2",
    ]:
        assert expect in keys, expect
    assert cfg.out_channels == 192


def test_decoder_convert():
    sd = {
        "0._B": torch.randn(32, 64),
        "1.weight": torch.randn(128, 128),
        "1.bias": torch.randn(128),
        "3.weight": torch.randn(128, 128),
        "3.bias": torch.randn(128),
        "5.weight": torch.randn(1, 128),
        "5.bias": torch.randn(1),
    }
    dec = convert_decoder_state_dict(sd)
    assert dec["fourier_B"].shape == (32, 64)
    assert dec["dense1"]["w"].shape == (128, 128)
    assert dec["dense3"]["w"].shape == (128, 1)
    np.testing.assert_allclose(
        np.asarray(dec["dense3"]["w"]), sd["5.weight"].numpy().T
    )
