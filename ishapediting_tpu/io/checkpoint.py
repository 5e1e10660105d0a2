"""Orbax save/load of converted parameters + train state.

The reference only loads torch checkpoints (dist_util.py:56-76); we add a
native JAX format so converted weights load in milliseconds instead of
re-converting, plus train-state checkpoint/resume for the training path
(SURVEY.md §5.4 plan)."""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax


def save_params(path: str, params: Dict) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params, force=True)
    ckptr.wait_until_finished()


def load_params(path: str, target: Optional[Dict] = None) -> Dict:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if target is not None:
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), target
        )
        return ckptr.restore(path, abstract)
    return ckptr.restore(path)


def convert_model_dir(main_path: str, out_path: Optional[str] = None) -> str:
    """One-shot: torch category dir -> orbax checkpoints next to it."""
    from ishapediting_tpu.io.model_dir import discover_model_dir
    from ishapediting_tpu.io.torch_convert import (
        load_torch_checkpoint,
        load_torch_decoder,
    )

    info = discover_model_dir(main_path)
    out_path = out_path or main_path
    unet = load_torch_checkpoint(info.unet_ckpt)
    save_params(os.path.join(out_path, "unet.orbax"), unet)
    dec = load_torch_decoder(info.decoder_ckpt)
    save_params(os.path.join(out_path, "decoder.orbax"), dec)
    return out_path
