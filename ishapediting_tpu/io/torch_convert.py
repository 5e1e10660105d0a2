"""PyTorch EMA checkpoint -> JAX parameter pytree conversion.

The released NFD assets are torch ``state_dict`` files (reference loading:
drag_utils.py:229-230, dist_util.py:56-76). Our UNet parameter tree reuses
the torch dotted naming (see models/unet.py), so conversion is a mechanical
per-tensor layout change:

- Conv2d ``weight`` (O, I, kh, kw)  -> HWIO (kh, kw, I, O)
- Conv1d ``weight`` (O, I, 1)       -> dense (I, O)   [attention qkv/proj_out]
- Linear ``weight`` (O, I)          -> dense (I, O)
- GroupNorm ``weight``/``bias``     -> ``scale``/``bias``
- Embedding ``weight``              -> ``w``

The decoder MLP checkpoint (MultiTriplane.net, reference:
axisnetworks.py:526-535) converts with the same Linear rule plus the fixed
Fourier projection matrix ``_B``.
"""

from __future__ import annotations

from typing import Dict, Mapping

import jax.numpy as jnp
import numpy as np


def _np(t) -> np.ndarray:
    """torch.Tensor (possibly fp16) -> np.float32 without importing torch at
    module scope."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().float().numpy()
    return np.asarray(t, dtype=np.float32)


def convert_torch_state_dict(state_dict: Mapping[str, "np.ndarray"]) -> Dict:
    """Convert a torch UNet state_dict (ADM naming) to our params tree."""
    # Pass 1: group raw arrays by module prefix.
    raw: Dict[str, Dict[str, np.ndarray]] = {}
    for key, value in state_dict.items():
        prefix, leaf = key.rsplit(".", 1)
        raw.setdefault(prefix, {})[leaf] = _np(value)

    # Pass 2: classify each module by its weight rank and convert.
    params: Dict[str, Dict[str, jnp.ndarray]] = {}
    for prefix, leaves in raw.items():
        entry: Dict[str, jnp.ndarray] = {}
        w = leaves.get("weight")
        if w is None:
            # e.g. FourierFeatureTransform buffers or other raw tensors
            for leaf, arr in leaves.items():
                entry[leaf] = jnp.asarray(arr)
        elif w.ndim == 4:  # Conv2d OIHW -> HWIO
            entry["w"] = jnp.asarray(w.transpose(2, 3, 1, 0))
            if "bias" in leaves:
                entry["b"] = jnp.asarray(leaves["bias"])
        elif w.ndim == 3:  # Conv1d OI1 -> (I, O)
            entry["w"] = jnp.asarray(w[:, :, 0].T)
            if "bias" in leaves:
                entry["b"] = jnp.asarray(leaves["bias"])
        elif w.ndim == 2:
            if prefix == "label_emb":  # Embedding rows stay (N, D)
                entry["w"] = jnp.asarray(w)
            else:  # Linear OI -> (I, O)
                entry["w"] = jnp.asarray(w.T)
                if "bias" in leaves:
                    entry["b"] = jnp.asarray(leaves["bias"])
        elif w.ndim == 1:  # GroupNorm (or any norm) affine
            entry["scale"] = jnp.asarray(w)
            if "bias" in leaves:
                entry["bias"] = jnp.asarray(leaves["bias"])
        else:  # pragma: no cover
            raise ValueError(f"unhandled weight rank for {prefix}: {w.shape}")
        params[prefix] = entry
    return params


def load_torch_checkpoint(path: str) -> Dict:
    """Read a ``.pt`` state_dict with torch (CPU) and convert it."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]
    return convert_torch_state_dict(state)


def convert_decoder_state_dict(state_dict: Mapping[str, "np.ndarray"]) -> Dict:
    """Convert the MultiTriplane.net MLP state_dict (reference:
    axisnetworks.py:526-535) into decoder params for ops/triplane.py.

    torch keys: ``0._B`` (Fourier), ``1/3/5.weight|bias`` (Linears).
    """
    sd = {k: _np(v) for k, v in state_dict.items()}
    return {
        "fourier_B": jnp.asarray(sd["0._B"]),  # (32, 64)
        "dense1": {"w": jnp.asarray(sd["1.weight"].T), "b": jnp.asarray(sd["1.bias"])},
        "dense2": {"w": jnp.asarray(sd["3.weight"].T), "b": jnp.asarray(sd["3.bias"])},
        "dense3": {"w": jnp.asarray(sd["5.weight"].T), "b": jnp.asarray(sd["5.bias"])},
    }


def load_torch_decoder(path: str) -> Dict:
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    return convert_decoder_state_dict(state)
