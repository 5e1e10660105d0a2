"""Model-directory discovery + normalization statistics.

Mirrors the reference's per-category asset layout contract
(reference: drag_utils.py:213-228, normalization.py:6-15):

    models/<category>/
      ddpm_*_ckpts/ema_*.pt          DDPM EMA UNet state_dict
      *_decoder.pt  (any *.pt)       decoder MLP state_dict
      statistics/<name>/{lower_bound,upper_bound,means,stds}.npy

Also accepts pre-converted JAX checkpoints saved by io/checkpoint.py
(``unet.orbax/`` & ``decoder.orbax/`` directories) in the same folder.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, Optional, Tuple

import numpy as np


@dataclasses.dataclass
class ModelDir:
    root: str
    unet_ckpt: Optional[str] = None  # torch .pt
    decoder_ckpt: Optional[str] = None  # torch .pt
    stats_dir: Optional[str] = None
    unet_orbax: Optional[str] = None
    decoder_orbax: Optional[str] = None


def discover_model_dir(main_path: str) -> ModelDir:
    """Scan a category directory for checkpoints + stats
    (reference: drag_utils.py:216-226)."""
    info = ModelDir(root=main_path)
    for name in sorted(os.listdir(main_path)):
        full = os.path.join(main_path, name)
        if name.startswith("ddpm") and os.path.isdir(full):
            for sub in sorted(os.listdir(full)):
                if sub.startswith("ema"):
                    info.unet_ckpt = os.path.join(full, sub)
                    break
        elif name.endswith(".pt"):
            info.decoder_ckpt = full
        elif name == "statistics" and os.path.isdir(full):
            subdirs = sorted(os.listdir(full))
            if subdirs:
                info.stats_dir = os.path.join(full, subdirs[0])
        elif name == "unet.orbax":
            info.unet_orbax = full
        elif name == "decoder.orbax":
            info.decoder_orbax = full
    return info


@dataclasses.dataclass(frozen=True)
class TriplaneStats:
    """Per-channel affine between normalized latents x in [-1,1] and physical
    triplane features: ``tri = x * half_range + middle``
    (reference: drag_utils.py:236-245, normalization.py:6-15).

    Arrays are [C] (C = 96); ``means``/``stds`` are the alternative z-score
    stats used by the direct-Adam fit (reference: drag_utils.py:504-507).
    """

    half_range: np.ndarray
    middle: np.ndarray
    means: Optional[np.ndarray] = None
    stds: Optional[np.ndarray] = None

    @staticmethod
    def identity(channels: int = 96) -> "TriplaneStats":
        return TriplaneStats(
            half_range=np.ones(channels, np.float32),
            middle=np.zeros(channels, np.float32),
        )


def load_stats(stats_dir: str) -> TriplaneStats:
    lower = np.load(os.path.join(stats_dir, "lower_bound.npy")).astype(np.float32).reshape(-1)
    upper = np.load(os.path.join(stats_dir, "upper_bound.npy")).astype(np.float32).reshape(-1)
    means = stds = None
    means_path = os.path.join(stats_dir, "means.npy")
    stds_path = os.path.join(stats_dir, "stds.npy")
    if os.path.exists(means_path):
        means = np.load(means_path).astype(np.float32).reshape(-1)
    if os.path.exists(stds_path):
        stds = np.load(stds_path).astype(np.float32).reshape(-1)
    return TriplaneStats(
        half_range=(upper - lower) / 2.0,
        middle=(upper + lower) / 2.0,
        means=means,
        stds=stds,
    )


def unnormalize(sample: np.ndarray, stats: TriplaneStats) -> np.ndarray:
    """Map normalized latent [-1,1] to physical triplane features, channels
    last (reference: normalization.py:6-15 maps NCHW; we are NHWC)."""
    return sample * stats.half_range + stats.middle
