"""Image post-processing helpers (reference: meshProcess.py:161-252):
alpha-aware cropping of render batches, per-image bbox crops, downsampling,
png->jpg with white background. PIL + numpy, no Open3D/skimage."""

from __future__ import annotations

import os

import numpy as np
from PIL import Image


def _read_rgba(path: str) -> np.ndarray:
    return np.asarray(Image.open(path).convert("RGBA"))


def crop_images_rgba(path: str) -> None:
    """Crop every image in a directory to the union alpha bbox
    (reference: meshProcess.py:161-177); writes to ``<path>/Resize``."""
    names = [n for n in sorted(os.listdir(path)) if n.endswith((".png", ".jpg"))]
    images = np.stack([_read_rgba(os.path.join(path, n)) for n in names])
    alpha = (images[..., -1] > 0).max(axis=0)  # [h, w]
    xs = np.nonzero(alpha.max(axis=0))[0]
    ys = np.nonzero(alpha.max(axis=1))[0]
    left, right = xs[0], xs[-1]
    top, bottom = ys[0], ys[-1]
    out_dir = os.path.join(path, "Resize")
    os.makedirs(out_dir, exist_ok=True)
    for n, img in zip(names, images):
        Image.fromarray(img[top : bottom + 1, left : right + 1]).save(
            os.path.join(out_dir, n)
        )


def crop_images_rgba_each(path: str, save_format: str = "png") -> None:
    """Per-image alpha-bbox crop (reference: meshProcess.py:181-209)."""
    for name in sorted(os.listdir(path)):
        if not name.endswith((".png", ".jpg")):
            continue
        img = _read_rgba(os.path.join(path, name))
        alpha = img[..., -1] > 0
        if not alpha.any():
            continue
        xs = np.nonzero(alpha.max(axis=0))[0]
        ys = np.nonzero(alpha.max(axis=1))[0]
        crop = img[ys[0] : ys[-1] + 1, xs[0] : xs[-1] + 1]
        if save_format == "png":
            out = os.path.join(path, "png")
            os.makedirs(out, exist_ok=True)
            Image.fromarray(crop).save(os.path.join(out, name))
        elif save_format == "jpg":
            out = os.path.join(path, "jpg")
            os.makedirs(out, exist_ok=True)
            im = Image.fromarray(crop)
            bg = Image.new("RGB", im.size, (255, 255, 255))
            bg.paste(im, mask=im.split()[3])
            bg.save(os.path.join(out, name.replace(".png", ".jpg")), "JPEG")
        else:
            raise NotImplementedError("Unsupported image format")


def down_sample(path: str, factor: float = 0.5) -> None:
    """Halve every image into ``<path>/DownSample``
    (reference: meshProcess.py:212-219)."""
    out = os.path.join(path, "DownSample")
    os.makedirs(out, exist_ok=True)
    for name in sorted(os.listdir(path)):
        full = os.path.join(path, name)
        if not os.path.isfile(full):
            continue
        img = Image.open(full)
        img.resize((int(img.size[0] * factor), int(img.size[1] * factor))).save(
            os.path.join(out, name)
        )


def png_to_jpg(path: str) -> None:
    """RGBA png -> white-background jpg (reference: meshProcess.py:239-252)."""
    for name in sorted(os.listdir(path)):
        if not name.endswith(".png"):
            continue
        img = Image.open(os.path.join(path, name)).convert("RGBA")
        bg = Image.new("RGB", img.size, (255, 255, 255))
        bg.paste(img, mask=img.split()[3])
        bg.save(os.path.join(path, name).replace(".png", ".jpg"), "JPEG")
