"""Image output for FID evaluation sets.

Replaces the reference's per-image ``torchvision.utils.save_image`` loop
(/root/reference/scripts/sample_diffusion_ddim.py:201-205).  PNG batches go
through the native C++ thread-pool writer (eda_dm_tpu/native/imgio.cpp) so
deflate overlaps the next TPU sampling batch; PIL is the fallback when no
toolchain/libpng is present (and the path for non-png formats).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def to_uint8(images: np.ndarray) -> np.ndarray:
    """[0,1] float NHWC → uint8, rounding like torchvision save_image
    (mul(255).add_(0.5).clamp_(0,255))."""
    return np.clip(images * 255.0 + 0.5, 0, 255).astype(np.uint8)


def save_images(images: np.ndarray, out_dir: str, start_index: int = 0,
                fmt: str = "png", native: bool = True) -> int:
    """Write NHWC float images in [0,1] as {index}.png; returns count."""
    os.makedirs(out_dir, exist_ok=True)
    arr = to_uint8(images)
    paths = [os.path.join(out_dir, f"{start_index + i}.{fmt}")
             for i in range(arr.shape[0])]
    if native and fmt == "png":
        from ..native import write_png_batch
        if write_png_batch(arr, paths):
            return arr.shape[0]
    from PIL import Image
    for i in range(arr.shape[0]):
        Image.fromarray(arr[i]).save(paths[i])
    return arr.shape[0]


def make_grid(images: np.ndarray, nrow: int = 8, padding: int = 2,
              pad_value: float = 0.0) -> np.ndarray:
    """Tile NHWC float images into one (H', W', C) grid.

    Matches ``torchvision.utils.make_grid`` geometry (the reference's grid
    save, scripts/sample_diffusion_ldm_imagenet.py:255-265): ``nrow`` images
    per row, ``padding`` pixels between and around tiles.
    """
    n, h, w, c = images.shape
    ncol = min(nrow, n)
    nrows = -(-n // ncol)
    gh = nrows * (h + padding) + padding
    gw = ncol * (w + padding) + padding
    grid = np.full((gh, gw, c), pad_value, images.dtype)
    for i in range(n):
        r, col = divmod(i, ncol)
        y = r * (h + padding) + padding
        x = col * (w + padding) + padding
        grid[y:y + h, x:x + w] = images[i]
    return grid


def put_watermark(img_u8: np.ndarray, text: str = "StableDiffusionV1"
                  ) -> np.ndarray:
    """Embed an invisible watermark into a uint8 HWC image.

    Stand-in for the reference's imwatermark DWT-DCT encoder
    (sample_diffusion_ldm_imagenet.py:206-210, sample_txt2img.py watermark
    block; the imwatermark package is torch/cv2-bound): a ±1 LSB code on
    the blue channel — `[16-bit length | payload bits]`, tiled row-major —
    imperceptible (max error 1/255) and exactly recoverable with
    :func:`read_watermark`.
    """
    payload = text.encode("utf-8")
    bits = np.unpackbits(np.frombuffer(
        np.uint16(len(payload)).tobytes() + payload, np.uint8))
    out = img_u8.copy()
    blue = out[..., -1].reshape(-1)
    if bits.size > blue.size:
        raise ValueError("image too small for watermark payload")
    reps = blue.size // bits.size
    tiled = np.tile(bits, reps)
    blue[:tiled.size] = (blue[:tiled.size] & 0xFE) | tiled
    out[..., -1] = blue.reshape(out.shape[:-1])
    return out


def read_watermark(img_u8: np.ndarray) -> str:
    """Recover a :func:`put_watermark` payload (majority vote over tiles)."""
    blue = img_u8[..., -1].reshape(-1) & 1
    n_len = int(np.packbits(blue[:16]).view(np.uint16)[0])
    span = 16 + 8 * n_len
    reps = blue.size // span
    votes = blue[:reps * span].reshape(reps, span).mean(0) >= 0.5
    data = np.packbits(votes.astype(np.uint8))
    return data[2:2 + n_len].tobytes().decode("utf-8")


def save_grid(images: np.ndarray, path: str, nrow: int = 8,
              watermark: Optional[str] = None) -> None:
    """Save an image grid (float [0,1] NHWC) as one PNG, optionally
    watermarked (grid-{count}.png saves in the reference task scripts)."""
    from PIL import Image
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    grid = to_uint8(make_grid(images, nrow=nrow))
    if watermark:
        grid = put_watermark(grid, watermark)
    Image.fromarray(grid).save(path)


def save_prompts(prompts, out_dir: str) -> None:
    """Per-image prompt dump — {i:05}.txt per prompt
    (sample_txt2img.py:143-152)."""
    os.makedirs(out_dir, exist_ok=True)
    for i, p in enumerate(prompts):
        with open(os.path.join(out_dir, f"{i:05}.txt"), "w") as f:
            f.write(p)
