"""Image output for FID evaluation sets.

Replaces the reference's per-image ``torchvision.utils.save_image`` loop
(/root/reference/scripts/sample_diffusion_ddim.py:201-205).  PNG encoding is
pure-Python (PIL) for now; the native C++ writer hook lands with the
parallel multi-host writer.
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
                fmt: str = "png") -> int:
    """Write NHWC float images in [0,1] as {index}.png; returns count."""
    from PIL import Image
    os.makedirs(out_dir, exist_ok=True)
    arr = to_uint8(images)
    for i in range(arr.shape[0]):
        Image.fromarray(arr[i]).save(
            os.path.join(out_dir, f"{start_index + i}.{fmt}"))
    return arr.shape[0]
