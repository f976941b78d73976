"""Dataset loaders + pixel transforms for FID-reference preparation.

Functional equivalent of the reference's ``ddim/datasets`` package
(/root/reference/ddim/datasets/__init__.py:31-233): dataset readers
(CIFAR-10, LSUN, generic image folders) and the ``data_transform`` /
``inverse_data_transform`` pixel-space codecs.  At PTQ sampling time the
reference only uses the inverse transform
(scripts/sample_diffusion_ddim.py:196); the forward transform and the
readers exist so FID reference statistics can be built entirely
in-framework (images → eval.inception features → FeatureStats).

Implementation is numpy/PIL, host-side — data loading feeds the device via
ordinary ``jnp.asarray`` batches; no torch dependency.
"""

from __future__ import annotations

import dataclasses
import os
import pickle
from typing import Iterator, Optional, Sequence, Tuple

import numpy as np


@dataclasses.dataclass(frozen=True)
class PixelTransform:
    """The subset of the reference data-config the codecs consume
    (configs/cifar10.yml 'data' section)."""
    rescaled: bool = True
    logit_transform: bool = False
    uniform_dequantization: bool = False
    gaussian_dequantization: bool = False


def logit_transform(x: np.ndarray, lam: float = 1e-6) -> np.ndarray:
    x = lam + (1.0 - 2.0 * lam) * x
    return np.log(x) - np.log1p(-x)


def data_transform(cfg: PixelTransform, x: np.ndarray,
                   rng: Optional[np.random.RandomState] = None) -> np.ndarray:
    """[0,1] images → model space (ddim/datasets/__init__.py:204-218)."""
    rng = rng or np.random.RandomState(0)
    x = np.asarray(x, np.float32)
    if cfg.uniform_dequantization:
        x = x / 256.0 * 255.0 + rng.rand(*x.shape).astype(np.float32) / 256.0
    if cfg.gaussian_dequantization:
        x = x + rng.randn(*x.shape).astype(np.float32) * 0.01
    if cfg.rescaled:
        x = 2.0 * x - 1.0
    elif cfg.logit_transform:
        x = logit_transform(x)
    return x


def inverse_data_transform(cfg: PixelTransform, x: np.ndarray) -> np.ndarray:
    """model space → [0,1] images (ddim/datasets/__init__.py:221-229)."""
    x = np.asarray(x, np.float32)
    if cfg.logit_transform:
        x = 1.0 / (1.0 + np.exp(-x))
    elif cfg.rescaled:
        x = (x + 1.0) / 2.0
    return np.clip(x, 0.0, 1.0)


# --------------------------------------------------------------------------
# readers
# --------------------------------------------------------------------------

def load_cifar10(root: str, train: bool = True) -> np.ndarray:
    """Read the python-pickle CIFAR-10 archive (cifar-10-batches-py) →
    (N, 32, 32, 3) uint8.

    Covers the reference's torchvision CIFAR10 reader
    (ddim/datasets/__init__.py:37-55) for FID reference preparation.
    """
    base = os.path.join(root, "cifar-10-batches-py")
    if not os.path.isdir(base):
        base = root
    names = ([f"data_batch_{i}" for i in range(1, 6)] if train
             else ["test_batch"])
    chunks = []
    for n in names:
        with open(os.path.join(base, n), "rb") as f:
            d = pickle.load(f, encoding="bytes")
        chunks.append(np.asarray(d[b"data"], np.uint8))
    data = np.concatenate(chunks)
    return data.reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)


_IMG_EXT = (".png", ".jpg", ".jpeg", ".webp", ".bmp")


def iter_image_folder(path: str, batch_size: int = 64,
                      size: Optional[int] = None,
                      center_crop: bool = False) -> Iterator[np.ndarray]:
    """Stream a directory of images as float32 [0,1] NHWC batches.

    The generic reader behind LSUN/CelebA/FFHQ-style FID reference sets
    (ddim/datasets/__init__.py:57-151 variants) and for scoring generated
    sample directories (scripts/test.py path-pair FID).
    """
    from PIL import Image
    files = sorted(f for f in os.listdir(path)
                   if f.lower().endswith(_IMG_EXT))
    batch = []
    for fname in files:
        img = Image.open(os.path.join(path, fname)).convert("RGB")
        if center_crop:
            w, h = img.size
            s = min(w, h)
            img = img.crop(((w - s) // 2, (h - s) // 2,
                            (w - s) // 2 + s, (h - s) // 2 + s))
        if size is not None and img.size != (size, size):
            img = img.resize((size, size), Image.BICUBIC)
        batch.append(np.asarray(img, np.float32) / 255.0)
        if len(batch) == batch_size:
            yield np.stack(batch)
            batch = []
    if batch:
        yield np.stack(batch)


def load_celeba(root: str, split: str = "train", size: int = 64,
                limit: Optional[int] = None) -> np.ndarray:
    """Aligned-CelebA reader → (N, size, size, 3) float32 [0,1].

    Covers ``ddim/datasets/celeba.py:1-163`` + the fixed face crop the
    reference applies before resizing (``ddim/datasets/__init__.py:77-92``:
    Crop(cy−64, cy+64, cx−64, cx+64) with cx=89, cy=121 on the 178×218
    aligned images).  Images live in ``<root>/img_align_celeba``; the
    train/valid/test split comes from ``list_eval_partition.txt`` when
    present (otherwise all images are used).
    """
    from PIL import Image
    img_dir = os.path.join(root, "img_align_celeba")
    if not os.path.isdir(img_dir):
        img_dir = root
    part_file = os.path.join(root, "list_eval_partition.txt")
    split_id = {"train": 0, "valid": 1, "test": 2, "all": None}[split]
    if split_id is not None and os.path.isfile(part_file):
        with open(part_file) as f:
            files = [name for line in f if line.strip()
                     for name, sid in [line.split()]
                     if int(sid) == split_id]
    else:
        files = sorted(f for f in os.listdir(img_dir)
                       if f.lower().endswith(_IMG_EXT))
    cx, cy = 89, 121
    out = []
    for fname in files[:limit]:
        img = Image.open(os.path.join(img_dir, fname)).convert("RGB")
        # Crop(x1=cy-64, x2=cy+64, y1=cx-64, y2=cx+64) → functional crop
        # box (left, upper, right, lower) = (y1, x1, y2, x2)
        img = img.crop((cx - 64, cy - 64, cx + 64, cy + 64))
        if size != 128:
            img = img.resize((size, size), Image.BICUBIC)
        out.append(np.asarray(img, np.float32) / 255.0)
    if not out:
        raise RuntimeError(f"CelebA: no images found under {root}")
    return np.stack(out)


def load_ffhq(root: str, resolution: int = 256,
              limit: Optional[int] = None) -> np.ndarray:
    """FFHQ reader → (N, resolution, resolution, 3) float32 [0,1].

    Covers ``ddim/datasets/ffhq.py:1-40``: the multi-resolution lmdb with
    ``'{resolution}-{index:05d}'`` keys and a ``'length'`` record.  Falls
    back to a plain image folder when the path is a directory of images
    (or the lmdb package is unavailable).
    """
    if os.path.isdir(root) and any(
            f.lower().endswith(_IMG_EXT) for f in os.listdir(root)):
        return np.concatenate(list(iter_image_folder(
            root, size=resolution, center_crop=True)))[:limit]
    try:
        import lmdb
    except ImportError as e:
        raise RuntimeError(
            f"FFHQ: {root} is not an image folder and the lmdb package is "
            "not installed; export the archive to images first.") from e
    from PIL import Image
    import io
    env = lmdb.open(root, max_readers=32, readonly=True, lock=False,
                    readahead=False, meminit=False)
    with env.begin(write=False) as txn:
        length = int(txn.get(b"length").decode())
        n = length if limit is None else min(limit, length)
        out = []
        for i in range(n):
            raw = txn.get(f"{resolution}-{str(i).zfill(5)}".encode())
            img = Image.open(io.BytesIO(raw)).convert("RGB")
            out.append(np.asarray(img, np.float32) / 255.0)
    return np.stack(out)


def load_lsun(root: str, category: str, limit: Optional[int] = None,
              size: int = 256) -> np.ndarray:
    """LSUN scene reader (ddim/datasets/__init__.py:57-95 uses the lmdb
    archives).  Reads the lmdb when the ``lmdb`` package is available,
    otherwise falls back to an exported image folder ``<root>/<category>``.
    """
    folder = os.path.join(root, category)
    if os.path.isdir(folder):
        return np.concatenate(list(iter_image_folder(
            folder, size=size, center_crop=True)))[:limit]
    try:
        import lmdb  # noqa: F401
    except ImportError as e:
        raise RuntimeError(
            f"LSUN: no image folder at {folder} and the lmdb package is "
            "not installed; export the archive to images first.") from e
    from PIL import Image
    import io
    env = lmdb.open(os.path.join(root, f"{category}_lmdb"), readonly=True,
                    lock=False)
    out = []
    with env.begin(write=False) as txn:
        for i, (_, val) in enumerate(txn.cursor()):
            if limit is not None and i >= limit:
                break
            img = Image.open(io.BytesIO(val)).convert("RGB")
            w, h = img.size
            s = min(w, h)
            img = img.crop(((w - s) // 2, (h - s) // 2,
                            (w - s) // 2 + s, (h - s) // 2 + s))
            out.append(np.asarray(img.resize((size, size), Image.BICUBIC),
                                  np.float32) / 255.0)
    return np.stack(out)
