"""Dataset loaders / pixel codecs / COCO captions (VERDICT round-1 missing
item #4: in-framework FID reference preparation)."""

import json
import os
import pickle

import numpy as np

from eda_dm_tpu.data import (load_cifar10, iter_image_folder,
                             load_coco_prompts, data_transform,
                             inverse_data_transform)
from eda_dm_tpu.data.datasets import PixelTransform


def test_cifar10_pickle_loader(tmp_path):
    base = tmp_path / "cifar-10-batches-py"
    base.mkdir()
    rng = np.random.RandomState(0)
    for i in range(1, 6):
        rows = rng.randint(0, 256, (4, 3072), dtype=np.int64)
        with open(base / f"data_batch_{i}", "wb") as f:
            pickle.dump({b"data": rows, b"labels": [0] * 4}, f)
    data = load_cifar10(str(tmp_path))
    assert data.shape == (20, 32, 32, 3) and data.dtype == np.uint8


def test_image_folder_stream(tmp_path):
    from PIL import Image
    for i in range(5):
        arr = np.full((40, 60, 3), i * 40, np.uint8)
        Image.fromarray(arr).save(tmp_path / f"img_{i}.png")
    batches = list(iter_image_folder(str(tmp_path), batch_size=2, size=16,
                                     center_crop=True))
    assert [b.shape for b in batches] == [(2, 16, 16, 3)] * 2 + [(1, 16, 16, 3)]
    assert batches[0].dtype == np.float32 and batches[0].max() <= 1.0


def test_pixel_transform_roundtrip():
    cfg = PixelTransform(rescaled=True)
    x = np.random.RandomState(0).rand(2, 8, 8, 3).astype(np.float32)
    y = data_transform(cfg, x)
    assert y.min() < 0  # rescaled to [-1,1]
    np.testing.assert_allclose(inverse_data_transform(cfg, y), x, atol=1e-6)

    cfg = PixelTransform(rescaled=False, logit_transform=True)
    y = data_transform(cfg, x)
    np.testing.assert_allclose(inverse_data_transform(cfg, y), x, atol=1e-5)


def test_coco_prompts_json_and_txt(tmp_path):
    ann = {"annotations": [{"caption": f"caption number {i} "}
                           for i in range(20)]}
    p = tmp_path / "captions.json"
    p.write_text(json.dumps(ann))
    prompts = load_coco_prompts(str(p), shuffle=True, seed=1, limit=10)
    assert len(prompts) == 10
    assert all(c.startswith("caption number") and not c.endswith(" ")
               for c in prompts)
    # deterministic shuffle
    assert prompts == load_coco_prompts(str(p), shuffle=True, seed=1, limit=10)

    t = tmp_path / "prompts.txt"
    t.write_text("a dog\n\na cat\n")
    assert load_coco_prompts(str(t), shuffle=False) == ["a dog", "a cat"]
