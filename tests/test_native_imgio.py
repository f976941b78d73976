"""Native C++ PNG writer (eda_dm_tpu/native/imgio.cpp): build, batch write,
exact pixel roundtrip vs PIL, and the save_images fast path."""

import os

import numpy as np
import pytest


def test_native_writer_roundtrip(tmp_path):
    from eda_dm_tpu.native import load_imgio, write_png_batch
    if load_imgio() is None:
        pytest.skip("no native toolchain/libpng available")
    from PIL import Image
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 256, (7, 24, 16, 3), np.uint8)
    paths = [str(tmp_path / f"{i}.png") for i in range(7)]
    assert write_png_batch(imgs, paths, n_threads=4)
    for i, p in enumerate(paths):
        back = np.asarray(Image.open(p))
        np.testing.assert_array_equal(back, imgs[i])
    # greyscale channel path
    g = rng.randint(0, 256, (2, 8, 8, 1), np.uint8)
    gp = [str(tmp_path / f"g{i}.png") for i in range(2)]
    assert write_png_batch(g, gp)
    assert np.asarray(Image.open(gp[0])).shape == (8, 8)


def test_native_writer_reports_failures(tmp_path):
    from eda_dm_tpu.native import load_imgio, write_png_batch
    if load_imgio() is None:
        pytest.skip("no native toolchain/libpng available")
    imgs = np.zeros((2, 4, 4, 3), np.uint8)
    bad = [str(tmp_path / "ok.png"),
           str(tmp_path / "no_such_dir" / "x.png")]
    assert not write_png_batch(imgs, bad)


def test_save_images_uses_native_path(tmp_path):
    from PIL import Image
    from eda_dm_tpu.eval.io import save_images
    imgs = np.linspace(0, 1, 2 * 6 * 5 * 3, dtype=np.float32)
    imgs = imgs.reshape(2, 6, 5, 3)
    n = save_images(imgs, str(tmp_path), start_index=3)
    assert n == 2
    a = np.asarray(Image.open(tmp_path / "3.png"))
    b = np.asarray(Image.open(tmp_path / "4.png"))
    expect = np.clip(imgs * 255.0 + 0.5, 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(a, expect[0])
    np.testing.assert_array_equal(b, expect[1])
