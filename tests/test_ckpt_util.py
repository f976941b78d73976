"""MD5-validating checkpoint resolver (ckpt_util.py:38-72 equivalent)."""

import os

import pytest

from eda_dm_tpu.models import convert


def test_get_ckpt_path_validates(tmp_path, monkeypatch):
    rel = convert.DDPM_CKPT_NAMES["ema_cifar10"]
    p = tmp_path / rel
    p.parent.mkdir(parents=True)
    p.write_bytes(b"not a real checkpoint")

    with pytest.raises(ValueError, match="md5 mismatch"):
        convert.get_ckpt_path("ema_cifar10", str(tmp_path))

    # correct digest accepted (patch the registry to this file's digest)
    monkeypatch.setitem(convert.DDPM_CKPT_MD5, "ema_cifar10",
                        convert.md5_hash(str(p)))
    assert convert.get_ckpt_path("ema_cifar10", str(tmp_path)) == str(p)
    # check=False skips hashing
    assert convert.get_ckpt_path("ema_cifar10", str(tmp_path),
                                 check=False) == str(p)


def test_get_ckpt_path_errors(tmp_path):
    with pytest.raises(KeyError):
        convert.get_ckpt_path("nope", str(tmp_path))
    with pytest.raises(FileNotFoundError):
        convert.get_ckpt_path("ema_cifar10", str(tmp_path))
    # church_outdoor aliasing (ckpt_util.py:58-59)
    with pytest.raises(FileNotFoundError, match="lsun_church"):
        convert.get_ckpt_path("ema_lsun_church_outdoor", str(tmp_path))
