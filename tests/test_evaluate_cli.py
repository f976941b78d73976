"""scripts/evaluate.py end-to-end: dir-pair FID via the in-framework
Inception (the reference's scripts/test.py path-pair flows)."""

import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_imgs(d, seed, n=8):
    from PIL import Image
    os.makedirs(d, exist_ok=True)
    rng = np.random.RandomState(seed)
    for i in range(n):
        Image.fromarray(rng.randint(0, 256, (16, 16, 3), np.uint8)).save(
            os.path.join(d, f"{i}.png"))


def _run(args):
    env = dict(os.environ, PYTHONPATH=ROOT)
    return subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "evaluate.py"), "--cpu"] + args,
        capture_output=True, text=True, env=env, timeout=900)


def test_dir_pair_fid_and_stats_reuse(tmp_path):
    gen, ref = str(tmp_path / "gen"), str(tmp_path / "ref")
    _write_imgs(gen, seed=0)
    _write_imgs(ref, seed=1)
    r = _run(["--gen_dir", gen, "--ref_dir", ref, "--isc", "--sfid"])
    assert r.returncode == 0, r.stderr
    out = r.stdout
    assert "FID:" in out and "sFID:" in out and "IS:" in out
    fid1 = float(out.split("FID: ")[1].split()[0])
    assert np.isfinite(fid1)

    # save ref stats, reuse them: FID must match the direct run
    stats = str(tmp_path / "ref_stats.npz")
    r2 = _run(["--ref_dir", ref, "--ref_stats", stats])
    assert r2.returncode == 0, r2.stderr
    r3 = _run(["--gen_dir", gen, "--ref_features", stats])
    assert r3.returncode == 0, r3.stderr
    fid3 = float(r3.stdout.split("FID: ")[1].split()[0])
    assert abs(fid3 - fid1) < 1e-3
