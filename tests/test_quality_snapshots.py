"""Quality regression gate (round-4 verdict next #3).

Each task's tiny-config PTQ quality — the standardized-FID delta between
the int8-served quantized arm and the FP arm under identical noise — is
pinned against a recorded snapshot (``result/snapshots/tiny_<task>.json``,
produced by the exact argv stored in the file).  Serving-kernel or
quantizer changes that move sample quality fail these tests instead of
slipping through silently; the production-scale snapshots recorded on
chip live next to these in PERF.md's accuracy table.

The tiny configs run the same quantizers, serving kernels (int8 export,
epilogues, policy branches on their tiny-shape sides), samplers, and
calibration flow as production — only the architectures are shrunk so the
gate runs on CPU in CI.  Seeds are fixed and CPU math is deterministic,
so the recorded numbers reproduce; the 1.5x headroom absorbs cross-stack
numeric drift while catching real regressions (a broken epilogue moves
the delta by orders of magnitude, cf. the round-4 zero-code-padding bug
hunt).
"""

import json
import os
import sys

import pytest

pytestmark = pytest.mark.slow

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))

SNAPDIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "result", "snapshots")

TASKS = ["cifar", "bedroom", "imagenet", "coco"]


@pytest.mark.parametrize("task", TASKS)
def test_tiny_quality_snapshot(task, tmp_path):
    path = os.path.join(SNAPDIR, f"tiny_{task}.json")
    if not os.path.exists(path):
        pytest.skip(f"no recorded snapshot for {task}")
    rec = json.load(open(path))
    from validate_ptq import main
    res = main(rec["argv"] + ["--out", str(tmp_path / "run")])
    assert res["serve"] == rec["result"]["serve"]
    recorded = rec["result"]["fid_quant_vs_fp"]
    assert res["fid_quant_vs_fp"] <= 1.5 * recorded + 1e-6, (
        f"{task}: quantization quality regressed — fid_quant_vs_fp "
        f"{res['fid_quant_vs_fp']} vs recorded {recorded} (x1.5 headroom)")
    # sanity: the quant arm stays a real perturbation (not the FP graph)
    assert res["fid_quant_vs_fp"] > 0
