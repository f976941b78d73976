#!/usr/bin/env python
"""One entry point for the on-chip measurement probes (PERF.md instruments).

    python scripts/probe.py --stage <name> [probe args...]

Stages (scripts/probes/*.py):
  attn            stage rates: attention block + resblock + full model,
                  int8 vs bf16-FP vs folded (session-5 attribution)
  resblock        resblock conv-variant probe (acc dtype, fused GN, full
                  model candidate configs)
  resblock-hlo    dump + summarize the optimized TPU HLO for the real
                  resblock int8/folded steps
  conv-epilogue   zero-code-padding fix variants at the sink shape
  split-shortcut  split dual-quantizer 1x1 shortcut: int8 halves vs folded
  mosaic-int8     can Mosaic drive the MXU int8 mode from Pallas?
  int8-sweep      full-model serving-knob sweep around the policy defaults
  serving         round-2 serving/export probe
  serving-model   recurring two-shape (BENCH + bedroom) fp32/bf16-FP/int8
                  full-model steps/s table (policy regression check)
  search          act-scale search scoring probe
  calib           calibration phase probe
  bench-sweep     BENCH gate x carrier x conv-dtype sweep (session 4/5)
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STAGES = {
    "attn": "attn",
    "resblock": "resblock",
    "resblock-hlo": "resblock_hlo",
    "conv-epilogue": "conv_epilogue",
    "split-shortcut": "split_shortcut",
    "mosaic-int8": "mosaic_int8",
    "int8-sweep": "int8_sweep",
    "serving": "serving",
    "serving-model": "serving_model",
    "search": "search",
    "calib": "calib",
    "bench-sweep": "bench_sweep",
}


def main(argv=None):
    ap = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--stage", required=True, choices=sorted(STAGES))
    args, rest = ap.parse_known_args(argv)
    import importlib
    mod = importlib.import_module(f"probes.{STAGES[args.stage]}")
    sys.argv = [sys.argv[0]] + rest
    return mod.main()


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
