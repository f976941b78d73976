#!/usr/bin/env python
"""Metric runner — the reference's scripts/test.py rebuilt.

Computes FID (and optionally IS / CLIP score) between a generated image
directory and a reference set.  Because this offline environment cannot
download InceptionV3/CLIP weights, features can be supplied as .npz files
(arrays named 'features'); with local weights available, wire an extractor
through eda_dm_tpu.eval.metrics.load_inception_extractor.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--gen_features", type=str, required=True,
                   help=".npz with 'features' for the generated set")
    p.add_argument("--ref_features", type=str, required=True,
                   help=".npz with 'features' (or 'mu'+'sigma') for the "
                        "reference set")
    p.add_argument("--probs", type=str, default=None,
                   help="optional .npz with 'probs' for Inception Score")
    args = p.parse_args()

    from eda_dm_tpu.eval.metrics import (FeatureStats, frechet_distance,
                                         fid_from_features, inception_score)

    gen = np.load(args.gen_features)
    ref = np.load(args.ref_features)
    s_gen = FeatureStats.from_features(gen["features"])
    if "mu" in ref:
        s_ref = FeatureStats(mu=ref["mu"], sigma=ref["sigma"])
    else:
        s_ref = FeatureStats.from_features(ref["features"])
    print(f"FID: {frechet_distance(s_gen, s_ref):.4f}")

    if args.probs:
        probs = np.load(args.probs)["probs"]
        m, s = inception_score(probs)
        print(f"IS: {m:.4f} ± {s:.4f}")


if __name__ == "__main__":
    main()
