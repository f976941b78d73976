#!/usr/bin/env python
"""Metric runner — the reference's scripts/test.py rebuilt.

Three input forms, mirroring test_fid/test_bedroom_fid/test_coco_fid
(/root/reference/scripts/test.py: torch-fidelity + pytorch-fid + clip-score
path pairs):

* ``--gen_dir`` / ``--ref_dir``: image directories — features are extracted
  with the in-framework InceptionV3 (eda_dm_tpu/eval/inception.py), batch-
  streamed so 50k-image sets never sit in memory.  Pass
  ``--inception_weights pt_inception-2015-12-05-*.pth`` for real FID/IS
  scores (random-init features otherwise — relative comparisons only).
* ``--gen_features`` / ``--ref_features``: precomputed .npz ('features', or
  'mu'+'sigma' for the reference side).
* ``--ref_stats``: save the ref set's (mu, sigma) once and reuse.

IS is computed when --isc is set (needs real Inception weights to mean
anything); sFID uses the feat768 spatial head.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _features_from_dir(path, extractor, batch_size, size=None, probs=False):
    from eda_dm_tpu.data.datasets import iter_image_folder
    from eda_dm_tpu.eval.inception import StreamingStats
    pool, spatial, prob_rows = [], [], []
    n = 0
    for batch in iter_image_folder(path, batch_size=batch_size, size=size):
        out = extractor(batch)
        pool.append(out["pool3"])
        spatial.append(out["feat768"])
        if probs:
            logits = out["logits"]
            e = np.exp(logits - logits.max(axis=1, keepdims=True))
            prob_rows.append(e / e.sum(axis=1, keepdims=True))
        n += batch.shape[0]
        if n and n % 5000 < batch_size:
            print(f"  {path}: {n} images featurized", flush=True)
    if not pool:
        raise SystemExit(f"no images found in {path}")
    return (np.concatenate(pool), np.concatenate(spatial),
            np.concatenate(prob_rows) if probs else None)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--gen_dir", type=str, default=None,
                   help="directory of generated images")
    p.add_argument("--ref_dir", type=str, default=None,
                   help="directory of reference images")
    p.add_argument("--gen_features", type=str, default=None,
                   help=".npz with 'features' for the generated set")
    p.add_argument("--ref_features", type=str, default=None,
                   help=".npz with 'features' (or 'mu'+'sigma')")
    p.add_argument("--ref_stats", type=str, default=None,
                   help="write the ref set's FeatureStats here and exit")
    p.add_argument("--inception_weights", type=str, default=None)
    p.add_argument("--probs", type=str, default=None,
                   help="optional .npz with 'probs' for Inception Score")
    p.add_argument("--isc", action="store_true",
                   help="also compute Inception Score of the generated set")
    p.add_argument("--sfid", action="store_true",
                   help="also compute spatial FID (feat768 head)")
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--size", type=int, default=None,
                   help="resize images on read (default: native size)")
    p.add_argument("--cpu", action="store_true",
                   help="run feature extraction on local CPU (skip the "
                        "TPU relay; env JAX_PLATFORMS alone doesn't stick)")
    args = p.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from eda_dm_tpu.eval.metrics import (FeatureStats, frechet_distance,
                                         fid_from_features, inception_score)

    ext = None
    if args.gen_dir or args.ref_dir:
        from eda_dm_tpu.eval.inception import InceptionExtractor
        ext = InceptionExtractor(args.inception_weights)
        if not args.inception_weights:
            print("[warn] random-init Inception: scores are relative / "
                  "self-consistency only", flush=True)

    gen_sp = ref_sp = gen_probs = None
    if args.gen_dir:
        gen, gen_sp, gen_probs = _features_from_dir(
            args.gen_dir, ext, args.batch_size, args.size, probs=args.isc)
    elif args.gen_features:
        gen = np.load(args.gen_features)["features"]
    else:
        gen = None

    if args.ref_dir:
        ref, ref_sp, _ = _features_from_dir(args.ref_dir, ext,
                                            args.batch_size, args.size)
        s_ref = FeatureStats.from_features(ref)
    elif args.ref_features:
        d = np.load(args.ref_features)
        s_ref = (FeatureStats(mu=d["mu"], sigma=d["sigma"]) if "mu" in d
                 else FeatureStats.from_features(d["features"]))
        ref = None
    else:
        s_ref = ref = None

    if args.ref_stats:
        if s_ref is None:
            raise SystemExit("--ref_stats needs --ref_dir/--ref_features")
        np.savez(args.ref_stats, mu=s_ref.mu, sigma=s_ref.sigma)
        print(f"reference stats saved to {args.ref_stats}")
        if gen is None:
            return

    if gen is None or s_ref is None:
        raise SystemExit("need a generated set and a reference set "
                         "(dirs or features)")
    s_gen = FeatureStats.from_features(gen)
    print(f"FID: {frechet_distance(s_gen, s_ref):.4f}")

    if args.sfid and gen_sp is not None and ref_sp is not None:
        from eda_dm_tpu.eval.metrics import spatial_fid
        print(f"sFID: {spatial_fid(gen_sp, ref_sp):.4f}")

    probs = gen_probs
    if args.probs:
        probs = np.load(args.probs)["probs"]
    if probs is not None:
        m, s = inception_score(probs)
        print(f"IS: {m:.4f} ± {s:.4f}")


if __name__ == "__main__":
    main()
