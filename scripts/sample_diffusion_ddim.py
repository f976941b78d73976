#!/usr/bin/env python
"""CIFAR-10 DDIM PTQ entry point.

CLI mirror of /root/reference/scripts/sample_diffusion_ddim.py (flags from
task_config.py:3-37); drives eda_dm_tpu.pipelines.cifar end-to-end:
quantize → TDAC calibration → scale init → AdaRound+FBR reconstruction →
FID-set sampling.
"""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def get_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--logdir", type=str, default="result/cifar")
    p.add_argument("--ckpt", type=str, default=None,
                   help="path to the torch ema_cifar10 checkpoint")
    p.add_argument("--sample_type", type=str, default="generalized")
    p.add_argument("--skip_type", type=str, default="quad")
    p.add_argument("--timesteps", type=int, default=100)
    p.add_argument("--eta", type=float, default=0.0)
    p.add_argument("--ptq", action="store_true", default=True)
    p.add_argument("--no-ptq", dest="ptq", action="store_false")
    p.add_argument("--quant_act", action="store_true", default=True)
    p.add_argument("--weight_bit", type=int, default=4)
    p.add_argument("--act_bit", type=int, default=8)
    p.add_argument("--max_images", type=int, default=50000)
    p.add_argument("--a_sym", action="store_true", default=False)
    p.add_argument("--sm_abit", type=int, default=8)
    p.add_argument("--split", action="store_true", default=True)
    p.add_argument("--calib_num_samples", type=int, default=1024)
    p.add_argument("--batch_samples", type=int, default=1024)
    p.add_argument("--recon", action="store_true", default=True)
    p.add_argument("--no-recon", dest="recon", action="store_false")
    p.add_argument("--iters", type=int, default=5000)
    p.add_argument("--add_loss", type=float, default=0.8)
    p.add_argument("--lr_w", type=float, default=5e-1)
    p.add_argument("--lr_a", type=float, default=5e-4)
    p.add_argument("--lamda", type=float, default=1.2)
    p.add_argument("--sample_batch_size", type=int, default=500)
    p.add_argument("--resume_dir", type=str, default=None,
                   help="checkpoint dir to resume block reconstruction")
    p.add_argument("--serve", default="waq",
                   choices=["waq", "fp", "bf16", "int8", "fold"],
                   help="sampling path: fake-quant, FP32 baseline, or a "
                        "deployment export (int8 = native int8 MXU)")
    p.add_argument("--export_bundle", type=str, default=None,
                   help="after PTQ, save the packed-int4 deployment "
                        "artifact (codes 2/byte + scales) to this path")
    p.add_argument("--bundle", type=str, default=None,
                   help="serve from a saved deployment bundle (skips "
                        "calibration/reconstruction entirely)")
    return p


def main():
    args = get_parser().parse_args()
    from eda_dm_tpu.pipelines.cifar import CifarPipeline, CifarConfig
    from eda_dm_tpu.utils.run import seed_everything, setup_run_dir, \
        dump_config, enable_compilation_cache

    enable_compilation_cache()

    run_dir = setup_run_dir(args.logdir)
    log = logging.getLogger("cifar")
    seed_everything(args.seed)

    cfg = CifarConfig(
        timesteps=args.timesteps, skip_type=args.skip_type, eta=args.eta,
        sample_type=args.sample_type, ptq=args.ptq,
        weight_bit=args.weight_bit, act_bit=args.act_bit,
        sm_abit=args.sm_abit, quant_act=args.quant_act, a_sym=args.a_sym,
        split=args.split, calib_num_samples=args.calib_num_samples,
        batch_samples=args.batch_samples, lamda=args.lamda, recon=args.recon,
        iters=args.iters, lr_w=args.lr_w, lr_a=args.lr_a,
        add_loss=args.add_loss, max_images=args.max_images,
        sample_batch_size=args.sample_batch_size, seed=args.seed,
        ckpt_path=args.ckpt)
    dump_config(cfg, run_dir)

    pipe = CifarPipeline(cfg)
    img_dir = os.path.join(run_dir, "img")
    progress = lambda name, loss: log.info("recon %s loss %.5f", name, loss)
    if args.bundle:
        from eda_dm_tpu.api import load_bundle
        serving, mode = load_bundle(args.bundle)
        log.info("serving from bundle %s (skipping PTQ)", args.bundle)
        pipe.sample_fid(serving, out_dir=img_dir, mode=mode)
    else:
        variables, _ = pipe.run(out_dir=img_dir, progress=progress,
                                serve=args.serve)
        if args.export_bundle:
            from eda_dm_tpu.api import save_bundle
            stats = save_bundle(variables, pipe.qc, args.export_bundle)
            log.info("bundle %s: %.1f MB, %.1fx smaller than fp32",
                     args.export_bundle, stats["bundle_bytes"] / 1e6,
                     stats["compression"])
    log.info("done; images in %s", img_dir)


if __name__ == "__main__":
    main()
