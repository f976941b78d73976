#!/usr/bin/env python
"""Turnkey PTQ validation: checkpoint → PTQ → FID delta vs the FP model.

One command per task reproduces the reference's evaluation loop
(scripts/sample_diffusion_ddim.py:265-328 + scripts/test.py): load a real
checkpoint (or random-init without one), run the full EDA-DM pipeline
(TDAC calibration → scale init → reconstruction), sample N images from
both the quantized and the FP model with IDENTICAL noise, and report the
FID between the two populations using the in-framework InceptionV3
(eda_dm_tpu/eval/inception.py).

With real weights + ``--inception_weights pt_inception-2015-12-05-*.pth``
the printed ``fid_quant_vs_fp`` is the quantization-quality headline (the
reference's target: quantized FID within ~0.2 of FP, README.md:92-124).
Without weights everything still runs end-to-end — the random-init
extractor gives a self-consistency number (useful against the
``split_noise_floor`` baseline printed next to it), which is what CI
smoke-tests here (tests/test_validate_ptq.py).

Examples:
    python scripts/validate_ptq.py --task cifar --ckpt ckpt/ema_cifar10.ckpt \
        --inception_weights pt_inception-2015-12-05-6726825d.pth --n 2048
    python scripts/validate_ptq.py --task bedroom --ckpt models/lsun_bedroom.ckpt \
        --n 1024 --serve int8
    python scripts/validate_ptq.py --task coco --text_encoder tiny --n 64
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(1, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def get_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--task", required=True,
                   choices=["cifar", "bedroom", "church", "imagenet", "coco"])
    p.add_argument("--ckpt", default=None,
                   help="torch checkpoint (DDPM/LDM/SD family); random "
                        "weights when omitted")
    p.add_argument("--inception_weights", default=None,
                   help="pt_inception-2015-12-05-*.pth for real FID; "
                        "random-init extractor (self-consistency) otherwise")
    p.add_argument("--n", type=int, default=1024, help="images per arm")
    p.add_argument("--serve", default="waq",
                   choices=["waq", "int8", "bf16"],
                   help="quantized serving path for the quant arm")
    p.add_argument("--quant_state", default=None,
                   help="reuse a saved quant state (orbax dir from a "
                        "--phase calib/recon run) instead of running PTQ")
    p.add_argument("--out", default=None,
                   help="run dir for features .npz + result json "
                        "(default result/validate_<task>)")
    p.add_argument("--text_encoder", default="tiny",
                   choices=["clip", "bert", "tiny"])
    p.add_argument("--seed", type=int, default=1234)
    # smoke-test shrink knobs (forwarded to the task config)
    p.add_argument("--calib_num_samples", type=int, default=None)
    p.add_argument("--batch_samples", type=int, default=None)
    p.add_argument("--iters", type=int, default=None)
    p.add_argument("--custom_steps", type=int, default=None)
    p.add_argument("--timesteps", type=int, default=None,
                   help="(cifar) DDIM steps")
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--no_recon", action="store_true")
    p.add_argument("--tiny", action="store_true",
                   help="swap in a tiny architecture (CI smoke / harness "
                        "check without real weights)")
    p.add_argument("--cpu", action="store_true",
                   help="force the local CPU platform (never touch the "
                        "chip — e.g. while a chip queue is running)")
    return p


def _tiny_latent_cfg(task: str):
    """Small stand-in architectures for --tiny harness checks."""
    from eda_dm_tpu.models.latent_diffusion import LatentDiffusionConfig
    from eda_dm_tpu.models.ldm_unet import LDMUNetConfig
    from eda_dm_tpu.models.vae import VAEConfig
    transformer = task in ("imagenet", "coco")
    return LatentDiffusionConfig(
        unet=LDMUNetConfig(
            image_size=8, in_channels=3, model_channels=32, out_channels=3,
            num_res_blocks=1, attention_resolutions=(2,),
            channel_mult=(1, 2), num_head_channels=16,
            use_spatial_transformer=transformer,
            context_dim=16 if transformer else None),
        vae=VAEConfig(ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
                      attn_resolutions=(), in_channels=3, resolution=16,
                      z_channels=3, double_z=False, embed_dim=3, n_embed=64),
        timesteps=50,
        cond="class" if task == "imagenet" else
             ("text" if task == "coco" else "none"),
        n_classes=1001, class_embed_dim=16)


def _overrides(args, keys):
    return {k: getattr(args, k) for k in keys
            if getattr(args, k, None) is not None}


def build_cifar(args):
    from eda_dm_tpu.pipelines.cifar import CifarPipeline, CifarConfig
    kw = _overrides(args, ("calib_num_samples", "batch_samples", "iters",
                           "timesteps"))
    if args.batch_size:
        kw["sample_batch_size"] = kw["batch_samples"] = args.batch_size
    if args.no_recon:
        kw["recon"] = False
    if args.tiny:
        from eda_dm_tpu.models.ddpm_unet import DDPMConfig
        kw["arch"] = DDPMConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                                attn_resolutions=(16,), resolution=32)
    cfg = CifarConfig(seed=args.seed, ckpt_path=args.ckpt, **kw)
    pipe = CifarPipeline(cfg)
    return pipe


def build_latent(args):
    from eda_dm_tpu.pipelines.latent import LDMPipeline, task_config
    kw = _overrides(args, ("calib_num_samples", "batch_samples", "iters",
                           "custom_steps", "batch_size"))
    if args.no_recon:
        kw["recon"] = False
    cfg = task_config(args.task, seed=args.seed, ckpt_path=args.ckpt, **kw)
    pipe = LDMPipeline(cfg, model_cfg=(_tiny_latent_cfg(args.task)
                                       if args.tiny else None))
    return pipe


def main(argv=None):
    args = get_parser().parse_args(argv)
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from eda_dm_tpu.utils.run import seed_everything, enable_compilation_cache
    from eda_dm_tpu.quant.config import FP
    from eda_dm_tpu.eval.inception import InceptionExtractor
    from eda_dm_tpu.eval.metrics import fid_from_features

    enable_compilation_cache()
    seed_everything(args.seed)
    out_dir = args.out or f"result/validate_{args.task}"
    os.makedirs(out_dir, exist_ok=True)

    is_cifar = args.task == "cifar"
    pipe = (build_cifar if is_cifar else build_latent)(args)
    variables = pipe.init_variables()
    print(f"task={args.task} ckpt={'random' if not args.ckpt else args.ckpt}",
          flush=True)

    context = uncond = None
    if args.task == "imagenet":
        n = max(pipe.cfg.batch_samples, pipe.cfg.calib_num_samples, args.n)
        rng = np.random.RandomState(args.seed)
        labels = rng.permutation(np.repeat(np.arange(1000),
                                           -(-n // 1000)))[:n]
        context = pipe.ld.get_learned_conditioning(
            variables["cond_stage"], jnp.asarray(labels))
        uncond = pipe.ld.get_learned_conditioning(
            variables["cond_stage"], jnp.full((n,), 1000))
    elif args.task == "coco":
        from sample_diffusion_ldm import build_coco_context
        args.prompts_file = getattr(args, "prompts_file", None)
        args.clip_path = getattr(args, "clip_path",
                                 "openai/clip-vit-large-patch14")
        n = max(pipe.cfg.batch_samples, pipe.cfg.calib_num_samples, args.n)
        context, uncond = build_coco_context(args, pipe, n)

    # ---- PTQ ------------------------------------------------------------
    t0 = time.perf_counter()
    key = jax.random.PRNGKey(args.seed)
    k_tdac, k_recon = jax.random.split(key)
    if args.quant_state:
        from eda_dm_tpu.utils.checkpointing import load_quant_state
        if is_cifar:
            variables = load_quant_state(args.quant_state, variables)
        else:
            variables = {**variables, "unet": load_quant_state(
                args.quant_state, variables["unet"])}
        print("loaded quant state; skipping calibration", flush=True)
    else:
        if is_cifar:
            cx, ct, _ = pipe.tdac_calibration(variables, k_tdac)
            cali = (cx, ct)
        else:
            sel = pipe.tdac_calibration(variables, k_tdac, context=context,
                                        uncond=uncond)
            cali = pipe.build_cali_data(sel, context=context, uncond=uncond)
        variables = pipe.calibrate(variables, cali)
        if pipe.cfg.recon and not args.no_recon:
            variables = pipe.reconstruct(
                variables, cali, k_recon,
                progress=lambda nm, l: print(f"  recon {nm}: {l:.4g}",
                                             flush=True))
        print(f"PTQ: {time.perf_counter() - t0:.0f}s", flush=True)

    # ---- paired sampling (identical noise via the shared cfg.seed) ------
    t0 = time.perf_counter()
    ctx_fn = (None if context is None
              else pipe.make_context_fn(context, uncond))
    if is_cifar:
        imgs_fp = pipe.sample_fid(variables, max_images=args.n, mode=FP)
        if args.serve == "waq":
            from eda_dm_tpu.quant.config import WAQ
            serving, mode = variables, WAQ
        else:
            from eda_dm_tpu.api import export_for_serving
            serving, mode = export_for_serving(variables, pipe.qc,
                                               kind=args.serve)
        imgs_q = pipe.sample_fid(serving, max_images=args.n, mode=mode)
    else:
        imgs_fp = pipe.sample_fid(variables, n_samples=args.n, mode=FP,
                                  context_fn=ctx_fn)
        serving, mode = pipe.serving_variables(variables, args.serve)
        imgs_q = pipe.sample_fid(serving, n_samples=args.n, mode=mode,
                                 context_fn=ctx_fn)
    print(f"sampling 2x{args.n}: {time.perf_counter() - t0:.0f}s", flush=True)

    # ---- features + FID delta ------------------------------------------
    ext = InceptionExtractor(args.inception_weights)
    def feats(imgs, bs=64):
        return np.concatenate([ext.pool3(imgs[i:i + bs])
                               for i in range(0, len(imgs), bs)])
    f_fp, f_q = feats(imgs_fp), feats(imgs_q)
    np.savez(os.path.join(out_dir, "features.npz"),
             fp=f_fp, quant=f_q)
    half = len(f_fp) // 2
    if args.inception_weights:
        fid = fid_from_features                  # real FID scale
    else:
        # random-init extractor: raw activations collapse (≈2e-4 scale,
        # singular covariances — every raw Frechet distance rounds to 0);
        # z-score against the pooled population so the quant-gap vs
        # noise-floor *ratio* is meaningful (eval/metrics.standardized_fid)
        from eda_dm_tpu.eval.metrics import standardized_fid
        pool = np.concatenate([f_fp, f_q])
        fid = lambda a, b: standardized_fid(a, b, pool)
    result = {
        "task": args.task, "serve": args.serve, "n": args.n,
        "real_weights": bool(args.ckpt),
        "real_inception": bool(args.inception_weights),
        "fid_quant_vs_fp": round(fid(f_q, f_fp), 4),
        "split_noise_floor": round(fid(f_fp[:half], f_fp[half:]), 4),
    }
    with open(os.path.join(out_dir, "result.json"), "w") as f:
        json.dump(result, f)
    print(json.dumps(result), flush=True)
    return result


if __name__ == "__main__":
    main()
