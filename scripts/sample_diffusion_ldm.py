#!/usr/bin/env python
"""Latent-diffusion PTQ entry point (bedroom / church / imagenet / coco).

CLI mirror of the reference's four LDM scripts
(/root/reference/scripts/sample_diffusion_ldm_{bedroom,church,imagenet}.py,
sample_txt2img.py; flags from task_config.py:41-197), unified behind
``--task``.  Conditional tasks build their contexts here (class labels with
the 1000 uncond token for imagenet; text prompts via a local CLIP checkpoint
for coco) and hand them to eda_dm_tpu.pipelines.latent.LDMPipeline.
"""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def get_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--task", type=str, required=True,
                   choices=["bedroom", "church", "imagenet", "coco"])
    p.add_argument("--resume", type=str, default=None,
                   help="LatentDiffusion torch checkpoint path")
    p.add_argument("--logdir", type=str, default=None)
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--custom_steps", type=int, default=None)
    p.add_argument("--eta", type=float, default=None)
    p.add_argument("--scale", type=float, default=None)
    p.add_argument("--n_samples", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--weight_bit", type=int, default=4)
    p.add_argument("--act_bit", type=int, default=8)
    p.add_argument("--sm_abit", type=int, default=8)
    p.add_argument("--a_sym", action="store_true", default=False)
    p.add_argument("--split", action="store_true", default=True)
    p.add_argument("--calib_num_samples", type=int, default=None)
    p.add_argument("--batch_samples", type=int, default=None)
    p.add_argument("--lamda", type=float, default=None)
    p.add_argument("--iters", type=int, default=None)
    p.add_argument("--lr_w", type=float, default=None)
    p.add_argument("--lr_a", type=float, default=None)
    p.add_argument("--add_loss", type=float, default=None)
    p.add_argument("--dpm", action="store_true", default=False,
                   help="sample with multistep DPM-Solver++ instead of DDIM")
    p.add_argument("--clip_path", type=str,
                   default="openai/clip-vit-large-patch14")
    p.add_argument("--prompts_file", type=str, default=None,
                   help="text prompts (one per line) for the coco task")
    return p


def main():
    args = get_parser().parse_args()
    import numpy as np
    import jax
    import jax.numpy as jnp
    from eda_dm_tpu.pipelines.latent import LDMPipeline, task_config
    from eda_dm_tpu.utils.run import seed_everything, setup_run_dir, \
        dump_config, enable_compilation_cache

    enable_compilation_cache()

    overrides = {k: v for k, v in vars(args).items()
                 if k in ("custom_steps", "eta", "scale", "n_samples",
                          "batch_size", "calib_num_samples", "batch_samples",
                          "lamda", "iters", "lr_w", "lr_a", "add_loss")
                 and v is not None}
    overrides.update(weight_bit=args.weight_bit, act_bit=args.act_bit,
                     sm_abit=args.sm_abit, a_sym=args.a_sym,
                     split=args.split, seed=args.seed,
                     ckpt_path=args.resume)
    if args.dpm:
        overrides["sampler"] = "dpm"
    cfg = task_config(args.task, **overrides)

    run_dir = setup_run_dir(args.logdir or f"result/{args.task}")
    log = logging.getLogger(args.task)
    seed_everything(args.seed)
    dump_config(cfg, run_dir)

    pipe = LDMPipeline(cfg)
    variables = pipe.init_variables()

    context = uncond = None
    if args.task == "imagenet":
        # shuffled uniform 1000-class labels; uncond token = 1000
        # (sample_diffusion_ldm_imagenet.py:131-139,219-226)
        n = cfg.batch_samples
        rng = np.random.RandomState(args.seed)
        labels = rng.permutation(np.repeat(np.arange(1000),
                                           -(-n // 1000)))[:n]
        context = pipe.ld.get_learned_conditioning(
            variables["cond_stage"], jnp.asarray(labels))
        uncond = pipe.ld.get_learned_conditioning(
            variables["cond_stage"], jnp.full((n,), 1000))
    elif args.task == "coco":
        from eda_dm_tpu.models.encoders import FrozenCLIPTextEncoder
        enc = FrozenCLIPTextEncoder(args.clip_path)
        with open(args.prompts_file) as f:
            prompts = [l.strip() for l in f if l.strip()]
        prompts = (prompts * (-(-cfg.batch_samples // len(prompts)))
                   )[:cfg.batch_samples]
        context = enc.encode(prompts)
        uncond = enc.encode([""] * cfg.batch_samples)

    img_dir = os.path.join(run_dir, "img")
    progress = lambda name, loss: log.info("recon %s loss %.5f", name, loss)
    pipe.run(out_dir=img_dir, variables=variables, context=context,
             uncond=uncond, progress=progress)
    log.info("done; images in %s", img_dir)


if __name__ == "__main__":
    main()
