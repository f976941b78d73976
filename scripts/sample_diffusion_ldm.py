#!/usr/bin/env python
"""Latent-diffusion PTQ entry point (bedroom / church / imagenet / coco).

CLI mirror of the reference's four LDM scripts
(/root/reference/scripts/sample_diffusion_ldm_{bedroom,church,imagenet}.py,
sample_txt2img.py; flags from task_config.py:41-197), unified behind
``--task``.  Conditional tasks build their contexts here (class labels with
the 1000 uncond token for imagenet; text prompts via ``--text_encoder``
for coco) and hand them to eda_dm_tpu.pipelines.latent.LDMPipeline.

Production knobs (all reachable without the perf driver):
  --cache_dtype / --capture_budget_bytes / --recon_group_size /
  --recon_group_window / --clear_caches_every  — recon memory controls
  (64×64-latent tasks default to bf16 caches; see PERF.md).
  --phase {all,calib,recon,sample}  — one phase per process with quant-state
  + calib-set handoff via --state_dir: compiled TPU programs stay resident
  per process and a full pipeline's programs can exhaust device memory on
  the largest models (PERF.md "relay execution semantics").
  --serve {waq,int8,bf16}  — sampling path: fake-quant, native-int8 export
  (fastest measured), or bf16 folded.
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
    # --- production memory / orchestration knobs -------------------------
    p.add_argument("--cache_dtype", type=str, default=None,
                   choices=["float32", "bfloat16"],
                   help="recon activation-cache dtype (task default: bf16 "
                        "for 64x64-latent tasks, f32 otherwise)")
    p.add_argument("--capture_budget_bytes", type=float, default=None,
                   help="cap on a recon group's summed cache bytes")
    p.add_argument("--recon_group_size", type=int, default=None,
                   help="same-shape targets per vmapped recon scan "
                        "(1 = reference-exact sequential order)")
    p.add_argument("--recon_group_window", type=int, default=None)
    p.add_argument("--clear_caches_every", type=int, default=None,
                   help="drop jit executable caches every N recon groups")
    p.add_argument("--phase", default="all",
                   choices=["all", "calib", "recon", "sample"],
                   help="run one pipeline phase per process (state handoff "
                        "in --state_dir); 'all' runs everything in-process")
    p.add_argument("--state_dir", type=str, default=None,
                   help="phase-handoff dir (default <logdir>/state)")
    p.add_argument("--serve", default="waq",
                   choices=["waq", "int8", "bf16", "auto"],
                   help="sampling path: fake-quant / native-int8 export / "
                        "bf16 folded / auto = the measured-best quantized "
                        "export for the architecture family "
                        "(serving_policy.preferred_export_kind)")
    p.add_argument("--export_bundle", type=str, default=None,
                   help="after PTQ, save the packed-int4 UNet deployment "
                        "artifact (codes 2/byte + scales) to this path")
    p.add_argument("--bundle", type=str, default=None,
                   help="(phase=sample) serve the UNet from a saved "
                        "deployment bundle instead of the quant state")
    # --- conditioning ----------------------------------------------------
    p.add_argument("--text_encoder", default="clip",
                   choices=["clip", "bert", "tiny"],
                   help="coco text encoder: local CLIP weights, the BERT "
                        "encoder, or the weightless TinyTextEncoder "
                        "(structure-only runs)")
    p.add_argument("--clip_path", type=str,
                   default="openai/clip-vit-large-patch14")
    p.add_argument("--prompts_file", type=str, default=None,
                   help="text prompts (one per line) for the coco task")
    p.add_argument("--skip_grid", action="store_true",
                   help="skip the grid-0000.png preview save "
                        "(sample_diffusion_ldm_imagenet.py:255-265)")
    p.add_argument("--n_rows", type=int, default=8,
                   help="images per grid row")
    return p


def build_coco_context(args, pipe, n, prompt_dir=None):
    """Prompt embeddings for the coco task via the selected encoder."""
    if args.prompts_file:
        with open(args.prompts_file) as f:
            prompts = [l.strip() for l in f if l.strip()]
    else:
        prompts = [f"a photo, sample {i}" for i in range(n)]
    prompts = (prompts * (-(-n // len(prompts))))[:n]
    if prompt_dir:
        # per-image prompt txt dump (sample_txt2img.py:143-152)
        from eda_dm_tpu.eval.io import save_prompts
        save_prompts(prompts, prompt_dir)
    if args.text_encoder == "clip":
        from eda_dm_tpu.models.encoders import FrozenCLIPTextEncoder
        enc = FrozenCLIPTextEncoder(args.clip_path)
    elif args.text_encoder == "bert":
        from eda_dm_tpu.models.encoders import BERTTextEncoder
        enc = BERTTextEncoder(context_dim=pipe.mc.unet.context_dim,
                              n_layer=4)    # weightless: depth is cosmetic
    else:
        from eda_dm_tpu.models.encoders import TinyTextEncoder
        enc = TinyTextEncoder(context_dim=pipe.mc.unet.context_dim)
    return enc.encode(prompts), enc.encode([""] * n)


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
                          "lamda", "iters", "lr_w", "lr_a", "add_loss",
                          "cache_dtype", "recon_group_size",
                          "recon_group_window")
                 and v is not None}
    if args.capture_budget_bytes is not None:
        overrides["capture_budget_bytes"] = int(args.capture_budget_bytes)
    if args.clear_caches_every is not None:
        overrides["recon_clear_caches_every"] = args.clear_caches_every
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
    if args.serve == "auto":
        from eda_dm_tpu.ops.serving_policy import preferred_export_kind
        args.serve = preferred_export_kind(
            pipe.mc.unet.use_spatial_transformer)
        log.info("serve=auto -> %s (architecture-family policy)",
                 args.serve)
    variables = pipe.init_variables()

    context = uncond = None
    if args.task == "imagenet":
        # shuffled uniform 1000-class labels; uncond token = 1000
        # (sample_diffusion_ldm_imagenet.py:131-139,219-226)
        n = max(cfg.batch_samples, cfg.calib_num_samples)
        rng = np.random.RandomState(args.seed)
        labels = rng.permutation(np.repeat(np.arange(1000),
                                           -(-n // 1000)))[:n]
        context = pipe.ld.get_learned_conditioning(
            variables["cond_stage"], jnp.asarray(labels))
        uncond = pipe.ld.get_learned_conditioning(
            variables["cond_stage"], jnp.full((n,), 1000))
    elif args.task == "coco":
        n = max(cfg.batch_samples, cfg.calib_num_samples)
        context, uncond = build_coco_context(
            args, pipe, n,
            prompt_dir=os.path.join(run_dir, "image_prompts"))

    img_dir = os.path.join(run_dir, "img")
    progress = lambda name, loss: log.info("recon %s loss %.5f", name, loss)

    def save_preview_grid():
        """grid-0000.png from the first saved images, watermarked for the
        SD-family tasks (sample_diffusion_ldm_imagenet.py:206-265)."""
        if args.skip_grid:
            return
        from eda_dm_tpu.data.datasets import iter_image_folder
        from eda_dm_tpu.eval.io import save_grid
        try:
            first = next(iter_image_folder(img_dir, batch_size=64))
        except (StopIteration, FileNotFoundError):
            return
        wm = ("StableDiffusionV1"
              if args.task in ("imagenet", "coco") else None)
        save_grid(first, os.path.join(run_dir, "grid-0000.png"),
                  nrow=args.n_rows, watermark=wm)
        log.info("grid preview saved to %s/grid-0000.png", run_dir)

    def export_bundle(unet_vars):
        if args.export_bundle:
            from eda_dm_tpu.api import save_bundle
            stats = save_bundle(unet_vars, pipe.qc, args.export_bundle)
            log.info("bundle %s: %.1f MB, %.1fx smaller than fp32",
                     args.export_bundle, stats["bundle_bytes"] / 1e6,
                     stats["compression"])

    if args.phase == "all":
        variables, _ = pipe.run(out_dir=img_dir, variables=variables,
                                context=context, uncond=uncond,
                                progress=progress, serve=args.serve)
        export_bundle(variables["unet"])
        save_preview_grid()
        log.info("done; images in %s", img_dir)
        return

    # --- phase-split orchestration (one phase per process) ---------------
    from eda_dm_tpu.utils.checkpointing import (save_quant_state,
                                                load_quant_state)
    state_dir = args.state_dir or os.path.join(
        args.logdir or f"result/{args.task}", "state")
    os.makedirs(state_dir, exist_ok=True)
    qs_path = os.path.join(state_dir, "quant_state")
    cali_path = os.path.join(state_dir, "cali.npz")
    key = jax.random.PRNGKey(cfg.seed)

    if args.phase == "calib":
        k_tdac = jax.random.fold_in(key, 1)
        sel = pipe.tdac_calibration(variables, k_tdac, context=context,
                                    uncond=uncond)
        cali = pipe.build_cali_data(sel, context=context, uncond=uncond)
        variables = pipe.calibrate(variables, cali)
        save_quant_state(qs_path, variables["unet"])
        np.savez(cali_path, **{f"a{i}": np.asarray(a)
                               for i, a in enumerate(cali)})
        log.info("phase=calib complete; state in %s", state_dir)
        return

    if not (args.phase == "sample" and args.bundle):
        variables = {**variables,
                     "unet": load_quant_state(qs_path, variables["unet"])}
    if args.phase == "recon":
        data = np.load(cali_path)
        cali = tuple(jnp.asarray(data[k]) for k in sorted(data.files))
        k_recon = jax.random.fold_in(key, 2)
        variables = pipe.reconstruct(variables, cali, k_recon,
                                     progress=progress)
        save_quant_state(qs_path, variables["unet"])
        log.info("phase=recon complete; state in %s", state_dir)
        return

    # phase == sample
    if args.bundle:
        from eda_dm_tpu.api import load_bundle
        unet_vars, mode = load_bundle(args.bundle)
        serving = {**variables, "unet": unet_vars}
        log.info("serving UNet from bundle %s", args.bundle)
    else:
        serving, mode = pipe.serving_variables(variables, args.serve)
        export_bundle(variables["unet"])
    pipe.sample_fid(serving, out_dir=img_dir, mode=mode,
                    context_fn=pipe.make_context_fn(context, uncond))
    save_preview_grid()
    log.info("done; images in %s", img_dir)


if __name__ == "__main__":
    main()
