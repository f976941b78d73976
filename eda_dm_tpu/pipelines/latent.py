"""Latent-diffusion PTQ pipelines: LSUN-Bedroom, LSUN-Church, ImageNet
(class-conditional CFG) and COCO text-to-image (Stable Diffusion).

Rebuilds the four reference entry scripts
(/root/reference/scripts/sample_diffusion_ldm_{bedroom,church,imagenet}.py,
sample_txt2img.py) on one parameterized driver: quantized-UNet wrap →
TDAC trajectory calibration (bedroom/church: calibration.py:156-370;
imagenet: :371-499; coco: :502-638) → scale init (the reference's
set_*_quantize_params_{LDM,Conditional,Stable} replay collapses to
streaming the TDAC set through the calibration modes — the quantizers only
ever see the UNet inputs the replay would feed them) → AdaRound+FBR block
reconstruction → batched sampling → FP VAE decode.

Conditional tasks assemble the classifier-free-guidance calibration batches
exactly like qdiff_control/data_utils.py:28-31: x_in = [x;x], t_in = [t;t],
c_in = [uncond; cond].
"""

from __future__ import annotations

import dataclasses
import logging
import time
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..models.latent_diffusion import (LatentDiffusion, LatentDiffusionConfig,
                                       bedroom_config, church_config,
                                       imagenet_config, sd_v1_config)
from ..models.ldm_unet import ldm_recon_plan, build_layout
from ..quant.config import QuantConfig, QuantMode, FP, WAQ
from ..samplers.latent import (make_ldm_schedule, ldm_ddim_sample,
                               ldm_plms_sample, cfg_model_fn, LDMSchedule)
from ..calib.scale_init import set_weight_quantize_params, \
    set_act_quantize_params
from ..calib.tdac import select_calib_set, DENSE_R
from ..calib.recon import ReconArgs, reconstruct, FP_CAPTURE
from ..utils.run import relay_mode

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class LDMTaskConfig:
    """Per-task knobs; defaults follow scripts/task_config.py."""
    task: str = "bedroom"                 # bedroom|church|imagenet|coco
    custom_steps: int = 200
    eta: float = 1.0
    sampler: str = "ddim"                 # 'ddim' | 'plms'
    scale: float = 1.0                    # CFG guidance scale
    # quant
    weight_bit: int = 4
    act_bit: int = 8
    sm_abit: int = 8
    a_sym: bool = False
    split: bool = True
    quant_act: bool = True
    # calibration / recon
    calib_num_samples: int = 1024
    batch_samples: int = 64
    lamda: float = 100.0
    iters: int = 5000
    lr_w: float = 1e-2
    lr_a: float = 5e-3
    add_loss: float = 0.001
    input_prob: float = 0.5
    recon_batch_size: int = 32
    capture_batch_size: Optional[int] = None
    # scale-init streaming batch: LDM attention weights at 32x32 latents are
    # (B, heads, 1024, 1024) — batch 256 would materialize 15 GB tensors
    # (and overflow int32 flat indexing in the histogram search); 64 still
    # OOMed on the 16 GB chip with the calib graph's concurrent liveness
    calib_batch_size: int = 32
    # batch adjacent same-shape targets into one vmapped scan
    # (calib/recon.py::reconstruct_group); 1 = reference-exact order
    recon_group_size: int = 4
    # let a group absorb same-shape targets separated by up to this many
    # interleaved targets (bridges block/attn alternation); 0 = adjacent
    recon_group_window: int = 0
    # drop jit executable caches every N recon groups (compiled TPU programs
    # occupy device memory; see calib/recon.py::reconstruct) — 0 = never
    recon_clear_caches_every: int = 6
    # store recon activation caches at this dtype ('bfloat16' halves the
    # 64x64-latent captures so full calib-1024 plans fit one chip)
    cache_dtype: str = None
    # cap on a recon group's summed cache bytes (calib/recon.py)
    capture_budget_bytes: int = 6_000_000_000
    recon: bool = True
    # sampling
    n_samples: int = 50000
    batch_size: int = 50
    seed: int = 1234
    ckpt_path: Optional[str] = None


TASK_DEFAULTS = {
    # The *active* W4A8 recipe lines of the reference run scripts — these
    # override the argparse defaults of scripts/task_config.py and are the
    # hyperparameters the paper's headline numbers use:
    #   for_bedroom.sh:11-17  (--lamda 1.0 --lr_w 1e-2 --lr_a 5e-3 --add_loss 1.0)
    #   for_church.sh:11-17   (--lamda 1.0 --lr_w 5e-2 --lr_a 1e-4 --add_loss 1.0)
    #   for_imagenet.sh:10-16 (--lamda 1.2 --lr_w 5e-1 --lr_a 1e-4 --add_loss 0.8)
    #   for_coco.sh:11-18     (--lamda 5.0 --lr_w 3e-2 --lr_a 1e-4 --add_loss 0.8)
    # Pinned against the reference scripts by tests/test_task_recipes.py.
    # cache_dtype: 64×64-latent tasks default to bf16 activation caches —
    # measured f32 caches alone exceed the 16 GB chip at calib 1024
    # (PERF.md); church's 32² latents fit in f32.
    "bedroom": dict(custom_steps=200, eta=1.0, lamda=1.0, lr_w=1e-2,
                    lr_a=5e-3, add_loss=1.0, iters=5000, batch_size=50,
                    cache_dtype="bfloat16"),
    "church": dict(custom_steps=500, eta=0.0, lamda=1.0, lr_w=5e-2,
                   lr_a=1e-4, add_loss=1.0, iters=5000, batch_size=100),
    "imagenet": dict(custom_steps=20, eta=0.0, scale=3.0, lamda=1.2,
                     lr_w=5e-1, lr_a=1e-4, add_loss=0.8, iters=1000,
                     batch_size=50, cache_dtype="bfloat16"),
    "coco": dict(custom_steps=50, eta=0.0, scale=7.5, sampler="plms",
                 lamda=5.0, lr_w=3e-2, lr_a=1e-4, add_loss=0.8, iters=1000,
                 calib_num_samples=256, batch_samples=8, batch_size=4,
                 n_samples=10000, recon_batch_size=2,
                 cache_dtype="bfloat16"),
}

MODEL_CONFIGS = {
    "bedroom": bedroom_config,
    "church": church_config,
    "imagenet": imagenet_config,
    "coco": sd_v1_config,
}


def task_config(task: str, **overrides) -> LDMTaskConfig:
    kw = dict(TASK_DEFAULTS[task])
    kw.update(overrides)
    return LDMTaskConfig(task=task, **kw)


class LDMPipeline:
    """Shared driver for the four latent tasks."""

    def __init__(self, cfg: LDMTaskConfig,
                 model_cfg: Optional[LatentDiffusionConfig] = None):
        self.cfg = cfg
        self.qc = QuantConfig(weight_bit=cfg.weight_bit, act_bit=cfg.act_bit,
                              sm_abit=cfg.sm_abit, a_sym=cfg.a_sym,
                              quant_act=cfg.quant_act, split=cfg.split)
        self.mc = model_cfg or MODEL_CONFIGS[cfg.task]()
        self.ld = LatentDiffusion(self.mc, self.qc)
        self.sched = make_ldm_schedule(
            num_timesteps=self.mc.timesteps,
            linear_start=self.mc.linear_start,
            linear_end=self.mc.linear_end, ddim_steps=cfg.custom_steps,
            eta=cfg.eta)
        self.root_key = jax.random.PRNGKey(cfg.seed)
        self.is_conditional = cfg.scale != 1.0 and self.mc.cond != "none"
        self._sampler_cache = {}

    # ------------------------------------------------------------------
    def init_variables(self, key: Optional[jax.Array] = None):
        variables = self.ld.init_variables(key or self.root_key)
        if self.cfg.ckpt_path:
            variables = self.ld.load_checkpoint(variables, self.cfg.ckpt_path)
        return variables

    # ------------------------------------------------------------------
    def _mid_tap_key(self) -> Tuple[str, ...]:
        """Path of middle_block[1]'s input tap (the TDAC feature hook,
        calibration.py:167/275/387/520)."""
        return ("middle_block_1", "block_in")

    def unet_fn(self, unet_vars, context=None, mode: QuantMode = FP,
                with_aux: bool = False):
        def fn(x, t, ctx=None):
            return self.ld.apply_model(unet_vars, x, t,
                                       context=ctx if ctx is not None
                                       else context, mode=mode)

        if not with_aux:
            return fn

        def fn_aux(x, t):
            out, taps = self.ld.unet.apply(
                unet_vars, x, t, context=context,
                mode=mode.replace(capture=True), mutable=["taps"])
            feat = taps["taps"]
            for k in self._mid_tap_key():
                feat = feat[k]
            return out, feat
        return fn_aux

    # ------------------------------------------------------------------
    def tdac_calibration(self, variables, key, context=None, uncond=None):
        """TDAC over FP sampler trajectories.

        Mirrors the LDM generators (calibration.py:156-370 etc.): when
        calib_num_samples > batch_samples, multiple trajectory batches are
        generated; the density/diversity scores come from the *first*
        batch's mid-block features (hooks only on i == 0,
        calibration.py:390-410), and each batch contributes its slice of
        the selected latents.  For CFG tasks the model runs the doubled
        batch per step; ``context``/``uncond`` rows align with the
        calibration sample index (length >= calib_num_samples, or
        batch_samples for a shared batch).
        """
        cfg = self.cfg
        res = self.mc.unet.image_size
        B = cfg.batch_samples
        n_batches = max(1, cfg.calib_num_samples // B)
        unet_vars = variables["unet"]

        sample_fn = (ldm_plms_sample if cfg.sampler == "plms"
                     else ldm_ddim_sample)

        def make_model_aux(uv, ctx_b, unc_b, with_feat):
            if self.is_conditional:
                def model_aux(x, t):
                    x_in = jnp.concatenate([x, x])
                    t_in = jnp.concatenate([t, t])
                    c_in = jnp.concatenate([unc_b, ctx_b])
                    mode = FP.replace(capture=with_feat)
                    if with_feat:
                        out, taps = self.ld.unet.apply(
                            uv, x_in, t_in, context=c_in, mode=mode,
                            mutable=["taps"])
                        feat = taps["taps"]
                        for k in self._mid_tap_key():
                            feat = feat[k]
                    else:
                        out = self.ld.unet.apply(uv, x_in, t_in,
                                                 context=c_in, mode=mode)
                        feat = jnp.zeros(())
                    e_u, e_c = jnp.split(out, 2)
                    return e_u + cfg.scale * (e_c - e_u), feat
                return model_aux
            if with_feat:
                return self.unet_fn(uv, context=ctx_b, mode=FP,
                                    with_aux=True)
            fn = self.unet_fn(uv, context=ctx_b, mode=FP)
            return lambda x, t: (fn(x, t), jnp.zeros(()))

        def traj_fn(with_feat: bool):
            """One jitted trajectory per with_feat value, with variables,
            context rows and keys as *arguments* — a per-batch
            jit(lambda) here recompiled the full multi-hundred-step scan
            for every trajectory batch (measured ~1 h of host compile on
            the bedroom config)."""
            key_ = ("tdac_traj", with_feat)
            if key_ not in self._sampler_cache:
                def fn(uv, x_T, ctx_b, unc_b, k_traj):
                    model_aux = make_model_aux(uv, ctx_b, unc_b, with_feat)
                    _, traj = sample_fn(x_T, self.sched, model_aux,
                                        key=k_traj, record_xt=True,
                                        model_returns_aux=True)
                    return traj
                self._sampler_cache[key_] = jax.jit(fn)
            return self._sampler_cache[key_]

        def run_traj(k_noise, k_traj, ctx_b, unc_b, with_feat):
            x_T = jax.random.normal(
                k_noise, (B, res, res, self.mc.unet.in_channels))
            return traj_fn(with_feat)(unet_vars, x_T, ctx_b, unc_b, k_traj)

        def ctx_slice(arr, r):
            if arr is None:
                return None
            if arr.shape[0] >= (r + 1) * B:
                return arr[r * B:(r + 1) * B]
            return arr[:B]

        key, k_sel = jax.random.split(key)
        keys = jax.random.split(key, 2 * n_batches).reshape(n_batches, 2, -1)

        traj0 = run_traj(keys[0, 0], keys[0, 1], ctx_slice(context, 0),
                         ctx_slice(uncond, 0), with_feat=True)
        dense_r = DENSE_R.get(cfg.task, 3.0)
        # ascending seq: select_calib_set maps code c → seq[len-1-c]
        # (calibration.py:146-149), i.e. step 0 (= x_T) → largest t
        sel = select_calib_set(traj0["x"], traj0["aux"],
                               self.sched.ddim_timesteps, cfg.lamda,
                               cfg.calib_num_samples, dense_r, k_sel)
        if n_batches == 1:
            return sel

        # gather each batch's slice from its own trajectory
        pos = np.arange(B)
        chunks = [sel.calib_x[:B]]
        for r in range(1, n_batches):
            traj_r = run_traj(keys[r, 0], keys[r, 1], ctx_slice(context, r),
                              ctx_slice(uncond, r), with_feat=False)
            codes_r = jnp.asarray(sel.time_codes[r * B:(r + 1) * B])
            chunks.append(traj_r["x"][codes_r, jnp.asarray(pos)])
        sel.calib_x = jnp.concatenate(chunks)
        return sel

    # ------------------------------------------------------------------
    def build_cali_data(self, sel, context=None, uncond=None):
        """Assemble the calibration batch tuple the UNet consumes.

        Unconditional: (x, t).  Conditional (CFG): doubled rows with
        [uncond; cond] contexts (qdiff_control/data_utils.py:28-31).
        """
        if not self.is_conditional:
            return (sel.calib_x, sel.calib_t)
        n = sel.calib_x.shape[0]
        if context.shape[0] >= n:
            ctx = jnp.asarray(context)[:n]
            unc = jnp.asarray(uncond)[:n]
        else:
            pos = jnp.asarray(np.arange(n) % context.shape[0])
            ctx = jnp.asarray(context)[pos]
            unc = jnp.asarray(uncond)[pos]
        x2 = jnp.concatenate([sel.calib_x, sel.calib_x])
        t2 = jnp.concatenate([sel.calib_t, sel.calib_t])
        c2 = jnp.concatenate([unc, ctx])
        return (x2, t2, c2)

    # ------------------------------------------------------------------
    def calibrate(self, variables, cali_data):
        unet_vars = variables["unet"]
        unet_vars = set_weight_quantize_params(self.ld.unet, unet_vars,
                                               cali_data)
        unet_vars = set_act_quantize_params(
            self.ld.unet, unet_vars, cali_data,
            batch_size=self.cfg.calib_batch_size)
        return {**variables, "unet": unet_vars}

    def reconstruct(self, variables, cali_data, key, progress=None,
                    checkpoint_dir: Optional[str] = None):
        cfg = self.cfg
        args = ReconArgs(iters=cfg.iters, batch_size=cfg.recon_batch_size,
                         lr_w=cfg.lr_w, lr_a=cfg.lr_a, add_loss=cfg.add_loss,
                         input_prob=cfg.input_prob,
                         capture_batch_size=(cfg.capture_batch_size
                                             or cfg.calib_batch_size),
                         cache_dtype=cfg.cache_dtype,
                         capture_budget_bytes=cfg.capture_budget_bytes)
        plan = ldm_recon_plan(self.mc.unet, self.qc)
        # relay-only mitigation: resident compiled programs + lying
        # block_until_ready pile up transients (utils/run.py::relay_mode)
        clear_every = (cfg.recon_clear_caches_every if relay_mode() else 0)
        if checkpoint_dir is not None:
            from ..utils.checkpointing import resumable_reconstruct
            unet_vars = resumable_reconstruct(
                self.ld.unet, variables["unet"], cali_data, plan, args, key,
                checkpoint_dir, progress=progress,
                group_size=cfg.recon_group_size,
                group_window=cfg.recon_group_window,
                clear_caches_every=clear_every)
        else:
            unet_vars = reconstruct(self.ld.unet, variables["unet"],
                                    cali_data, plan, args, key,
                                    progress=progress,
                                    group_size=cfg.recon_group_size,
                                    group_window=cfg.recon_group_window,
                                    clear_caches_every=clear_every)
        return {**variables, "unet": unet_vars}

    # ------------------------------------------------------------------
    def sample_batch(self, variables, key, batch_size: Optional[int] = None,
                     context=None, uncond=None, mode: QuantMode = WAQ,
                     decode: bool = True):
        """One jitted sampling batch (+ FP VAE decode → images in [0,1])."""
        cfg = self.cfg
        bs = batch_size or cfg.batch_size
        res = self.mc.unet.image_size
        k_noise, k_samp = jax.random.split(key)
        x_T = jax.random.normal(
            k_noise, (bs, res, res, self.mc.unet.in_channels))

        # serving trees carry bf16 UNet params: feed the UNet its carrier
        # dtype so the activations don't promote back to f32 (see
        # quant/export.py::carrier_dtype); sampler math stays f32
        from ..quant.export import carrier_dtype
        ct = carrier_dtype(variables["unet"])
        apply_fn = lambda x, t, c: self.ld.apply_model(
            variables["unet"], x.astype(ct), t,
            context=(None if c is None else c.astype(ct)),
            mode=mode).astype(x.dtype)
        model_fn = cfg_model_fn(apply_fn, context, uncond,
                                cfg.scale if self.is_conditional else 1.0)
        if cfg.sampler == "dpm":
            # DPMSolverSampler equivalent (ldm/models/diffusion/dpm_solver/
            # sampler.py:8-82): multistep DPM-Solver++ order 2
            from ..samplers.dpm_solver import NoiseScheduleVP, \
                dpm_solver_sample
            ns = NoiseScheduleVP("discrete", betas=self.sched.betas)
            z = dpm_solver_sample(x_T, model_fn, ns,
                                  steps=cfg.custom_steps, order=2,
                                  algorithm_type="dpmsolver++")
        else:
            sample_fn = (ldm_plms_sample if cfg.sampler == "plms"
                         else ldm_ddim_sample)
            z, _ = sample_fn(x_T, self.sched, model_fn, key=k_samp)
        if not decode:
            return z
        img = self.ld.decode_first_stage(variables["first_stage"], z)
        return jnp.clip((img + 1.0) / 2.0, 0.0, 1.0)

    def sample_fid(self, variables, out_dir: Optional[str] = None,
                   n_samples: Optional[int] = None, context_fn=None,
                   mode: QuantMode = WAQ):
        """Batched FID-set generation with per-batch throughput logging
        (sample_diffusion_ldm_bedroom.py:98-167)."""
        cfg = self.cfg
        total = n_samples or cfg.n_samples
        bs = min(cfg.batch_size, total)
        key = jax.random.PRNGKey(cfg.seed)
        cache_key = (bs, mode)
        if cache_key not in self._sampler_cache:
            self._sampler_cache[cache_key] = jax.jit(
                lambda v, k, ctx, unc: self.sample_batch(
                    v, k, batch_size=bs, context=ctx, uncond=unc, mode=mode))
        sample = self._sampler_cache[cache_key]
        images = [] if out_dir is None else None
        img_id = 0
        while img_id < total:
            key, sub = jax.random.split(key)
            ctx, unc = context_fn(img_id, bs) if context_fn else (None, None)
            t0 = time.time()
            batch = np.asarray(sample(variables, sub, ctx, unc))
            logger.info("batch throughput %.3f img/s",
                        bs / max(time.time() - t0, 1e-9))
            take = min(bs, total - img_id)
            if out_dir is None:
                images.append(batch[:take])
            else:
                from ..eval.io import save_images
                save_images(batch[:take], out_dir, start_index=img_id)
            img_id += take
        return np.concatenate(images) if out_dir is None else None

    # ------------------------------------------------------------------
    @staticmethod
    def make_context_fn(context, uncond):
        """Batch-cycling conditioning for the FID sweep.

        The reference samples all 1000 ImageNet classes 50×, shuffled,
        consumed batch-by-batch (sample_diffusion_ldm_imagenet.py:131-139);
        COCO walks 10k distinct prompts (sample_txt2img.py:134-152).  Each
        sampling batch therefore gets rows ``img_id : img_id+bs`` of the
        conditioning tensor (wrapping when fewer rows than n_samples are
        provided), never the same leading slice.
        """
        if context is None:
            return None
        context = jnp.asarray(context)
        uncond = jnp.asarray(uncond) if uncond is not None else None

        def rows(arr, start, count):
            idx = jnp.asarray(np.arange(start, start + count) % arr.shape[0])
            return arr[idx]

        def context_fn(img_id: int, bs: int):
            return (rows(context, img_id, bs),
                    rows(uncond, img_id, bs) if uncond is not None else None)
        return context_fn

    def serving_variables(self, variables, serve: str = "waq"):
        """Deployment export of the quantized UNet: returns (variables,
        serve_mode).  serve='waq' keeps the fake-quant tree (mode WAQ);
        'fp' serves the unquantized FP32 model (the acceleration-ratio
        baseline, reference README.md:92-124); 'fpbf16' the same model
        with a dtype-only bf16 cast — the strongest *unquantized*
        configuration on TPU and the honest float denominator (see
        bench.py); 'int8'/'bf16'/'fold' run quant/export with the paired
        mode."""
        if serve == "waq":
            return variables, WAQ
        if serve == "fp":
            return variables, FP
        if serve == "fpbf16":
            unet16 = jax.tree.map(
                lambda a: a.astype(jnp.bfloat16)
                if hasattr(a, "dtype") and a.dtype == jnp.float32 else a,
                variables["unet"])
            return {**variables, "unet": unet16}, FP
        from ..api import export_for_serving
        unet_vars, mode = export_for_serving(variables["unet"], self.qc,
                                             kind=serve)
        return {**variables, "unet": unet_vars}, mode

    def run(self, out_dir: Optional[str] = None, variables=None,
            context=None, uncond=None, progress=None, serve: str = "waq"):
        key = self.root_key
        if variables is None:
            variables = self.init_variables()
        key, k_tdac, k_recon = jax.random.split(key, 3)
        sel = self.tdac_calibration(variables, k_tdac, context=context,
                                    uncond=uncond)
        cali_data = self.build_cali_data(sel, context=context, uncond=uncond)
        variables = self.calibrate(variables, cali_data)
        if self.cfg.recon:
            variables = self.reconstruct(variables, cali_data, k_recon,
                                         progress=progress)
        serving, mode = self.serving_variables(variables, serve)
        images = self.sample_fid(
            serving, out_dir=out_dir, mode=mode,
            context_fn=self.make_context_fn(context, uncond))
        return variables, images
