"""CIFAR-10 DDIM PTQ pipeline — the reference's
``scripts/sample_diffusion_ddim.py`` rebuilt TPU-first.

Pipeline (sample_diffusion_ddim.py:226-328):
quantized model → first/last 8-bit policy (built into DDPMUNet) →
TDAC calibration trajectory → split shortcut → weight/act scale init →
AdaRound+FBR block reconstruction → 50k-image sampling.

Every stage is a jitted graph: the TDAC trajectory is one scan with fused
feature capture; scale init streams batches through the calibration modes;
reconstruction runs one scan per target; FID sampling reuses a single
compiled sampler for all batches.
"""

from __future__ import annotations

import dataclasses
import logging
import time
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..models.ddpm_unet import DDPMUNet, DDPMConfig, ddpm_recon_plan
from ..models.convert import load_ddpm_checkpoint
from ..quant.config import QuantConfig, QuantMode, FP, WAQ
from ..samplers.schedules import get_beta_schedule, skip_sequence
from ..samplers.ddim import generalized_steps, ddpm_steps
from ..calib.scale_init import set_weight_quantize_params, \
    set_act_quantize_params
from ..calib.tdac import select_calib_set, TDACResult, DENSE_R, plot_t_num
from ..calib.recon import ReconArgs, reconstruct, FP_CAPTURE

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class CifarConfig:
    """Knobs mirror the reference CLI (scripts/task_config.py:3-37) and
    configs/cifar10.yml."""
    # diffusion / sampling
    timesteps: int = 100
    skip_type: str = "quad"
    eta: float = 0.0
    sample_type: str = "generalized"
    num_diffusion_timesteps: int = 1000
    beta_schedule: str = "linear"
    beta_start: float = 1e-4
    beta_end: float = 0.02
    image_size: int = 32
    channels: int = 3
    # quantization
    ptq: bool = True
    weight_bit: int = 4
    act_bit: int = 8
    sm_abit: int = 8
    quant_act: bool = True
    a_sym: bool = False
    split: bool = True
    # calibration / reconstruction
    calib_num_samples: int = 1024
    batch_samples: int = 1024
    lamda: float = 1.2
    recon: bool = True
    iters: int = 5000
    lr_w: float = 5e-1
    lr_a: float = 5e-4
    add_loss: float = 0.8
    input_prob: float = 0.5
    recon_batch_size: int = 32
    capture_batch_size: Optional[int] = None
    # batch adjacent same-shape targets into one vmapped scan (the recon
    # step is latency-bound on TPU; see calib/recon.py::reconstruct_group
    # for the documented capture-order deviation).  1 = reference-exact.
    recon_group_size: int = 4
    # let a group absorb same-shape targets separated by up to this many
    # interleaved targets (bridges block/attn alternation); 0 = adjacent
    recon_group_window: int = 0
    # recon activation-cache dtype (None = f32; 'bfloat16' halves memory)
    cache_dtype: str = None
    # sampling for FID
    max_images: int = 50000
    sample_batch_size: int = 500
    seed: int = 1234
    # model
    arch: DDPMConfig = dataclasses.field(default_factory=DDPMConfig)
    ckpt_path: Optional[str] = None


class CifarPipeline:
    """End-to-end CIFAR PTQ driver (Diffusion class equivalent,
    sample_diffusion_ddim.py:81-223)."""

    def __init__(self, cfg: CifarConfig):
        self.cfg = cfg
        self.qc = QuantConfig(weight_bit=cfg.weight_bit, act_bit=cfg.act_bit,
                              sm_abit=cfg.sm_abit, a_sym=cfg.a_sym,
                              quant_act=cfg.quant_act, split=cfg.split)
        self.model = DDPMUNet(cfg=cfg.arch, qc=self.qc)
        self.betas = get_beta_schedule(
            cfg.beta_schedule, beta_start=cfg.beta_start,
            beta_end=cfg.beta_end,
            num_diffusion_timesteps=cfg.num_diffusion_timesteps)
        self.seq = skip_sequence(cfg.skip_type, cfg.timesteps,
                                 cfg.num_diffusion_timesteps)
        self.root_key = jax.random.PRNGKey(cfg.seed)
        self._sampler_cache = {}

    # ------------------------------------------------------------------
    def init_variables(self, key: Optional[jax.Array] = None):
        """Random-init variables; graft a converted checkpoint if given."""
        cfg = self.cfg
        x = jnp.zeros((1, cfg.image_size, cfg.image_size, cfg.channels))
        t = jnp.zeros((1,))
        variables = self.model.init(key or self.root_key, x, t, FP)
        if cfg.ckpt_path:
            params = load_ddpm_checkpoint(cfg.ckpt_path)
            variables = {**variables,
                         "params": jax.tree.map(jnp.asarray, params)}
        return variables

    # ------------------------------------------------------------------
    def tdac_calibration(self, variables, key) -> Tuple[jnp.ndarray, jnp.ndarray, TDACResult]:
        """FP trajectory + TDAC selection (calibration.py:12-153).

        The mid-block attention input is captured in the same fused forward
        that computes eps (hook on model.mid.attn_1, calibration.py:28).
        """
        cfg = self.cfg
        key, k_noise, k_sel, k_traj = jax.random.split(key, 4)
        shape = (cfg.batch_samples, cfg.image_size, cfg.image_size,
                 cfg.channels)
        x_T = jax.random.normal(k_noise, shape)

        def model_aux(x, t):
            out, taps = self.model.apply(variables, x, t, FP_CAPTURE,
                                         mutable=["taps"])
            return out, taps["taps"]["mid_attn_1"]["block_in"]

        _, traj = jax.jit(lambda xx: generalized_steps(
            xx, self.seq, model_aux, self.betas, eta=cfg.eta, key=k_traj,
            record_xt=True, model_returns_aux=True))(x_T)

        sel = select_calib_set(traj["x"], traj["aux"], self.seq, cfg.lamda,
                               cfg.calib_num_samples, DENSE_R["cifar"], k_sel)
        return sel.calib_x, sel.calib_t, sel

    # ------------------------------------------------------------------
    def calibrate(self, variables, cali_data):
        """Scale init (sample_diffusion_ddim.py:288-289)."""
        variables = set_weight_quantize_params(self.model, variables,
                                               cali_data)
        variables = set_act_quantize_params(self.model, variables, cali_data)
        return variables

    # ------------------------------------------------------------------
    def reconstruct(self, variables, cali_data, key,
                    progress=None, checkpoint_dir=None):
        """Block/layer reconstruction (sample_diffusion_ddim.py:290-319).

        ``checkpoint_dir`` enables per-group checkpoint/resume
        (utils/checkpointing.py::resumable_reconstruct), same contract as
        the latent pipeline."""
        cfg = self.cfg
        args = ReconArgs(iters=cfg.iters, batch_size=cfg.recon_batch_size,
                         lr_w=cfg.lr_w, lr_a=cfg.lr_a, add_loss=cfg.add_loss,
                         input_prob=cfg.input_prob,
                         capture_batch_size=cfg.capture_batch_size,
                         cache_dtype=cfg.cache_dtype)
        plan = ddpm_recon_plan(cfg.arch, self.qc)
        if checkpoint_dir is not None:
            from ..utils.checkpointing import resumable_reconstruct
            return resumable_reconstruct(
                self.model, variables, cali_data, plan, args, key,
                checkpoint_dir, progress=progress,
                group_size=cfg.recon_group_size,
                group_window=cfg.recon_group_window)
        return reconstruct(self.model, variables, cali_data, plan, args, key,
                           progress=progress,
                           group_size=cfg.recon_group_size,
                           group_window=cfg.recon_group_window)

    # ------------------------------------------------------------------
    def sampler_fn(self, variables, mode: QuantMode = WAQ):
        # serving trees carry bf16 params: feed the UNet its carrier dtype
        # (an f32 input would promote every layer back to f32 and double
        # the activation HBM traffic); the sampler's own update math stays
        # in the caller's dtype.  No-op for f32 (WAQ/calib) trees.
        from ..quant.export import carrier_dtype
        ct = carrier_dtype(variables)

        def model_fn(x, t):
            out = self.model.apply(variables, x.astype(ct), t, mode)
            return out.astype(x.dtype)
        return model_fn

    def sample_batch(self, variables, key, batch_size: Optional[int] = None,
                     mode: QuantMode = WAQ):
        """One jitted sampling batch → images in [0, 1]
        (sample_fid + inverse_data_transform,
        sample_diffusion_ddim.py:171-206, ddim/datasets/__init__.py:221)."""
        cfg = self.cfg
        bs = batch_size or cfg.sample_batch_size
        k_noise, k_samp = jax.random.split(key)
        x_T = jax.random.normal(
            k_noise, (bs, cfg.image_size, cfg.image_size, cfg.channels))
        model_fn = self.sampler_fn(variables, mode)
        if cfg.sample_type == "generalized":
            x, _ = generalized_steps(x_T, self.seq, model_fn, self.betas,
                                     eta=cfg.eta, key=k_samp)
        else:
            x = ddpm_steps(x_T, self.seq, model_fn, self.betas, key=k_samp)
        return jnp.clip((x + 1.0) / 2.0, 0.0, 1.0)

    def sample_fid(self, variables, out_dir: Optional[str] = None,
                   max_images: Optional[int] = None,
                   mode: QuantMode = WAQ):
        """Generate the FID set batch-by-batch with one compiled sampler."""
        cfg = self.cfg
        total = max_images or cfg.max_images
        bs = min(cfg.sample_batch_size, total)
        # one compiled sampler per (batch, mode) across all sample_fid calls
        cache_key = (bs, mode)
        if cache_key not in self._sampler_cache:
            self._sampler_cache[cache_key] = jax.jit(
                lambda v, k: self.sample_batch(v, k, batch_size=bs,
                                               mode=mode))
        sample = self._sampler_cache[cache_key]
        key = jax.random.PRNGKey(cfg.seed)
        n_rounds = -(-total // bs)
        images = [] if out_dir is None else None
        img_id = 0
        t0 = time.time()
        for r in range(n_rounds):
            key, sub = jax.random.split(key)
            batch = sample(variables, sub)
            batch = np.asarray(batch)
            take = min(bs, total - img_id)
            if out_dir is None:
                images.append(batch[:take])
            else:
                from ..eval.io import save_images
                save_images(batch[:take], out_dir, start_index=img_id)
            img_id += take
            if r == 0:
                logger.info("first sampling batch done in %.1fs",
                            time.time() - t0)
        logger.info("sampled %d images in %.1fs (%.2f img/s)", img_id,
                    time.time() - t0, img_id / max(time.time() - t0, 1e-9))
        if out_dir is None:
            return np.concatenate(images)
        return None

    # ------------------------------------------------------------------
    def serving_variables(self, variables, serve: str = "waq"):
        """Deployment export of the quantized UNet: (variables, serve_mode).
        serve='waq' keeps the fake-quant tree; 'fp' the unquantized FP32
        baseline; 'int8'/'bf16'/'fold' run quant/export with their paired
        modes (mirrors LDMPipeline.serving_variables)."""
        if serve == "waq":
            return variables, WAQ
        if serve == "fp":
            return variables, FP
        from ..api import export_for_serving
        return export_for_serving(variables, self.qc, kind=serve)

    def run(self, out_dir: Optional[str] = None, variables=None,
            progress=None, serve: str = "waq"):
        """Full PTQ flow (sample_diffusion_ddim.py:265-323)."""
        key = self.root_key
        if variables is None:
            variables = self.init_variables()
        if self.cfg.ptq:
            key, k_tdac, k_recon = jax.random.split(key, 3)
            calib_x, calib_t, _sel = self.tdac_calibration(variables, k_tdac)
            cali_data = (calib_x, calib_t)
            variables = self.calibrate(variables, cali_data)
            if self.cfg.recon:
                variables = self.reconstruct(variables, cali_data, k_recon,
                                             progress=progress)
        serving, mode = self.serving_variables(variables, serve)
        return variables, self.sample_fid(serving, out_dir=out_dir,
                                          mode=mode)
