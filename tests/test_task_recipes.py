"""Pin TASK_DEFAULTS / CifarConfig to the reference's *active* W4A8 recipes.

The reference run scripts (/root/reference/scripts/for_*.sh) carry two
recipe lines per task: a commented-out W8A8 line and the active W4A8 line.
The active line's flags override the argparse defaults in task_config.py,
and they are what the paper's headline numbers use — so the pipeline
defaults must match the *scripts*, not the parsers.  This test parses the
active (uncommented) command of each for_*.sh and asserts our defaults.

When the reference checkout is absent (e.g. a standalone deployment of
this repo), the literals below still pin the values; the parse step is
skipped.
"""

import os
import re

import pytest

from eda_dm_tpu.pipelines.latent import TASK_DEFAULTS, LDMTaskConfig, task_config
from eda_dm_tpu.pipelines.cifar import CifarConfig

REF_SCRIPTS = "/root/reference/scripts"

# task -> (script, flag -> expected value).  Literals cite the active W4A8
# lines: for_bedroom.sh:11-17, for_church.sh:11-17, for_imagenet.sh:10-16,
# for_coco.sh:11-18, for_cifar.sh:10-17.
EXPECTED = {
    "bedroom": ("for_bedroom.sh", {
        "custom_steps": 200, "eta": 1.0, "weight_bit": 4, "act_bit": 8,
        "calib_num_samples": 1024, "batch_samples": 64,
        "lamda": 1.0, "lr_w": 1e-2, "lr_a": 5e-3, "add_loss": 1.0,
        "batch_size": 50, "n_samples": 50000,
    }),
    "church": ("for_church.sh", {
        "custom_steps": 500, "eta": 0.0, "weight_bit": 4, "act_bit": 8,
        "calib_num_samples": 1024, "batch_samples": 64,
        "lamda": 1.0, "lr_w": 5e-2, "lr_a": 1e-4, "add_loss": 1.0,
        "batch_size": 100, "n_samples": 50000,
    }),
    "imagenet": ("for_imagenet.sh", {
        "custom_steps": 20, "weight_bit": 4, "act_bit": 8, "sm_abit": 8,
        "calib_num_samples": 1024, "batch_samples": 64,
        "lamda": 1.2, "lr_w": 5e-1, "lr_a": 1e-4, "add_loss": 0.8,
        "n_samples": 50000,
    }),
    "coco": ("for_coco.sh", {
        "weight_bit": 4, "act_bit": 8, "sm_abit": 8,
        "calib_num_samples": 256, "batch_samples": 8,
        "lamda": 5.0, "lr_w": 3e-2, "lr_a": 1e-4, "add_loss": 0.8,
        "n_samples": 10000,
    }),
}

CIFAR_EXPECTED = ("for_cifar.sh", {
    "timesteps": 100, "eta": 0.0, "weight_bit": 4, "act_bit": 8,
    "calib_num_samples": 1024, "batch_samples": 1024,
    "lamda": 1.2, "lr_w": 5e-1, "lr_a": 5e-4, "add_loss": 0.8,
    "max_images": 50000,
})

# reference CLI flag name -> our config field, where they differ
FLAG_ALIASES = {
    "ddim_eta": "eta", "n_batch": "batch_size", "max_images": "n_samples",
}


def _parse_active_recipe(path):
    """Extract flag->value from the active (uncommented) command."""
    with open(path) as f:
        text = f.read()
    lines = [ln.rstrip("\\").strip() for ln in text.splitlines()
             if not ln.lstrip().startswith("#") and ln.strip()]
    cmd = " ".join(lines)
    flags = {}
    for m in re.finditer(r"--(\w+)(?:\s+([^-\s][^\s]*))?", cmd):
        name, val = m.group(1), m.group(2)
        if val is None:
            flags[name] = True
            continue
        try:
            flags[name] = int(val)
        except ValueError:
            try:
                flags[name] = float(val)
            except ValueError:
                flags[name] = val
    return flags


def _cfg_field(cfg, ref_flag):
    name = FLAG_ALIASES.get(ref_flag, ref_flag)
    if not hasattr(cfg, name):
        name = ref_flag          # e.g. CifarConfig keeps 'max_images'
    return getattr(cfg, name)


@pytest.mark.parametrize("task", sorted(EXPECTED))
def test_ldm_task_defaults_match_reference_recipes(task):
    script, expected = EXPECTED[task]
    cfg = task_config(task)
    for flag, val in expected.items():
        got = _cfg_field(cfg, flag)
        assert got == val, f"{task}.{flag}: ours {got} != recipe {val}"
    # and, when available, the literals themselves match the checkout
    path = os.path.join(REF_SCRIPTS, script)
    if os.path.exists(path):
        parsed = _parse_active_recipe(path)
        for flag, val in expected.items():
            ref_flag = flag
            for alias, ours in FLAG_ALIASES.items():
                if ours == flag and alias in parsed:
                    ref_flag = alias
            if flag == "batch_size" and "batch_size" not in parsed:
                ref_flag = "n_batch"
            if flag == "n_samples" and "n_samples" not in parsed:
                ref_flag = "max_images"
            assert parsed.get(ref_flag) == val, \
                f"{script} --{ref_flag}: recipe {parsed.get(ref_flag)} != pinned {val}"


def test_cifar_defaults_match_reference_recipe():
    script, expected = CIFAR_EXPECTED
    cfg = CifarConfig()
    for flag, val in expected.items():
        got = _cfg_field(cfg, flag)
        assert got == val, f"cifar.{flag}: ours {got} != recipe {val}"
    path = os.path.join(REF_SCRIPTS, script)
    if os.path.exists(path):
        parsed = _parse_active_recipe(path)
        for flag, val in expected.items():
            ref_flag = flag
            if flag == "eta":
                # for_cifar passes --eta 0 (int)
                assert float(parsed.get("eta")) == val
                continue
            if flag == "timesteps":
                ref_flag = "timesteps"
            assert float(parsed.get(ref_flag)) == float(val), \
                f"{script} --{ref_flag}: recipe {parsed.get(ref_flag)} != pinned {val}"


def test_all_ldm_tasks_construct():
    for task in EXPECTED:
        cfg = task_config(task)
        assert isinstance(cfg, LDMTaskConfig)
        assert cfg.iters == (5000 if task in ("bedroom", "church") else 1000)


def test_serving_variables_fp_mode():
    """serve='fp' returns the unquantized tree + FP mode (the acceleration
    -ratio denominator, reference README.md:92-124) and keeps an f32
    carrier; 'waq' returns the tree untouched with WAQ."""
    import jax
    from eda_dm_tpu.pipelines.latent import LDMPipeline
    from eda_dm_tpu.quant import FP, WAQ
    from eda_dm_tpu.quant.export import carrier_dtype
    import jax.numpy as jnp

    cfg = task_config("bedroom", calib_num_samples=4, batch_samples=4)
    pipe = LDMPipeline.__new__(LDMPipeline)    # no model build needed
    pipe.qc = None
    variables = {"unet": {"params": {"w": jnp.ones((2, 2), jnp.float32)}}}
    sv, mode = LDMPipeline.serving_variables(pipe, variables, "fp")
    assert mode is FP and sv is variables
    assert carrier_dtype(sv["unet"]) == jnp.float32
    sv, mode = LDMPipeline.serving_variables(pipe, variables, "waq")
    assert mode is WAQ and sv is variables
