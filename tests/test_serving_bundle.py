"""Packed-int4 serving bundle: compression + bit-identical restore.

The bundle is the deployment hand-off artifact (reference ships its W4A8
weights the same way, README.md:70-73): 4-bit codes packed two-per-byte,
scales/zero-points, and nothing that can be rebuilt at load time.  Restoring
must give bit-identical DEPLOY and DEPLOY_INT8 forwards.
"""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from eda_dm_tpu.models.ddpm_unet import DDPMUNet, DDPMConfig
from eda_dm_tpu.quant import QuantConfig, CALIB_W, CALIB_A, FP
from eda_dm_tpu.quant.export import (export_serving_int8, serving_bundle,
                                     restore_serving_bundle, pack_int4_codes,
                                     unpack_int4_codes, DEPLOY, DEPLOY_INT8)


def _calibrated():
    arch = DDPMConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                      attn_resolutions=(8,), resolution=16)
    qc = QuantConfig(weight_bit=4, act_bit=8)
    model = DDPMUNet(cfg=arch, qc=qc)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (4, 16, 16, 3))
    t = jnp.full((4,), 20.0)
    variables = model.init(key, x, t, FP)
    _, upd = model.apply(variables, x, t, CALIB_W, mutable=["quant"])
    variables = {**variables, "quant": upd["quant"]}
    _, upd = model.apply(variables, x, t, CALIB_A, mutable=["quant"])
    variables = {**variables, "quant": upd["quant"]}
    return model, variables, qc, x, t


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    zp = np.float32(rng.integers(0, 16, size=(1, 1, 1, 8)))
    lo = -zp.astype(np.int32)
    codes = (rng.integers(0, 16, size=(3, 3, 5, 8)) + lo).astype(np.int8)
    packed, shape = pack_int4_codes(codes, zp)
    assert packed.dtype == np.uint8
    assert packed.size == (codes.size + 1) // 2
    back = unpack_int4_codes(packed, shape, zp)
    np.testing.assert_array_equal(back, codes)


@pytest.mark.slow
def test_bundle_compresses_and_restores_bit_identically(tmp_path):
    model, variables, qc, x, t = _calibrated()
    serving = export_serving_int8(variables, qc)
    bundle, stats = serving_bundle(variables, qc)

    # real compression vs the fp32 model (4-bit codes + scales dominate)
    assert stats["compression"] > 3.0, stats
    # at least one layer actually packed: uint8 nibbles, kernel dropped
    flat = jax.tree_util.tree_leaves_with_path(bundle["quant"])
    packs = [p for p, l in flat if "w0_pack" in jax.tree_util.keystr(p)]
    assert packs, "no packed-code leaves in the bundle"
    names = {jax.tree_util.keystr(p)
             for p, _ in jax.tree_util.tree_leaves_with_path(bundle["params"])}
    assert not any("mid_block_0" in n and "kernel" in n and "conv" in n
                   for n in names)

    # orbax roundtrip, then bit-identical serving on both deploy paths
    from eda_dm_tpu.utils.checkpointing import (save_serving_bundle,
                                                load_serving_bundle)
    path = str(tmp_path / "bundle")
    save_serving_bundle(path, bundle, stats)
    restored = load_serving_bundle(path)

    xb = x.astype(jnp.bfloat16)
    for mode in (DEPLOY, DEPLOY_INT8):
        ref = np.asarray(model.apply(serving, xb, t, mode))
        out = np.asarray(model.apply(restored, xb, t, mode))
        np.testing.assert_array_equal(out, ref)


@pytest.mark.slow
def test_restore_without_disk_roundtrip():
    model, variables, qc, x, t = _calibrated()
    serving = export_serving_int8(variables, qc)
    bundle, _ = serving_bundle(variables, qc)
    restored = restore_serving_bundle(bundle)
    xb = x.astype(jnp.bfloat16)
    ref = np.asarray(model.apply(serving, xb, t, DEPLOY_INT8))
    out = np.asarray(model.apply(restored, xb, t, DEPLOY_INT8))
    np.testing.assert_array_equal(out, ref)


@pytest.mark.slow
def test_strip_alphas_lean_serving():
    """Lean export (placeholder alphas) serves bit-identically in both
    DEPLOY modes and sheds the kernel-sized f32 leaves."""
    from eda_dm_tpu.quant.export import strip_alphas, tree_nbytes

    model, variables, qc, x, t = _calibrated()
    serving = export_serving_int8(variables, qc)
    lean = strip_alphas(serving)
    assert tree_nbytes(lean["quant"]) < 0.5 * tree_nbytes(serving["quant"])
    xb = x.astype(jnp.bfloat16)
    for mode in (DEPLOY, DEPLOY_INT8):
        ref = np.asarray(model.apply(serving, xb, t, mode))
        out = np.asarray(model.apply(lean, xb, t, mode))
        np.testing.assert_array_equal(out, ref)
