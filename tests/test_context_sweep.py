"""FID conditioning sweep: distinct sampling batches must receive distinct
conditioning rows (sample_diffusion_ldm_imagenet.py:131-139 semantics —
VERDICT round-1 item #4)."""

import numpy as np
import jax.numpy as jnp

from eda_dm_tpu.pipelines.latent import LDMPipeline


def test_context_fn_cycles_rows():
    ctx = jnp.arange(10, dtype=jnp.float32)[:, None]        # 10 distinct rows
    unc = jnp.zeros((1, 1))
    fn = LDMPipeline.make_context_fn(ctx, unc)
    c0, u0 = fn(0, 4)
    c1, _ = fn(4, 4)
    c2, _ = fn(8, 4)                                         # wraps 8,9,0,1
    np.testing.assert_array_equal(np.asarray(c0).ravel(), [0, 1, 2, 3])
    np.testing.assert_array_equal(np.asarray(c1).ravel(), [4, 5, 6, 7])
    np.testing.assert_array_equal(np.asarray(c2).ravel(), [8, 9, 0, 1])
    assert u0.shape[0] == 4                                  # uncond broadcast


def test_context_fn_none_passthrough():
    assert LDMPipeline.make_context_fn(None, None) is None
