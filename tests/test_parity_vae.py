"""First-stage VAE parity vs the reference Encoder/Decoder + VQ quantizer."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow
import jax
import jax.numpy as jnp

from eda_dm_tpu.models.vae import (FirstStage, VAEConfig,
                                   vae_state_dict_to_params)


def _ref_modules(reference_path):
    import torch
    from ldm.modules.diffusionmodules.model import Encoder, Decoder
    torch.manual_seed(0)
    dd = dict(ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
              attn_resolutions=(8,), in_channels=3, resolution=16,
              z_channels=3, double_z=False, dropout=0.0)
    enc = Encoder(**dd).eval()
    dec = Decoder(**dd).eval()
    return enc, dec, dd


def test_vae_encoder_decoder_parity(reference_path):
    import torch
    enc, dec, dd = _ref_modules(reference_path)
    quant_conv = torch.nn.Conv2d(3, 3, 1)
    post_quant_conv = torch.nn.Conv2d(3, 3, 1)

    state = {}
    for prefix, mod in [("encoder", enc), ("decoder", dec),
                        ("quant_conv", quant_conv),
                        ("post_quant_conv", post_quant_conv)]:
        for k, v in mod.state_dict().items():
            state[f"{prefix}.{k}"] = v

    cfg = VAEConfig(ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
                    attn_resolutions=(8,), in_channels=3, resolution=16,
                    z_channels=3, double_z=False, embed_dim=3, n_embed=None)
    fs = FirstStage(cfg=cfg)
    params = vae_state_dict_to_params(state)

    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 16, 16).astype(np.float32)
    z = rng.randn(2, 3, 8, 8).astype(np.float32)

    with torch.no_grad():
        ref_h = quant_conv(enc(torch.from_numpy(x))).numpy()
        ref_img = dec(post_quant_conv(torch.from_numpy(z))).numpy()

    init = fs.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)), True)
    import jax.tree_util as jtu
    ref_shapes = {jtu.keystr(k): v.shape for k, v in
                  jtu.tree_flatten_with_path(
                      fs.init(jax.random.PRNGKey(0),
                              jnp.zeros((1, 8, 8, 3)), True)["params"])[0]}
    # encoder params are created by encode(), not decode(); init both
    full = jax.jit(lambda: {
        "params": fs.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)),
                          method=fs.encode)["params"]})()
    variables = {"params": jax.tree.map(jnp.asarray, params)}

    ours_h = fs.apply(variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                      method=fs.encode)
    np.testing.assert_allclose(np.transpose(np.asarray(ours_h), (0, 3, 1, 2)),
                               ref_h, rtol=2e-3, atol=3e-4)

    ours_img = fs.apply(variables,
                        jnp.asarray(np.transpose(z, (0, 2, 3, 1))), True,
                        method=fs.decode)
    np.testing.assert_allclose(
        np.transpose(np.asarray(ours_img), (0, 3, 1, 2)), ref_img,
        rtol=2e-3, atol=3e-4)


def test_vq_quantize_nearest_codebook():
    cfg = VAEConfig(ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
                    attn_resolutions=(), in_channels=3, resolution=16,
                    z_channels=3, double_z=False, embed_dim=3, n_embed=16)
    fs = FirstStage(cfg=cfg)
    variables = fs.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)), True)
    codebook = np.asarray(variables["params"]["codebook"])
    z = jnp.asarray(np.random.RandomState(1).randn(1, 4, 4, 3),
                    jnp.float32)
    zq = fs.apply(variables, z, method=fs.quantize)
    flat = np.asarray(z).reshape(-1, 3)
    d = ((flat[:, None, :] - codebook[None]) ** 2).sum(-1)
    expected = codebook[d.argmin(1)].reshape(1, 4, 4, 3)
    np.testing.assert_allclose(np.asarray(zq), expected, rtol=1e-5,
                               atol=1e-6)
