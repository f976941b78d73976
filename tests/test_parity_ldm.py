"""FP32 parity of the flax LDM UNet vs the reference UNetModel, for the
attention-block flavour (LDM bedroom/church style) and the spatial-transformer
flavour (cin256/SD style)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow
import jax
import jax.numpy as jnp

from eda_dm_tpu.models.ldm_unet import LDMUNet, LDMUNetConfig
from eda_dm_tpu.models.convert import ldm_unet_state_dict_to_params
from eda_dm_tpu.quant import QuantConfig, FP


def _stub_omegaconf():
    """The reference imports omegaconf only for an isinstance check
    (openaimodel.py:510-513); provide a stub when it isn't installed."""
    import sys, types
    try:
        import omegaconf  # noqa: F401
    except ImportError:
        om = types.ModuleType("omegaconf")
        lc = types.ModuleType("omegaconf.listconfig")

        class ListConfig(list):
            pass

        lc.ListConfig = ListConfig
        om.listconfig = lc
        sys.modules["omegaconf"] = om
        sys.modules["omegaconf.listconfig"] = lc


def make_ref_unet(reference_path, **kw):
    import torch
    _stub_omegaconf()
    from ldm.modules.diffusionmodules.openaimodel import UNetModel
    torch.manual_seed(0)
    m = UNetModel(**kw)
    m.eval()
    return m


def _compare(torch_model, cfg: LDMUNetConfig, ctx_dim=None, n_classes=None):
    import torch
    model = LDMUNet(cfg=cfg, qc=QuantConfig())
    params = ldm_unet_state_dict_to_params(torch_model.state_dict())

    rng = np.random.RandomState(0)
    x = rng.randn(2, cfg.in_channels, 16, 16).astype(np.float32)
    t = np.array([3.0, 50.0], dtype=np.float32)
    ctx = (rng.randn(2, 5, ctx_dim).astype(np.float32)
           if ctx_dim is not None else None)
    y = np.array([1, 2]) if n_classes else None

    kwargs = {}
    if ctx is not None:
        kwargs["context"] = torch.from_numpy(ctx)
    if y is not None:
        kwargs["y"] = torch.from_numpy(y)
    with torch.no_grad():
        ref = torch_model(torch.from_numpy(x), torch.from_numpy(t),
                          **kwargs).numpy()

    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    init_vars = model.init(jax.random.PRNGKey(0), x_nhwc, jnp.asarray(t),
                           context=(jnp.asarray(ctx) if ctx is not None
                                    else None),
                           y=(jnp.asarray(y) if y is not None else None),
                           mode=FP)
    import jax.tree_util as jtu
    ref_shapes = {jtu.keystr(k): v.shape for k, v in
                  jtu.tree_flatten_with_path(init_vars["params"])[0]}
    new_shapes = {jtu.keystr(k): np.shape(v) for k, v in
                  jtu.tree_flatten_with_path(params)[0]}
    assert ref_shapes == new_shapes, (
        sorted(set(ref_shapes) ^ set(new_shapes))[:8],
        {k: (ref_shapes.get(k), new_shapes.get(k)) for k in ref_shapes
         if ref_shapes.get(k) != new_shapes.get(k)})

    variables = {**init_vars, "params": jax.tree.map(jnp.asarray, params)}
    ours = jax.jit(lambda v: model.apply(
        v, x_nhwc, jnp.asarray(t),
        context=(jnp.asarray(ctx) if ctx is not None else None),
        y=(jnp.asarray(y) if y is not None else None), mode=FP))(variables)
    ours_nchw = np.transpose(np.asarray(ours), (0, 3, 1, 2))
    np.testing.assert_allclose(ours_nchw, ref, rtol=2e-3, atol=3e-4)


def test_ldm_attnblock_flavour(reference_path):
    """bedroom/church style: AttentionBlock with legacy QKV heads."""
    kw = dict(image_size=16, in_channels=3, model_channels=32,
              out_channels=3, num_res_blocks=1, attention_resolutions=(2,),
              channel_mult=(1, 2), num_head_channels=16, dims=2)
    ref = make_ref_unet(reference_path, **kw)
    cfg = LDMUNetConfig(image_size=16, in_channels=3, model_channels=32,
                        out_channels=3, num_res_blocks=1,
                        attention_resolutions=(2,), channel_mult=(1, 2),
                        num_head_channels=16)
    _compare(ref, cfg)


def test_ldm_scale_shift_resupdown_flavour(reference_path):
    """church style: use_scale_shift_norm + resblock_updown."""
    kw = dict(image_size=16, in_channels=4, model_channels=32,
              out_channels=4, num_res_blocks=1, attention_resolutions=(2,),
              channel_mult=(1, 2), num_heads=4, use_scale_shift_norm=True,
              resblock_updown=True, dims=2)
    ref = make_ref_unet(reference_path, **kw)
    cfg = LDMUNetConfig(image_size=16, in_channels=4, model_channels=32,
                        out_channels=4, num_res_blocks=1,
                        attention_resolutions=(2,), channel_mult=(1, 2),
                        num_heads=4, use_scale_shift_norm=True,
                        resblock_updown=True)
    _compare(ref, cfg)


def test_ldm_transformer_flavour(reference_path):
    """cin256/SD style: SpatialTransformer with cross-attention context."""
    kw = dict(image_size=16, in_channels=4, model_channels=32,
              out_channels=4, num_res_blocks=1, attention_resolutions=(1, 2),
              channel_mult=(1, 2), num_head_channels=16,
              use_spatial_transformer=True, transformer_depth=1,
              context_dim=24, dims=2)
    ref = make_ref_unet(reference_path, **kw)
    cfg = LDMUNetConfig(image_size=16, in_channels=4, model_channels=32,
                        out_channels=4, num_res_blocks=1,
                        attention_resolutions=(1, 2), channel_mult=(1, 2),
                        num_head_channels=16, use_spatial_transformer=True,
                        transformer_depth=1, context_dim=24)
    _compare(ref, cfg, ctx_dim=24)


def test_ldm_class_conditional(reference_path):
    """cin256 style: label embedding added to the time embedding."""
    kw = dict(image_size=16, in_channels=4, model_channels=32,
              out_channels=4, num_res_blocks=1, attention_resolutions=(2,),
              channel_mult=(1, 2), num_head_channels=16, num_classes=10,
              use_spatial_transformer=True, transformer_depth=1,
              context_dim=24, dims=2)
    ref = make_ref_unet(reference_path, **kw)
    cfg = LDMUNetConfig(image_size=16, in_channels=4, model_channels=32,
                        out_channels=4, num_res_blocks=1,
                        attention_resolutions=(2,), channel_mult=(1, 2),
                        num_head_channels=16, num_classes=10,
                        use_spatial_transformer=True, transformer_depth=1,
                        context_dim=24)
    _compare(ref, cfg, ctx_dim=24, n_classes=10)
