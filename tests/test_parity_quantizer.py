"""Numerical parity vs the reference PyTorch UniformAffineQuantizer.

These tests import the upstream checkout (read-only, torch-cpu) and compare
our pure-JAX scale search + fake-quant against the reference's lazy-init
forward on identical random tensors.  Skipped when /root/reference is absent.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax.numpy as jnp

from eda_dm_tpu.quant import (
    calculate_qparams, detect_one_side, search_range, fake_quant_nograd,
    weight_qparams, channelwise_view, init_alpha, adaround_fake_quant,
)


def make_ref_quantizer(reference_path, **kw):
    torch = pytest.importorskip("torch")
    from qdiff.quant_layer import UniformAffineQuantizer
    return UniformAffineQuantizer(**kw)


def _achieved_score(x, out):
    return float(np.mean(np.abs(np.asarray(out) - np.asarray(x)) ** 2.4))


@pytest.mark.parametrize("n_bits,symmetric", [(8, True), (4, True), (8, False)])
def test_per_tensor_mse_init_parity(reference_path, n_bits, symmetric):
    """Our search achieves the reference's L^2.4 objective (or better).

    Bit-exact equality of the chosen threshold is not well-defined across
    frameworks: zero_point = round(thres/scale) sits exactly on a .5 boundary
    for symmetric ranges, so the last float bit decides 7 vs 8 and adjacent
    candidates swap.  We therefore compare achieved objective values.
    """
    import torch
    rng = np.random.RandomState(0)
    x = rng.randn(2048).astype(np.float32) * 1.7 + 0.2

    ref = make_ref_quantizer(reference_path, n_bits=n_bits, symmetric=symmetric,
                             channel_wise=False, scale_method="mse")
    ref_out = ref.forward(torch.from_numpy(x)).numpy()

    xj = jnp.asarray(x)
    one_side = detect_one_side(xj)
    lo, hi = search_range(xj.reshape(-1), 2 ** n_bits, one_side, symmetric)
    delta, zp = calculate_qparams(lo, hi, 2 ** n_bits)
    ours = fake_quant_nograd(xj, delta, zp, 2 ** n_bits)

    assert _achieved_score(x, ours) <= _achieved_score(x, ref_out) * 1.02


def test_per_tensor_positive_parity(reference_path):
    """One-sided (softmax-like) inputs: 'pos' branch of the 1-D search."""
    import torch
    rng = np.random.RandomState(1)
    x = np.abs(rng.randn(4096)).astype(np.float32)

    ref = make_ref_quantizer(reference_path, n_bits=8, symmetric=True,
                             channel_wise=False, scale_method="mse")
    ref_out = ref.forward(torch.from_numpy(x)).numpy()

    xj = jnp.asarray(x)
    lo, hi = search_range(xj, 256, detect_one_side(xj), True)
    delta, zp = calculate_qparams(lo, hi, 256)
    ours = fake_quant_nograd(xj, delta, zp, 256)
    assert zp == 0.0
    np.testing.assert_allclose(ours, ref_out, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("n_bits", [4, 8])
def test_channelwise_weight_parity(reference_path, n_bits):
    """Per-channel weight search vs reference channel_wise lazy init.

    Torch layout (O, I, H, W) with channel dim 0 ↔ our HWIO kernels with
    channel dim -1.
    """
    import torch
    rng = np.random.RandomState(2)
    w_torch = (rng.randn(8, 4, 3, 3) * rng.rand(8, 1, 1, 1) * 2).astype(np.float32)

    ref = make_ref_quantizer(reference_path, n_bits=n_bits, symmetric=True,
                             channel_wise=True, scale_method="mse")
    ref_out = ref.forward(torch.from_numpy(w_torch)).numpy()

    w_jax = jnp.asarray(np.transpose(w_torch, (2, 3, 1, 0)))  # OIHW → HWIO
    delta, zp = weight_qparams(w_jax, 2 ** n_bits, symmetric=True,
                               channel_axis=-1)
    ours = fake_quant_nograd(w_jax, delta, zp, 2 ** n_bits)
    ours_torch_layout = np.transpose(np.asarray(ours), (3, 2, 0, 1))
    # per-channel achieved objective must match or beat the reference's
    for c in range(w_torch.shape[0]):
        s_ours = _achieved_score(w_torch[c], ours_torch_layout[c])
        s_ref = _achieved_score(w_torch[c], ref_out[c])
        assert s_ours <= s_ref * 1.02, (c, s_ours, s_ref)


def test_2d_search_parity(reference_path):
    """Asymmetric two-sided per-tensor search (the reference's 2-D path)."""
    import torch
    rng = np.random.RandomState(3)
    x = (rng.randn(512) ** 3).astype(np.float32)  # heavy-tailed, two-sided

    ref = make_ref_quantizer(reference_path, n_bits=4, symmetric=False,
                             channel_wise=False, scale_method="mse")
    ref_out = ref.forward(torch.from_numpy(x)).numpy()

    xj = jnp.asarray(x)
    lo, hi = search_range(xj, 16, detect_one_side(xj), symmetric=False)
    delta, zp = calculate_qparams(lo, hi, 16)
    ours = fake_quant_nograd(xj, delta, zp, 16)
    assert _achieved_score(x, ours) <= _achieved_score(x, ref_out) * 1.02


def test_adaround_parity(reference_path):
    """AdaRound soft/hard forward vs reference AdaRoundQuantizer."""
    import torch
    from qdiff.quant_layer import UniformAffineQuantizer
    from qdiff.adaptive_rounding import AdaRoundQuantizer

    rng = np.random.RandomState(4)
    w = rng.randn(16, 8).astype(np.float32)

    uaq = UniformAffineQuantizer(n_bits=4, symmetric=True, channel_wise=True,
                                 scale_method="mse")
    wt = torch.from_numpy(w)
    uaq.forward(wt)  # lazy init of delta/zp
    ada = AdaRoundQuantizer(uaq, weight_tensor=wt,
                            round_mode="learned_hard_sigmoid")

    # our search achieves the reference's per-channel objective or better
    wj = jnp.asarray(w)
    delta_ours, zp_ours = weight_qparams(wj, 16, symmetric=True, channel_axis=0)
    ours_q = np.asarray(fake_quant_nograd(wj, delta_ours, zp_ours, 16))
    ref_zp = torch.as_tensor(np.asarray(ada.zero_point, dtype=np.float32))
    ref_uaq_q = ((torch.clamp(torch.round(torch.from_numpy(w) / ada.delta)
                              + ref_zp, 0, 15) - ref_zp) * ada.delta).numpy()
    for c in range(w.shape[0]):
        assert _achieved_score(w[c], ours_q[c]) <= \
            _achieved_score(w[c], ref_uaq_q[c]) * 1.02

    # adaround math itself is compared on identical (delta, zp)
    delta = jnp.asarray(ada.delta.numpy())
    zp = jnp.asarray(np.broadcast_to(np.float32(ada.zero_point), delta.shape)
                     if np.isscalar(ada.zero_point) or ada.zero_point.ndim == 0
                     else ada.zero_point.numpy())
    alpha = init_alpha(wj, delta)
    np.testing.assert_allclose(np.asarray(alpha), ada.alpha.detach().numpy(),
                               rtol=1e-3, atol=1e-4)

    ada.soft_targets = True
    np.testing.assert_allclose(
        adaround_fake_quant(wj, delta, zp, alpha, 16, soft=True),
        ada.forward(wt).detach().numpy(), rtol=1e-4, atol=1e-5)
    ada.soft_targets = False
    np.testing.assert_allclose(
        adaround_fake_quant(wj, delta, zp, alpha, 16, soft=False),
        ada.forward(wt).detach().numpy(), rtol=1e-4, atol=1e-5)
