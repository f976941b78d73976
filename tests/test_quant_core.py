"""Golden and property tests for the uniform-affine quantizer math."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eda_dm_tpu.quant import (
    affine, search, adaround,
    calculate_qparams, fake_quant, round_ste, lp_loss,
    detect_one_side, search_range_1d, search_range_2d, weight_qparams,
    init_alpha, adaround_fake_quant, soft_targets,
    ONE_SIDE_POS, ONE_SIDE_NEG, ONE_SIDE_NO,
)


def test_round_ste_value_and_grad():
    x = jnp.array([0.2, 0.5, 1.5, -0.7, 2.5])
    # jnp.round is half-to-even like torch.round
    np.testing.assert_allclose(round_ste(x), [0.0, 0.0, 2.0, -1.0, 2.0])
    g = jax.grad(lambda v: jnp.sum(round_ste(v) ** 2))(x)
    # d/dx (round(x))^2 with STE = 2*round(x)
    np.testing.assert_allclose(g, 2 * jnp.round(x))


def test_calculate_qparams_golden():
    # range [-1, 3] at 8 bits: scale = 4/255, zp = round(1/scale) = 64
    scale, zp = calculate_qparams(jnp.float32(-1.0), jnp.float32(3.0), 256)
    np.testing.assert_allclose(scale, 4.0 / 255.0, rtol=1e-6)
    assert zp == 64.0
    # positive-only range widens to include zero → zp = 0
    scale, zp = calculate_qparams(jnp.float32(0.5), jnp.float32(2.0), 256)
    np.testing.assert_allclose(scale, 2.0 / 255.0, rtol=1e-6)
    assert zp == 0.0


def test_fake_quant_roundtrip_exact_grid():
    # values already on the grid are fixed points
    delta, zp = jnp.float32(0.1), jnp.float32(128.0)
    grid = (jnp.arange(0, 256.0) - zp) * delta
    np.testing.assert_allclose(fake_quant(grid, delta, zp, 256), grid,
                               rtol=1e-6, atol=1e-7)


def test_fake_quant_idempotent_and_clipped():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (4096,)) * 3
    delta, zp = calculate_qparams(x.min(), x.max(), 256)
    q1 = fake_quant(x, delta, zp, 256)
    q2 = fake_quant(q1, delta, zp, 256)
    np.testing.assert_allclose(q1, q2, rtol=1e-5, atol=1e-6)
    assert jnp.max(jnp.abs(q1 - x)) <= delta  # within one step inside range


def test_fake_quant_ste_gradient():
    x = jnp.linspace(-1.0, 1.0, 11)
    delta, zp = jnp.float32(0.25), jnp.float32(4.0)
    g = jax.grad(lambda v: jnp.sum(fake_quant(v, delta, zp, 8)))(x)
    # inside the clip range gradient ≈ 1 (STE); jnp.clip passes grads at interior
    assert jnp.all(jnp.abs(g[2:-2] - 1.0) < 1e-6)


def test_detect_one_side():
    assert detect_one_side(jnp.array([0.0, 1.0])) == ONE_SIDE_POS
    assert detect_one_side(jnp.array([-2.0, 0.0])) == ONE_SIDE_NEG
    assert detect_one_side(jnp.array([-1.0, 1.0])) == ONE_SIDE_NO


def test_search_1d_recovers_clean_range():
    # symmetric uniform data: best threshold should be near the true max
    x = jnp.linspace(-2.0, 2.0, 4097)
    lo, hi = search_range_1d(x, 256, jnp.int32(ONE_SIDE_NO), num=100)
    # dual zero-point windows may extend one half-step past the data range
    assert 1.8 <= hi <= 2.05 and -2.05 <= lo <= -1.8
    # positive-only data keeps min at zero
    xp = jnp.linspace(0.0, 1.0, 1025)
    lo, hi = search_range_1d(xp, 256, jnp.int32(ONE_SIDE_POS), num=100)
    assert lo == 0.0 and 0.9 <= hi <= 1.0


def test_search_1d_channelwise_shapes():
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (8, 512)) * jnp.arange(1, 9)[:, None]
    lo, hi = search_range_1d(x, 16, jnp.int32(ONE_SIDE_NO), num=50)
    assert lo.shape == (8,) and hi.shape == (8,)
    # ranges should scale with the per-channel spread
    assert hi[7] > hi[0] * 4


def test_search_2d_beats_minmax_on_skewed_data():
    key = jax.random.PRNGKey(2)
    # heavy-tailed asymmetric data: clipping should win over min/max
    x = jnp.abs(jax.random.normal(key, (8192,))) ** 3 - 0.3
    lo, hi = search_range_2d(x, 16, num=40)

    def err(lo, hi):
        d, z = calculate_qparams(lo, hi, 16)
        q = affine.fake_quant_nograd(x, d, z, 16)
        return jnp.mean(jnp.abs(q - x) ** 2.4)

    assert err(lo, hi) <= err(x.min(), x.max())


def test_weight_qparams_channelwise_broadcast():
    key = jax.random.PRNGKey(3)
    w = jax.random.normal(key, (3, 3, 16, 32))  # HWIO, out channels last
    delta, zp = weight_qparams(w, 16, symmetric=True, channel_axis=-1)
    assert delta.shape == (1, 1, 1, 32) and zp.shape == (1, 1, 1, 32)
    assert jnp.all(delta > 0)


def test_adaround_init_matches_nearest():
    key = jax.random.PRNGKey(4)
    w = jax.random.normal(key, (64, 64))
    delta, zp = weight_qparams(w, 16, symmetric=True, channel_axis=None)
    alpha = init_alpha(w, delta)
    hard = adaround_fake_quant(w, delta, zp, alpha, 16, soft=False)
    nearest = affine.fake_quant_nograd(w, delta, zp, 16)
    # hard rounding with freshly-initialized alpha == round-to-nearest
    # (up to half-to-even ties, measure-zero for random floats)
    np.testing.assert_allclose(hard, nearest, rtol=1e-5, atol=1e-6)


def test_adaround_soft_matches_residue_at_init():
    w = jnp.array([0.0, 0.3, 0.49, 0.51, 0.9, -0.3])
    delta = jnp.float32(1.0)
    alpha = init_alpha(w, delta)
    h = soft_targets(alpha)
    rest = w / delta - jnp.floor(w / delta)
    np.testing.assert_allclose(h, rest, rtol=1e-5, atol=1e-6)
    soft = adaround_fake_quant(w, delta, jnp.float32(8.0), alpha, 16, soft=True)
    np.testing.assert_allclose(soft, w, rtol=1e-5, atol=1e-6)


def test_lp_loss_channel_reduction():
    pred = jnp.zeros((2, 4, 4, 3))
    tgt = jnp.ones((2, 4, 4, 3)) * 2.0
    # sum over channel axis (=4 per position at |2|^2), mean over the rest
    np.testing.assert_allclose(lp_loss(pred, tgt, 2.0, channel_axis=-1), 12.0)
    np.testing.assert_allclose(lp_loss(pred, tgt, 2.0), 4.0)


def test_ema_update():
    lo, hi = affine.ema_update(-1.0, 1.0, -3.0, 0.5)
    np.testing.assert_allclose(lo, 0.1 * -3.0 + 0.9 * -1.0)
    np.testing.assert_allclose(hi, 0.1 * 0.5 + 0.9 * 1.0)


def _search_err(xf, lo, hi, n_levels):
    from eda_dm_tpu.quant.affine import fake_quant, calculate_qparams
    d, zp = calculate_qparams(lo, hi, n_levels)
    q = fake_quant(xf, d, zp, n_levels)
    return float(jnp.mean(jnp.abs(q - xf) ** 2.4))


def test_hist_search_matches_exact_symmetric():
    """The exact-histogram fast path picks a range whose quantization error
    matches the exact full-tensor search (scale_init's large-activation
    path); tail clipping mass is exact, only bin-center rounding remains."""
    from eda_dm_tpu.quant.search import (search_range, search_range_hist,
                                         detect_one_side)
    rng = np.random.RandomState(0)
    # mixed-scale channels like an NHWC activation (channels last, 64 ch)
    x = (rng.randn(4096, 64) * (0.1 + 2.0 * rng.rand(64))).astype(np.float32)
    xf = jnp.asarray(x.reshape(-1))
    side = detect_one_side(xf)
    n_levels = 256

    lo_e, hi_e = search_range(xf, n_levels, side, symmetric=True)
    lo_h, hi_h = search_range_hist(xf, n_levels, side, symmetric=True)
    e_exact = _search_err(xf, lo_e, hi_e, n_levels)
    e_hist = _search_err(xf, lo_h, hi_h, n_levels)
    assert e_hist <= e_exact * 1.02


@pytest.mark.slow
def test_hist_search_matches_exact_one_sided_and_2d():
    """One-sided (softmax-style) data and the asymmetric 2-D dispatch."""
    from eda_dm_tpu.quant.search import (search_range, search_range_hist,
                                         detect_one_side)
    rng = np.random.RandomState(1)
    n_levels = 256

    # positive one-sided (e.g. softmax outputs with a spike at small values)
    pos = jnp.asarray(rng.gamma(0.5, 1.0, 1 << 16).astype(np.float32))
    side = detect_one_side(pos)
    lo_e, hi_e = search_range(pos, n_levels, side, symmetric=True)
    lo_h, hi_h = search_range_hist(pos, n_levels, side, symmetric=True)
    assert float(lo_h) == 0.0
    assert _search_err(pos, lo_h, hi_h, n_levels) <= \
        _search_err(pos, lo_e, hi_e, n_levels) * 1.02

    # skewed two-sided, asymmetric quantizer -> 2-D search branch
    skew = jnp.asarray((rng.randn(1 << 16) * 0.5 + 1.5).astype(np.float32))
    side = detect_one_side(skew)
    lo_e, hi_e = search_range(skew, n_levels, side, symmetric=False)
    lo_h, hi_h = search_range_hist(skew, n_levels, side, symmetric=False)
    assert _search_err(skew, lo_h, hi_h, n_levels) <= \
        _search_err(skew, lo_e, hi_e, n_levels) * 1.05
