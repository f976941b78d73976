"""Golden-fixture tests for the pretrained-weights loaders (round-3 verdict
item 5): exercise `load_fid_inception_params` on a REAL-LAYOUT pt_inception
state dict (generated, since no checkpoints exist in this environment) and
the FrozenCLIPTextEncoder on a tiny-config local `transformers` checkpoint,
so the first weights-bearing environment needs zero loader debugging.

Reference surfaces: pytorch-fid's pt_inception-2015-12-05 state dict
(scripts/test.py:2-3 uses FID), ldm/modules/encoders/modules.py:137
(FrozenCLIPEmbedder).
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# FID InceptionV3 loader
# ---------------------------------------------------------------------------

def _torch_layout_state_dict(params, rng):
    """Generate a pt_inception-layout torch-style state dict covering the
    flax tree: `<prefix>.conv.weight` (OIHW) + `.bn.{weight,bias,
    running_mean,running_var,num_batches_tracked}` per conv, `fc.weight`
    (out,in) + `fc.bias`.  Every key a real pt_inception-2015-12-05 dict
    has for these modules, including the `num_batches_tracked` leaves the
    loader must ignore."""
    state = {}

    def walk(node, path):
        if "conv" in node and isinstance(node["conv"], dict):
            kern = node["conv"]["kernel"]          # HWIO
            kh, kw, ci, co = kern.shape
            pre = ".".join(path)
            # fan-in-scaled weights so 20+ random layers stay finite
            fan_in = ci * kh * kw
            state[f"{pre}.conv.weight"] = (
                rng.randn(co, ci, kh, kw) / np.sqrt(fan_in)
            ).astype(np.float32)
            state[f"{pre}.bn.weight"] = \
                rng.rand(co).astype(np.float32) + 0.5
            state[f"{pre}.bn.bias"] = \
                (0.1 * rng.randn(co)).astype(np.float32)
            state[f"{pre}.bn.running_mean"] = \
                (0.1 * rng.randn(co)).astype(np.float32)
            state[f"{pre}.bn.running_var"] = \
                rng.rand(co).astype(np.float32) + 0.5
            state[f"{pre}.bn.num_batches_tracked"] = np.int64(1000)
        for k, v in node.items():
            if k != "conv" and isinstance(v, dict):
                walk(v, path + [k])

    walk({k: v for k, v in params.items() if k != "fc"}, [])
    fc = params["fc"]
    state["fc.weight"] = \
        rng.randn(*fc["kernel"].shape[::-1]).astype(np.float32)
    state["fc.bias"] = rng.randn(fc["bias"].shape[0]).astype(np.float32)
    return state


@pytest.fixture(scope="module")
def fid_model_and_state():
    from eda_dm_tpu.eval.inception import FIDInceptionV3
    model = FIDInceptionV3()
    init = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3)))
    state = _torch_layout_state_dict(init["params"],
                                     np.random.RandomState(7))
    return model, init, state


def test_loader_tree_congruence(fid_model_and_state):
    """The converted tree must match the flax init tree leaf-for-leaf."""
    model, init, state = fid_model_and_state
    from eda_dm_tpu.eval.inception import load_fid_inception_params
    params = load_fid_inception_params(state)
    want = jax.tree_util.tree_leaves_with_path(init["params"])
    got = jax.tree_util.tree_leaves_with_path(params)
    want_shapes = {jax.tree_util.keystr(p): l.shape for p, l in want}
    got_shapes = {jax.tree_util.keystr(p): np.shape(l) for p, l in got}
    assert want_shapes == got_shapes


def test_loader_bn_folding_exact():
    """conv(x, folded_w) + folded_b == BN(conv(x, w)) in eval mode."""
    from eda_dm_tpu.eval.inception import fold_bn
    rng = np.random.RandomState(0)
    w = rng.randn(8, 4, 3, 3).astype(np.float32)       # OIHW
    g = rng.rand(8).astype(np.float32) + 0.5
    b = rng.randn(8).astype(np.float32)
    mean = rng.randn(8).astype(np.float32)
    var = rng.rand(8).astype(np.float32) + 0.1
    x = jnp.asarray(rng.randn(2, 6, 6, 4).astype(np.float32))

    def conv(xx, kern_hwio):
        return jax.lax.conv_general_dilated(
            xx, kern_hwio, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    w_hwio = jnp.transpose(jnp.asarray(w), (2, 3, 1, 0))
    y_ref = conv(x, w_hwio)
    eps = 1e-3                                          # torch BN eps
    y_ref = (y_ref - mean) / np.sqrt(var + eps) * g + b

    wf, bf = fold_bn(w, g, b, mean, var)
    y = conv(x, jnp.asarray(wf)) + jnp.asarray(bf)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_loader_end_to_end_forward(fid_model_and_state):
    """FIDInceptionV3 forward on loaded params: finite pool3 features with
    the FID feature width (2048)."""
    model, init, state = fid_model_and_state
    from eda_dm_tpu.eval.inception import load_fid_inception_params
    params = load_fid_inception_params(state)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 299, 299, 3))
    out = model.apply({"params": params}, x)
    assert out["pool3"].shape == (2, 2048)
    assert out["logits"].shape == (2, 1008)
    assert bool(jnp.isfinite(out["pool3"]).all())
    assert bool(jnp.isfinite(out["logits"]).all())


# ---------------------------------------------------------------------------
# FrozenCLIPTextEncoder on a tiny local checkpoint
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def tiny_clip_checkout(tmp_path_factory):
    transformers = pytest.importorskip("transformers")
    from transformers import CLIPTextConfig, FlaxCLIPTextModel, CLIPTokenizer

    d = tmp_path_factory.mktemp("tiny_clip")
    # minimal BPE vocab: byte-level symbols the tokenizer needs + specials
    vocab = {"<|startoftext|>": 0, "<|endoftext|>": 1}
    for i, ch in enumerate("abcdefghijklmnopqrstuvwxyz "):
        vocab[ch] = len(vocab)
        vocab[ch + "</w>"] = len(vocab)
    (d / "vocab.json").write_text(json.dumps(vocab))
    (d / "merges.txt").write_text("#version: 0.2\n")
    cfg = CLIPTextConfig(hidden_size=32, intermediate_size=64,
                         num_hidden_layers=2, num_attention_heads=2,
                         max_position_embeddings=77,
                         vocab_size=len(vocab))
    model = FlaxCLIPTextModel(cfg, seed=0)
    model.save_pretrained(str(d))
    tok = CLIPTokenizer(str(d / "vocab.json"), str(d / "merges.txt"))
    tok.save_pretrained(str(d))
    return str(d)


def test_frozen_clip_text_encoder(tiny_clip_checkout):
    from eda_dm_tpu.models.encoders import FrozenCLIPTextEncoder
    enc = FrozenCLIPTextEncoder(model_path=tiny_clip_checkout)
    out = enc.encode(["a cat on a mat", "dog"])
    assert out.shape == (2, 77, 32)
    assert bool(jnp.isfinite(out).all())
    # padding rows differ between prompts only via position embeddings of
    # the same pad token — but the sequences themselves must differ
    assert float(jnp.abs(out[0] - out[1]).max()) > 1e-6


def test_frozen_clip_missing_checkpoint_raises():
    from eda_dm_tpu.models.encoders import FrozenCLIPTextEncoder
    with pytest.raises(RuntimeError, match="local CLIP checkpoint"):
        FrozenCLIPTextEncoder(model_path="/nonexistent/clip")
