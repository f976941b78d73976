"""CLIP scorer plumbing on a tiny random-config Flax CLIP model (no
pretrained weights in this environment)."""

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def tiny_clip():
    from transformers import CLIPConfig, CLIPTextConfig, CLIPVisionConfig
    from transformers import FlaxCLIPModel
    cfg = CLIPConfig.from_text_vision_configs(
        CLIPTextConfig(hidden_size=32, intermediate_size=64,
                       num_hidden_layers=2, num_attention_heads=2,
                       max_position_embeddings=77, vocab_size=99),
        CLIPVisionConfig(hidden_size=32, intermediate_size=64,
                         num_hidden_layers=2, num_attention_heads=2,
                         image_size=224, patch_size=32),
        projection_dim=16)
    return FlaxCLIPModel(cfg, seed=0)


def test_clip_scorer_end_to_end(tiny_clip):
    from eda_dm_tpu.eval.clip import CLIPScorer
    scorer = CLIPScorer(model=tiny_clip)
    images = np.random.RandomState(0).rand(2, 64, 64, 3).astype(np.float32)
    ids = np.array([[1, 5, 7] + [0] * 74, [2, 9, 3] + [0] * 74])
    imf = scorer.image_features(images)
    txf = scorer.text_features(input_ids=ids)
    assert imf.shape == (2, 16) and txf.shape == (2, 16)
    s = scorer.score(images, input_ids=ids)
    assert np.isfinite(s) and -100.0 <= s <= 100.0


def test_clip_preprocess_shape():
    from eda_dm_tpu.eval.clip import clip_preprocess
    import jax.numpy as jnp
    px = clip_preprocess(jnp.zeros((3, 64, 64, 3)))
    assert px.shape == (3, 3, 224, 224)
