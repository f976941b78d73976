"""CLIP score — in-framework image/text towers (flax).

The reference computes CLIP score for Stable Diffusion outputs by shelling
out to a sibling clone of the clip-score project
(/root/reference/scripts/test.py:50-70, README.md:77).  Here both towers
run in-framework via transformers' Flax CLIP (a flax port of the same
openai/clip-vit weights), with a local-weights loader (no network egress).

The cosine-similarity math lives in :func:`eda_dm_tpu.eval.metrics.clip_score`;
this module produces the feature rows.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from .metrics import clip_score

# openai CLIP preprocessing constants
_CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
_CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def clip_preprocess(images: jnp.ndarray, size: int = 224) -> jnp.ndarray:
    """images (N, H, W, 3) in [0, 1] → CLIP pixel_values (N, 3, size, size).

    Bicubic resize of the (square) image to ``size`` + channel
    normalization — the CLIPProcessor transform for already-square inputs.
    """
    n, h, w, c = images.shape
    if (h, w) != (size, size):
        images = jax.image.resize(images, (n, size, size, c), "cubic")
    images = (images - _CLIP_MEAN) / _CLIP_STD
    return jnp.transpose(images, (0, 3, 1, 2))


class CLIPScorer:
    """Image-tower + text-tower feature extractor with a local-weights
    loader.

    ``model_path``: local checkout of an openai CLIP checkpoint
    (clip-score's default is ViT-B/32; SD conditioning uses ViT-L/14).
    Alternatively pass a ready ``(model, tokenizer)`` pair — tests inject a
    tiny random-config FlaxCLIPModel this way.
    """

    def __init__(self, model_path: Optional[str] = None, model=None,
                 tokenizer=None, max_length: int = 77):
        if model is None:
            try:
                from transformers import CLIPTokenizer, FlaxCLIPModel
                model = FlaxCLIPModel.from_pretrained(
                    model_path, local_files_only=True)
                tokenizer = CLIPTokenizer.from_pretrained(
                    model_path, local_files_only=True)
            except Exception as e:   # pragma: no cover - environment-specific
                raise RuntimeError(
                    "CLIPScorer needs a local CLIP checkpoint at "
                    f"'{model_path}' (no network egress): {e}") from e
        self.model = model
        self.tokenizer = tokenizer
        self.max_length = max_length
        self._img_fn = jax.jit(
            lambda px: self.model.get_image_features(pixel_values=px))
        self._txt_fn = jax.jit(
            lambda ids, mask: self.model.get_text_features(
                input_ids=ids, attention_mask=mask))

    # ------------------------------------------------------------------
    def image_features(self, images) -> np.ndarray:
        """images (N, H, W, 3) in [0, 1] → (N, proj_dim)."""
        px = clip_preprocess(jnp.asarray(images, jnp.float32))
        return np.asarray(self._img_fn(px))

    def text_features(self, prompts: Optional[Sequence[str]] = None,
                      input_ids=None, attention_mask=None) -> np.ndarray:
        if input_ids is None:
            batch = self.tokenizer(list(prompts), truncation=True,
                                   max_length=self.max_length,
                                   padding="max_length", return_tensors="np")
            input_ids = batch["input_ids"]
            attention_mask = batch["attention_mask"]
        if attention_mask is None:
            attention_mask = np.ones_like(input_ids)
        return np.asarray(self._txt_fn(jnp.asarray(input_ids),
                                       jnp.asarray(attention_mask)))

    def score(self, images, prompts: Optional[Sequence[str]] = None,
              input_ids=None) -> float:
        """Mean 100·cosine(image, text) over matched pairs
        (clip-score semantics, scripts/test.py:50-70)."""
        return clip_score(self.image_features(images),
                          self.text_features(prompts, input_ids=input_ids))
