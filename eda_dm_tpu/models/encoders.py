"""Conditioning encoders (class / text) — FP32, never quantized.

Reference: /root/reference/ldm/modules/encoders/modules.py (ClassEmbedder:21,
FrozenCLIPEmbedder:137).  The class embedder is a flax Embed producing a
length-1 cross-attention context; the CLIP text encoder wraps the
transformers Flax CLIP model (weights must be available locally — this
environment has no network egress, so loading is gated).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn


class ClassEmbedder(nn.Module):
    """encoders/modules.py:21-33: label → (B, 1, embed_dim) context.

    The ImageNet pipeline uses ``n_classes + 1`` embeddings with index
    ``n_classes`` acting as the unconditional token
    (scripts/sample_diffusion_ldm_imagenet.py conditioning setup).
    """

    embed_dim: int = 512
    n_classes: int = 1000

    @nn.compact
    def __call__(self, labels: jnp.ndarray) -> jnp.ndarray:
        emb = nn.Embed(self.n_classes, self.embed_dim,
                       name="embedding")(labels)
        return emb[:, None, :]


def class_embedder_state_dict_to_params(state_dict) -> dict:
    w = state_dict["embedding.weight"]
    arr = np.asarray(getattr(w, "numpy", lambda: w)()
                     if hasattr(w, "numpy") else w, dtype=np.float32)
    return {"embedding": {"embedding": arr}}


class FrozenCLIPTextEncoder:
    """SD v1 text conditioning (FrozenCLIPEmbedder, modules.py:137-165):
    tokenizer(max_length=77) → CLIPTextModel last_hidden_state.

    Wraps the transformers Flax CLIP text model.  ``model_path`` must point
    at a local checkout of openai/clip-vit-large-patch14 (no network here);
    construction raises a clear error otherwise.
    """

    def __init__(self, model_path: str = "openai/clip-vit-large-patch14",
                 max_length: int = 77):
        try:
            from transformers import CLIPTokenizer, FlaxCLIPTextModel
            self.tokenizer = CLIPTokenizer.from_pretrained(
                model_path, local_files_only=True)
            self.model = FlaxCLIPTextModel.from_pretrained(
                model_path, local_files_only=True)
        except Exception as e:       # pragma: no cover - environment-specific
            raise RuntimeError(
                "FrozenCLIPTextEncoder needs a local CLIP checkpoint at "
                f"'{model_path}' (no network egress): {e}") from e
        self.max_length = max_length

    def encode(self, prompts: Sequence[str]) -> jnp.ndarray:
        batch = self.tokenizer(list(prompts), truncation=True,
                               max_length=self.max_length,
                               padding="max_length", return_tensors="np")
        out = self.model(input_ids=batch["input_ids"],
                         attention_mask=None)
        return jnp.asarray(out.last_hidden_state)


class _TinyTextModule(nn.Module):
    """Small causal-free transformer producing (B, T, context_dim)."""

    context_dim: int
    vocab: int
    depth: int = 2
    heads: int = 4

    @nn.compact
    def __call__(self, ids: jnp.ndarray) -> jnp.ndarray:
        d = self.context_dim
        h = nn.Embed(self.vocab, d, name="tok")(ids)
        h = h + self.param("pos", nn.initializers.normal(0.02),
                           (1, ids.shape[1], d))
        for i in range(self.depth):
            a = nn.LayerNorm(name=f"ln1_{i}")(h)
            a = nn.SelfAttention(num_heads=self.heads, name=f"attn_{i}")(a)
            h = h + a
            f = nn.LayerNorm(name=f"ln2_{i}")(h)
            f = nn.Dense(4 * d, name=f"fc1_{i}")(f)
            f = nn.Dense(d, name=f"fc2_{i}")(jax.nn.gelu(f))
            h = h + f
        return nn.LayerNorm(name="ln_f")(h)


class TinyTextEncoder:
    """CLIP-shaped stand-in text encoder (random weights, no tokenizer
    files): crc32 hash-tokenization → tiny flax transformer →
    (B, 77, context_dim) context rows.

    Exercises the full SD/COCO conditioning path — CFG calib assembly, PLMS
    sampling, transformer-block reconstruction — without the (undownloadable
    here) openai/clip-vit-large-patch14 weights.  Same ``encode`` interface
    as :class:`FrozenCLIPTextEncoder`.
    """

    def __init__(self, context_dim: int = 768, max_length: int = 77,
                 vocab: int = 4096, seed: int = 0):
        self.max_length = max_length
        self.vocab = vocab
        self.module = _TinyTextModule(context_dim=context_dim, vocab=vocab)
        ids = jnp.zeros((1, max_length), jnp.int32)
        self.params = self.module.init(jax.random.PRNGKey(seed), ids)
        self._fn = jax.jit(lambda p, i: self.module.apply(p, i))

    def tokenize(self, prompts: Sequence[str]) -> np.ndarray:
        import zlib
        out = np.zeros((len(prompts), self.max_length), np.int32)
        for r, p in enumerate(prompts):
            toks = [zlib.crc32(w.encode()) % (self.vocab - 2) + 2
                    for w in p.lower().split()][: self.max_length - 2]
            row = [1] + toks + [0] * (self.max_length - 1 - len(toks))
            out[r] = row
        return out

    def encode(self, prompts: Sequence[str]) -> jnp.ndarray:
        return self._fn(self.params, jnp.asarray(self.tokenize(prompts)))
