"""FP32 parity of the flax BERTEmbedder (x_transformer port) vs the
reference's vendored x_transformers stack (random weights, tiny config).
Skipped without /root/reference."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from eda_dm_tpu.models.encoders import BERTEmbedder, bert_state_dict_to_params

DIM, DEPTH, VOCAB, SEQ = 64, 2, 50, 8


@pytest.fixture(scope="module")
def torch_bert(reference_path):
    """The exact transformer BERTEmbedder builds (modules.py:89-91),
    constructed directly from the vendored x_transformer stack —
    encoders/modules.py itself imports clip/kornia, absent here."""
    import torch
    from ldm.modules.x_transformer import Encoder, TransformerWrapper

    torch.manual_seed(0)
    m = TransformerWrapper(num_tokens=VOCAB, max_seq_len=SEQ,
                           attn_layers=Encoder(dim=DIM, depth=DEPTH),
                           emb_dropout=0.0)
    m.eval()
    return m


def test_bert_embedder_parity(reference_path, torch_bert):
    import torch

    model = BERTEmbedder(n_embed=DIM, n_layer=DEPTH, vocab_size=VOCAB,
                         max_seq_len=SEQ)
    # BERTEmbedder registers the wrapper under 'transformer.' (modules.py:89)
    params = bert_state_dict_to_params(
        {"transformer." + k: v for k, v in torch_bert.state_dict().items()})

    rng = np.random.RandomState(0)
    tokens = rng.randint(0, VOCAB, size=(2, SEQ)).astype(np.int64)

    with torch.no_grad():
        ref = torch_bert(torch.from_numpy(tokens),
                         return_embeddings=True).numpy()

    init = model.init(jax.random.PRNGKey(0), jnp.asarray(tokens, jnp.int32))
    import jax.tree_util as jtu
    want = {jtu.keystr(k): v.shape for k, v in
            jtu.tree_flatten_with_path(init["params"])[0]}
    got = {jtu.keystr(k): v.shape for k, v in
           jtu.tree_flatten_with_path(params)[0]}
    assert want == got, set(want) ^ set(got)

    ours = model.apply({"params": params}, jnp.asarray(tokens, jnp.int32))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-3, atol=1e-3)
