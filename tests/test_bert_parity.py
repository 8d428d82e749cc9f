"""Parity of the Flax TextEncoder vs HuggingFace's PyTorch BertModel.

The reference embeds HF ``BertModel``/``RobertaModel`` outputs directly into
its grid (``model/ViBERTgrid_net.py:218-279``), so F1 parity requires our
encoder + weight converter to reproduce HF numerics. transformers (torch
backend) is available offline for tiny random configs: initialize a torch
model, convert its state dict with ``load_hf_weights``, and compare hidden
states.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vibertgrid_tpu.models.bert import (
    TextEncoder,
    TextEncoderConfig,
    load_hf_weights,
)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _tiny_hf_config(flavor):
    common = dict(
        vocab_size=128,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        max_position_embeddings=64,
        type_vocab_size=2,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    if flavor == "roberta":
        return transformers.RobertaConfig(pad_token_id=1, **common)
    return transformers.BertConfig(pad_token_id=0, **common)


@pytest.mark.parametrize("flavor", ["bert", "roberta"])
def test_encoder_matches_hf(flavor):
    hf_cfg = _tiny_hf_config(flavor)
    if flavor == "roberta":
        hf_model = transformers.RobertaModel(hf_cfg, add_pooling_layer=False)
    else:
        hf_model = transformers.BertModel(hf_cfg, add_pooling_layer=False)
    hf_model.eval()

    cfg = TextEncoderConfig(
        vocab_size=128,
        hidden_size=32,
        num_layers=2,
        num_heads=4,
        intermediate_size=64,
        max_position_embeddings=64,
        pad_token_id=1 if flavor == "roberta" else 0,
        flavor=flavor,
        hidden_dropout=0.0,
        attention_dropout=0.0,
    )
    enc = TextEncoder(cfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(3, 120, (2, 16)).astype(np.int32)
    mask = np.ones((2, 16), np.int32)
    mask[1, 10:] = 0
    ids[1, 10:] = cfg.pad_token_id

    variables = enc.init(jax.random.PRNGKey(0), jnp.asarray(ids), jnp.asarray(mask))
    params = load_hf_weights(variables["params"], hf_model.state_dict(), 2)

    ours = np.asarray(
        enc.apply({"params": params}, jnp.asarray(ids), jnp.asarray(mask))
    )
    with torch.no_grad():
        theirs = hf_model(
            input_ids=torch.from_numpy(ids).long(),
            attention_mask=torch.from_numpy(mask).long(),
        ).last_hidden_state.numpy()

    # valid positions must match tightly
    np.testing.assert_allclose(ours[0], theirs[0], rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(ours[1, :10], theirs[1, :10], rtol=2e-4, atol=2e-5)
