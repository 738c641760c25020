"""ESM2 JAX implementation vs a randomly initialized HF EsmModel oracle."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dfmdock_tpu.models.esm2 import (
    ESM2Config,
    TOKEN_TO_ID,
    convert_hf_esm,
    embed_sequence,
    esm2_apply,
    tokenize,
)

transformers = pytest.importorskip("transformers")

SMALL = ESM2Config(
    vocab_size=33, hidden_size=64, num_layers=3, num_heads=4,
    intermediate_size=128, token_dropout=True,
)


@pytest.fixture(scope="module")
def hf_and_params():
    import torch
    from transformers import EsmConfig, EsmModel

    torch.manual_seed(0)
    hf_cfg = EsmConfig(
        vocab_size=33,
        hidden_size=64,
        num_hidden_layers=3,
        num_attention_heads=4,
        intermediate_size=128,
        position_embedding_type="rotary",
        layer_norm_eps=1e-5,  # published ESM2 checkpoints use 1e-5
        token_dropout=True,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        pad_token_id=1,
        mask_token_id=TOKEN_TO_ID["<mask>"],
        emb_layer_norm_before=False,
        max_position_embeddings=512,
    )
    hf = EsmModel(hf_cfg, add_pooling_layer=False).eval()
    params = jax.tree_util.tree_map(
        jnp.asarray, convert_hf_esm({k: v.numpy() for k, v in hf.state_dict().items()}, SMALL)
    )
    return hf, params


def test_tokenize():
    ids = tokenize("MKV")
    assert ids[0] == 0 and ids[-1] == 2
    assert ids[1] == TOKEN_TO_ID["M"]
    padded = tokenize("MKV", pad_to=10)
    assert len(padded) == 10 and (padded[5:] == 1).all()


def test_esm2_matches_hf(hf_and_params):
    import torch

    hf, params = hf_and_params
    seq = "MKVLAAGICRSTWQEDNFYPH"
    tokens = tokenize(seq)
    with torch.no_grad():
        hf_out = hf(
            input_ids=torch.from_numpy(tokens[None].astype(np.int64)),
            attention_mask=torch.ones(1, len(tokens), dtype=torch.long),
        ).last_hidden_state[0].numpy()

    out = np.asarray(esm2_apply(params, jnp.asarray(tokens), SMALL))
    np.testing.assert_allclose(out, hf_out, rtol=2e-3, atol=2e-4)

    # embed_sequence strips cls/eos
    reps = np.asarray(embed_sequence(params, seq, SMALL))
    np.testing.assert_allclose(reps, hf_out[1:-1], rtol=2e-3, atol=2e-4)


def test_esm2_padding_invariance(hf_and_params):
    _, params = hf_and_params
    seq = "ACDEFGHIKLMNPQRSTVWY"
    t1 = jnp.asarray(tokenize(seq))
    t2 = jnp.asarray(tokenize(seq, pad_to=48))
    o1 = np.asarray(esm2_apply(params, t1, SMALL))
    o2 = np.asarray(esm2_apply(params, t2, SMALL))[: len(t1)]
    np.testing.assert_allclose(o1, o2, rtol=1e-3, atol=1e-4)


def test_esm2_matches_hf_at_real_t12_config():
    """Architecture parity at the published esm2_t12_35M hyperparameters
    (12 layers, 480 dim, 20 heads) with random-init weights — deeper/wider
    than the 3-layer smoke config, so depth-dependent wiring (rotary phase,
    residual scaling) is exercised at a real scale.  Real-weight validation
    of t33_650M stays blocked on weight availability (PARITY.md)."""
    import torch
    from transformers import EsmConfig, EsmModel

    cfg = ESM2Config(
        vocab_size=33, hidden_size=480, num_layers=12, num_heads=20,
        intermediate_size=1920, token_dropout=True,
    )
    torch.manual_seed(3)
    hf = EsmModel(
        EsmConfig(
            vocab_size=33, hidden_size=480, num_hidden_layers=12,
            num_attention_heads=20, intermediate_size=1920,
            position_embedding_type="rotary", layer_norm_eps=1e-5,
            token_dropout=True, hidden_dropout_prob=0.0,
            attention_probs_dropout_prob=0.0, pad_token_id=1,
            mask_token_id=TOKEN_TO_ID["<mask>"], emb_layer_norm_before=False,
            max_position_embeddings=1026,
        ),
        add_pooling_layer=False,
    ).eval()
    params = jax.tree_util.tree_map(
        jnp.asarray,
        convert_hf_esm({k: v.numpy() for k, v in hf.state_dict().items()}, cfg),
    )

    seq = "MKTAYIAKQRQISFVKSHFSRQLEERLGLIEVQAPILSRVGDGTQDNLSGAEKAVQ"
    tokens = tokenize(seq)
    with torch.no_grad():
        want = hf(
            input_ids=torch.from_numpy(tokens[None].astype(np.int64)),
            attention_mask=torch.ones(1, len(tokens), dtype=torch.long),
        ).last_hidden_state[0].numpy()
    got = np.asarray(esm2_apply(params, jnp.asarray(tokens), cfg))
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-4)


def test_esm2_jits(hf_and_params):
    _, params = hf_and_params
    f = jax.jit(lambda p, t: esm2_apply(p, t, SMALL))
    out = f(params, jnp.asarray(tokenize("MKWVTFISLLFLFSSAYS")))
    assert np.isfinite(np.asarray(out)).all()
