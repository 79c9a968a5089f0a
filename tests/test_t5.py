"""T5 encoder parity vs transformers' T5EncoderModel — a TRUE external
reference (the installed transformers library executes the same weights),
unlike the self-written mirrors the other towers use."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdxl_tpu.configs import T5Config
from sdxl_tpu.models.t5 import init_t5, t5_encode, t5_position_bias

TINY = T5Config(vocab_size=128, d_model=32, d_kv=8, d_ff=64, n_heads=4,
                n_layers=3, relative_buckets=8, relative_max_distance=16)


def _to_hf(params, cfg):
    """Our pytree -> a transformers T5EncoderModel with identical weights."""
    import torch
    from transformers import T5Config as HFT5Config
    from transformers import T5EncoderModel

    hf_cfg = HFT5Config(
        vocab_size=cfg.vocab_size,
        d_model=cfg.d_model,
        d_kv=cfg.d_kv,
        d_ff=cfg.d_ff,
        num_layers=cfg.n_layers,
        num_heads=cfg.n_heads,
        relative_attention_num_buckets=cfg.relative_buckets,
        relative_attention_max_distance=cfg.relative_max_distance,
        feed_forward_proj="gated-gelu",
        dropout_rate=0.0,
        is_encoder_decoder=False,
        use_cache=False,
        tie_word_embeddings=False,
    )
    model = T5EncoderModel(hf_cfg).eval()

    def tt(a):
        return torch.from_numpy(np.asarray(a, np.float32))

    sd = {"shared.weight": tt(params["embed"])}
    for i, blk in enumerate(params["blocks"]):
        pre = f"encoder.block.{i}.layer"
        for nm in ("q", "k", "v", "o"):
            sd[f"{pre}.0.SelfAttention.{nm}.weight"] = tt(
                blk["attn"][nm]["w"]).T.contiguous()
        sd[f"{pre}.0.layer_norm.weight"] = tt(blk["ln1"])
        sd[f"{pre}.1.DenseReluDense.wi_0.weight"] = tt(
            blk["ffn"]["wi_0"]["w"]).T.contiguous()
        sd[f"{pre}.1.DenseReluDense.wi_1.weight"] = tt(
            blk["ffn"]["wi_1"]["w"]).T.contiguous()
        sd[f"{pre}.1.DenseReluDense.wo.weight"] = tt(
            blk["ffn"]["wo"]["w"]).T.contiguous()
        sd[f"{pre}.1.layer_norm.weight"] = tt(blk["ln2"])
    sd["encoder.block.0.layer.0.SelfAttention.relative_attention_bias"
       ".weight"] = tt(params["relative_attention_bias"])
    sd["encoder.final_layer_norm.weight"] = tt(params["final_ln"])
    sd["encoder.embed_tokens.weight"] = sd["shared.weight"]
    missing, unexpected = model.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected
    # every remaining missing key must be a buffer/alias, not a weight
    assert all("embed_tokens" in k or "shared" in k for k in missing), missing
    return model


def test_t5_matches_transformers():
    import torch

    params = init_t5(jax.random.PRNGKey(0), TINY, jnp.float32)
    model = _to_hf(params, TINY)
    ids = np.asarray(
        jax.random.randint(jax.random.PRNGKey(1), (2, 13), 0, 128)
    )
    ours = np.asarray(t5_encode(params, TINY, jnp.asarray(ids)))
    with torch.no_grad():
        ref = model(input_ids=torch.from_numpy(ids).long()
                    ).last_hidden_state.numpy()
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


def test_t5_position_bias_properties():
    params = init_t5(jax.random.PRNGKey(0), TINY, jnp.float32)
    bias = np.asarray(t5_position_bias(params, TINY, 9))
    assert bias.shape == (1, TINY.n_heads, 9, 9)
    # bidirectional buckets: the diagonal (rel 0) is one bucket
    diag = np.diagonal(bias[0], axis1=1, axis2=2)  # [heads, 9]
    assert np.allclose(diag, np.repeat(diag[:, :1], 9, axis=1))
    # asymmetry: future vs past offsets use different bucket halves
    assert not np.allclose(bias[0, :, 0, 5], bias[0, :, 5, 0])


def test_t5_batch_and_length_invariance():
    params = init_t5(jax.random.PRNGKey(0), TINY, jnp.float32)
    ids = np.asarray(
        jax.random.randint(jax.random.PRNGKey(3), (3, 7), 0, 128)
    )
    full = np.asarray(t5_encode(params, TINY, jnp.asarray(ids)))
    solo = np.asarray(t5_encode(params, TINY, jnp.asarray(ids[1:2])))
    np.testing.assert_allclose(full[1], solo[0], rtol=1e-5, atol=1e-6)
