"""CLIP text towers vs transformers' REFERENCE implementation.

The CLIP/OpenCLIP towers were pinned against self-written torch mirrors
(tests/test_clip.py) — adequate for math, but a structural misreading
could pass both sides. This file executes IDENTICAL weights through
transformers' CLIPTextModel / CLIPTextModelWithProjection (a true
external reference, like the T5 pinning in test_t5.py): penultimate
hidden extraction, causal masking, EOT pooling, text_projection, and
both activation variants (quick_gelu = OpenAI ViT-L, gelu = the
OpenCLIP-bigG-style SDXL text_encoder_2 export) — through the SAME
io/hf_sdxl.build_clip_from_hf loader the diffusers checkpoint path
uses in production.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from sdxl_tpu.configs import CLIPConfig
from sdxl_tpu.io.hf_sdxl import build_clip_from_hf
from sdxl_tpu.models.clip import clip_hidden, clip_hidden_pooled


def _hf_state_to_tensors(model):
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    # the diffusers text_encoder layout: text_model.* keys, projection at
    # top level — remap exactly like io/flux.py's loader does
    return {(k if k.startswith("text_model") else f"text_model.{k}"): v
            for k, v in sd.items()}


def _make(hidden, heads, layers, act, proj, vocab=1000, seed=0):
    from transformers import CLIPTextConfig, CLIPTextModelWithProjection

    torch.manual_seed(seed)
    tcfg = CLIPTextConfig(
        vocab_size=vocab, hidden_size=hidden,
        intermediate_size=hidden * 4, num_hidden_layers=layers,
        num_attention_heads=heads, max_position_embeddings=77,
        hidden_act=act, projection_dim=proj,
        # a unique high EOT id: both of transformers' pooling branches
        # (pure argmax for the original eos_token_id==2 configs, masked
        # search otherwise) then agree with the reference's argmax pool
        eos_token_id=vocab - 1,
    )
    model = CLIPTextModelWithProjection(tcfg).eval()
    cfg = CLIPConfig(n_vocab=vocab, n_state=hidden, embed_dim=proj,
                     n_head=heads, n_ctx=77, n_layer=layers,
                     quick_gelu=(act == "quick_gelu"))
    params = build_clip_from_hf(_hf_state_to_tensors(model), cfg,
                                prefix="text_model")
    return model, cfg, params


def _token_ids(vocab, batch=2, n_ctx=77, content=9, seed=1):
    rng = np.random.default_rng(seed)
    ids = np.zeros((batch, n_ctx), np.int64)  # pad = 0 (OpenCLIP-style)
    ids[:, 0] = vocab - 2                     # SOT stand-in
    ids[:, 1:content + 1] = rng.integers(1, vocab - 2, (batch, content))
    ids[:, content + 1] = vocab - 1           # unique EOT
    return ids


@pytest.mark.parametrize("act", ["quick_gelu", "gelu"])
def test_clip_tower_matches_transformers(act):
    model, cfg, params = _make(64, 4, 3, act, proj=48)
    ids = _token_ids(1000)
    with torch.no_grad():
        out = model(input_ids=torch.from_numpy(ids),
                    output_hidden_states=True)

    # penultimate-hidden semantics: after idx blocks, NO final LN
    idx = cfg.n_layer - 1
    ours_h = np.asarray(clip_hidden(params, cfg, jnp.asarray(ids), idx))
    np.testing.assert_allclose(ours_h, out.hidden_states[idx].numpy(),
                               rtol=1e-4, atol=1e-5)

    # projected EOT pool (SDXL bigG pooled / SD3 dual pooled path)
    _, pooled = clip_hidden_pooled(params, cfg, jnp.asarray(ids), idx)
    np.testing.assert_allclose(np.asarray(pooled),
                               out.text_embeds.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_clip_unprojected_pooler_matches_transformers():
    """project=False == CLIPTextModel's pooler_output (the Flux
    conditioning path)."""
    from transformers import CLIPTextModel

    model, cfg, params = _make(64, 4, 3, "quick_gelu", proj=48)
    bare = CLIPTextModel(model.config).eval()
    bare.text_model.load_state_dict(model.text_model.state_dict())
    ids = _token_ids(1000, seed=3)
    with torch.no_grad():
        out = bare(input_ids=torch.from_numpy(ids))
    _, pooled = clip_hidden_pooled(params, cfg, jnp.asarray(ids),
                                   cfg.n_layer - 1, project=False)
    np.testing.assert_allclose(np.asarray(pooled),
                               out.pooler_output.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_clip_last_hidden_with_final_ln_matches():
    """Our pooled path's final LN == transformers last_hidden_state
    (the SD1-family conditioning uses the LN'd final hidden)."""
    from sdxl_tpu.ops.norms import layernorm_affine

    model, cfg, params = _make(64, 4, 2, "quick_gelu", proj=48, seed=5)
    ids = _token_ids(1000, seed=6)
    with torch.no_grad():
        out = model(input_ids=torch.from_numpy(ids))
    h = clip_hidden(params, cfg, jnp.asarray(ids), cfg.n_layer)
    normed = layernorm_affine(h, **params["layer_norm"])
    np.testing.assert_allclose(np.asarray(normed),
                               out.last_hidden_state.numpy(),
                               rtol=1e-4, atol=1e-5)
