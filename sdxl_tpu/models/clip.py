"""CLIP text transformer (both SDXL embedder towers).

Reimplements /root/reference/src/model/clip/mod.rs as pure functions over a
parameter pytree:

  - token + learned positional embedding        (clip/mod.rs:99-104)
  - pre-LN causal residual blocks               (clip/mod.rs:194-199)
  - forward_hidden(x, idx): raw hidden state after `idx` blocks — the
    penultimate-layer trick                     (clip/mod.rs:94-112)
  - forward_hidden_pooled: full tower + final LN, pooled at the EOT
    position (argmax of token ids) through text_projection
                                                (clip/mod.rs:114-151)
  - quick_gelu (x·σ(1.702x)) for OpenAI CLIP; exact gelu for OpenCLIP
                                                (clip/mod.rs:296-320)

Both towers run as a single jitted program in float32 (reference stages the
embedder in f32, sample/main.rs:121,219).

Param pytree:
  token_embedding: [n_vocab, n_state]
  position_embedding: [n_ctx, n_state]
  blocks: [ { attn: {q,k,v,out: {w,b}}, attn_ln: {g,b},
              mlp: {fc1: {w,b}, fc2: {w,b}}, mlp_ln: {g,b} } ] * n_layer
  layer_norm: {g,b}
  text_projection: [n_state, embed_dim] | None
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..configs import CLIPConfig
from ..ops.attention import causal_mask, qkv_attention
from ..ops.linear import linear
from ..ops.norms import layernorm_affine


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(1.702 * x)


def _mlp(p, x, use_quick_gelu: bool):
    h = linear(p["fc1"], x)
    h = quick_gelu(h) if use_quick_gelu else jax.nn.gelu(h, approximate=False)
    return linear(p["fc2"], h)


def _attn(p, x, mask, n_head):
    q = linear(p["q"], x)
    k = linear(p["k"], x)
    v = linear(p["v"], x)
    return linear(p["out"], qkv_attention(q, k, v, mask, n_head))


def _block(p, x, mask, cfg: CLIPConfig):
    x = x + _attn(p["attn"], layernorm_affine(x, **p["attn_ln"]), mask, cfg.n_head)
    x = x + _mlp(p["mlp"], layernorm_affine(x, **p["mlp_ln"]), cfg.quick_gelu)
    return x


def _embed(params, tokens):
    seq_len = tokens.shape[1]
    return (
        params["token_embedding"][tokens]
        + params["position_embedding"][:seq_len][None, :, :]
    )


def clip_hidden(params, cfg: CLIPConfig, tokens: jnp.ndarray, hidden_idx: int):
    """Hidden state after ``hidden_idx`` blocks, no final LN (clip/mod.rs:94-112)."""
    mask = causal_mask(tokens.shape[1])
    x = _embed(params, tokens)
    for p in params["blocks"][:hidden_idx]:
        x = _block(p, x, mask, cfg)
    return x


def clip_hidden_pooled(params, cfg: CLIPConfig, tokens: jnp.ndarray,
                       hidden_idx: int, project: bool = True):
    """(hidden @ hidden_idx, pooled EOT embedding) (clip/mod.rs:114-151).

    project=False skips text_projection even when the tower carries one —
    the Flux family conditions on CLIPTextModel's raw pooler_output."""
    mask = causal_mask(tokens.shape[1])
    x = _embed(params, tokens)
    h_out = x
    for i, p in enumerate(params["blocks"]):
        if i == hidden_idx:
            h_out = x
        x = _block(p, x, mask, cfg)

    # EOT token is the highest id in each sequence (clip/mod.rs:141).
    # Textual-inversion pseudo-tokens carry ids >= n_vocab; mask them to -1
    # so the argmax still lands on the true EOT (identical behavior for
    # in-vocab prompts).
    pool_ids = jnp.where(tokens < cfg.n_vocab, tokens, -1)
    eot_idx = jnp.argmax(pool_ids, axis=1)
    normed = layernorm_affine(x, **params["layer_norm"])
    o = jnp.take_along_axis(normed, eot_idx[:, None, None], axis=1)[:, 0, :]
    t_proj = params.get("text_projection") if project else None
    pooled = o @ t_proj if t_proj is not None else o
    return h_out, pooled


def clip_final_hidden(params, cfg: CLIPConfig, tokens: jnp.ndarray):
    """Full tower + final LayerNorm — SD 1.x conditioning (the diffusers
    text_encoder's last_hidden_state). SDXL instead taps the penultimate
    hidden without the final LN (clip_hidden); both live on the same
    parameter pytree."""
    mask = causal_mask(tokens.shape[1])
    x = _embed(params, tokens)
    for p in params["blocks"]:
        x = _block(p, x, mask, cfg)
    return layernorm_affine(x, **params["layer_norm"])


# ---------------------------------------------------------------------------
# Initialization (tests / bring-up without real weights)
# ---------------------------------------------------------------------------

def init_clip(key, cfg: CLIPConfig, dtype=jnp.float32, scale: float = 0.02):
    def dense(k, d_in, d_out):
        return {
            "w": jax.random.normal(k, (d_in, d_out), dtype) * scale,
            "b": jnp.zeros((d_out,), dtype),
        }

    def ln(d):
        return {"gamma": jnp.ones((d,), dtype), "beta": jnp.zeros((d,), dtype)}

    keys = jax.random.split(key, cfg.n_layer + 3)
    s = cfg.n_state
    blocks = []
    for i in range(cfg.n_layer):
        ks = jax.random.split(keys[i], 6)
        blocks.append(
            {
                "attn": {
                    "q": dense(ks[0], s, s),
                    "k": dense(ks[1], s, s),
                    "v": dense(ks[2], s, s),
                    "out": dense(ks[3], s, s),
                },
                "attn_ln": ln(s),
                "mlp": {"fc1": dense(ks[4], s, 4 * s), "fc2": dense(ks[5], 4 * s, s)},
                "mlp_ln": ln(s),
            }
        )
    return {
        "token_embedding": jax.random.normal(keys[-3], (cfg.n_vocab, s), dtype) * scale,
        "position_embedding": jax.random.normal(keys[-2], (cfg.n_ctx, s), dtype) * scale,
        "blocks": blocks,
        "layer_norm": ln(s),
        "text_projection": jax.random.normal(keys[-1], (s, cfg.embed_dim), dtype)
        * scale,
    }
