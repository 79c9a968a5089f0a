"""T5 v1.1 encoder — SD3's third text tower (text_encoder_3, T5-XXL).

Capability extension beyond the reference. Implements the encoder stack
of Raffel et al. (T5) in the v1.1 variant SD3 ships (gated-GELU FFN, no
biases anywhere, RMS layer norm), as a pytree + pure function:

  - T5LayerNorm: RMS only (no mean subtraction), variance in f32,
    learned scale
  - self-attention WITHOUT the 1/sqrt(d) logit scale (T5 folds it into
    initialization) plus a learned relative-position bias: bucketed
    relative positions (32 buckets, max_distance 128, bidirectional),
    embedded per head by block 0 and SHARED by every layer
  - gated FFN: wo(gelu_tanh(wi_0(x)) * wi_1(x))
  - final RMS norm

Parity is pinned against transformers' T5EncoderModel executing the SAME
weights (tests/test_t5.py) — a true external reference, not a
self-written mirror.

TPU notes: one jitted program; the position bias is a static [T, T]
lookup added to the attention logits (T <= 256 text tokens for SD3 —
tiny next to the MMDiT's spatial attention).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import T5Config
from ..ops.linear import linear_nobias


def t5_layernorm(x, w, eps: float = 1e-6):
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype) * w


@functools.lru_cache(maxsize=8)
def _relative_buckets(n_tokens: int, num_buckets: int,
                      max_distance: int) -> np.ndarray:
    """[T, T] int32 bucket ids (transformers _relative_position_bucket,
    bidirectional=True), static per sequence length."""
    ctx = np.arange(n_tokens)[:, None]
    mem = np.arange(n_tokens)[None, :]
    rel = mem - ctx
    nb = num_buckets // 2
    ret = (rel > 0).astype(np.int64) * nb
    n = np.abs(rel)
    max_exact = nb // 2
    is_small = n < max_exact
    large = max_exact + (
        np.log(np.maximum(n, 1) / max_exact)
        / np.log(max_distance / max_exact)
        * (nb - max_exact)
    ).astype(np.int64)
    large = np.minimum(large, nb - 1)
    ret = ret + np.where(is_small, n, large)
    return ret.astype(np.int32)


def t5_position_bias(params, cfg: T5Config, n_tokens: int) -> jnp.ndarray:
    """[1, heads, T, T] bias from block 0's relative_attention_bias."""
    buckets = jnp.asarray(
        _relative_buckets(n_tokens, cfg.relative_buckets,
                          cfg.relative_max_distance)
    )
    table = params["relative_attention_bias"]  # [buckets, heads]
    bias = table[buckets]  # [T, T, heads]
    return bias.transpose(2, 0, 1)[None]


def _t5_attention(p, x, bias, cfg: T5Config):
    b, l, _ = x.shape
    inner = cfg.n_heads * cfg.d_kv

    def heads(t):
        return t.reshape(b, l, cfg.n_heads, cfg.d_kv).transpose(0, 2, 1, 3)

    q = heads(linear_nobias(p["q"], x))
    k = heads(linear_nobias(p["k"], x))
    v = heads(linear_nobias(p["v"], x))
    # NO 1/sqrt(d) scale (T5 semantics); f32 softmax island
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
    logits = logits + bias.astype(jnp.float32)
    w = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    att = jnp.einsum("bhqk,bhkd->bhqd", w, v)
    att = att.transpose(0, 2, 1, 3).reshape(b, l, inner)
    return linear_nobias(p["o"], att)


def _t5_ffn(p, x):
    gate = jax.nn.gelu(linear_nobias(p["wi_0"], x), approximate=True)
    return linear_nobias(p["wo"], gate * linear_nobias(p["wi_1"], x))


def t5_encode(params, cfg: T5Config, tokens: jnp.ndarray) -> jnp.ndarray:
    """[B, T] int32 token ids -> [B, T, d_model] final hidden states."""
    x = params["embed"][tokens]
    bias = t5_position_bias(params, cfg, tokens.shape[1]).astype(x.dtype)
    for blk in params["blocks"]:
        h = t5_layernorm(x, blk["ln1"])
        x = x + _t5_attention(blk["attn"], h, bias, cfg)
        h = t5_layernorm(x, blk["ln2"])
        x = x + _t5_ffn(blk["ffn"], h)
    return t5_layernorm(x, params["final_ln"])


# ---------------------------------------------------------------------------
# init (tests / bring-up)
# ---------------------------------------------------------------------------


def _w(key, d_in, d_out, dtype, scale=0.02):
    return {"w": jax.random.normal(key, (d_in, d_out), dtype) * scale}


def init_t5(key, cfg: T5Config, dtype=jnp.float32):
    inner = cfg.n_heads * cfg.d_kv
    ks = iter(jax.random.split(key, 2 + 8 * cfg.n_layers))
    blocks = []
    for _ in range(cfg.n_layers):
        blocks.append({
            "ln1": jnp.ones((cfg.d_model,), dtype),
            "attn": {
                "q": _w(next(ks), cfg.d_model, inner, dtype),
                "k": _w(next(ks), cfg.d_model, inner, dtype),
                "v": _w(next(ks), cfg.d_model, inner, dtype),
                "o": _w(next(ks), inner, cfg.d_model, dtype),
            },
            "ln2": jnp.ones((cfg.d_model,), dtype),
            "ffn": {
                "wi_0": _w(next(ks), cfg.d_model, cfg.d_ff, dtype),
                "wi_1": _w(next(ks), cfg.d_model, cfg.d_ff, dtype),
                "wo": _w(next(ks), cfg.d_ff, cfg.d_model, dtype),
            },
        })
    return {
        "embed": jax.random.normal(
            next(ks), (cfg.vocab_size, cfg.d_model), dtype) * 0.02,
        "relative_attention_bias": jax.random.normal(
            next(ks), (cfg.relative_buckets, cfg.n_heads), dtype) * 0.02,
        "blocks": blocks,
        "final_ln": jnp.ones((cfg.d_model,), dtype),
    }
