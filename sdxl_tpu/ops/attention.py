"""Multi-head attention core.

Reimplements the reference's backend attention entry point
(/root/reference/src/backend.rs:88-128): q/k/v arrive as [B, T, n_state],
are split into heads, scaled-dot-product attended, and re-merged.

The reference scales q and k each by (n_state/n_head)^-0.25 (backend.rs:98)
— mathematically identical to the single 1/sqrt(d) scale used by
torch.scaled_dot_product_attention (its LibTorch fast path, backend.rs:66).
We fold the full scale into q once and run the softmax in float32 (TPU VPU
softmax in bf16 loses precision; the cast is fused by XLA).

The XLA path below already fuses into a handful of MXU ops; a Pallas
flash-attention kernel for the long spatial sequences lives in
``flash_attention.py`` and is selected automatically for large T.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def causal_mask(seq_len: int, dtype=jnp.float32) -> jnp.ndarray:
    """Additive causal mask: 0 on/below the diagonal, -inf above.

    Mirrors attn_decoder_mask (backend.rs:130-136).
    """
    i = jnp.arange(seq_len)[:, None]
    j = jnp.arange(seq_len)[None, :]
    return jnp.where(j <= i, 0.0, -jnp.inf).astype(dtype)


def _split_heads(x: jnp.ndarray, n_head: int) -> jnp.ndarray:
    b, t, c = x.shape
    return x.reshape(b, t, n_head, c // n_head).transpose(0, 2, 1, 3)


def _xla_sdpa_bhtd(qh, kh, vh):
    """Reference XLA attention over [B, H, T, D] (scale 1/sqrt(D)) — the
    math the flash kernel computes; also serves as its backward."""
    scale = qh.shape[-1] ** -0.5
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", qh * scale, kh,
        preferred_element_type=jnp.float32)
    w = jax.nn.softmax(logits, axis=-1).astype(vh.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", w, vh)


@jax.custom_vjp
def _flash_sdpa(qh, kh, vh):
    from .flash_attention import flash_attention_bhtd

    return flash_attention_bhtd(qh, kh, vh)


def _flash_sdpa_fwd(qh, kh, vh):
    from .flash_attention import flash_attention_bhtd

    if qh.shape[-1] <= 128:
        # flash residuals: O + base-2 row log-sum-exp feed the Pallas
        # backward kernels (flash_attention.py bwd section)
        o, lse = flash_attention_bhtd(qh, kh, vh, return_lse=True)
        return o, (qh, kh, vh, o, lse)
    return flash_attention_bhtd(qh, kh, vh), (qh, kh, vh, None, None)


def _flash_sdpa_bwd(res, g):
    qh, kh, vh, o, lse = res
    if o is not None:
        from .flash_attention import flash_attention_bwd_bhtd

        return flash_attention_bwd_bhtd(qh, kh, vh, o, lse, g)
    # wide-head fallback (VAE d=512 routes here only at >=3696 tokens):
    # differentiate the math-identical XLA formulation — the [Tq,Tk]
    # weights materialize in this backward, which is exactly what the
    # Pallas path above avoids for the training-hot d<=128 attentions
    _, vjp = jax.vjp(_xla_sdpa_bhtd, qh, kh, vh)
    return vjp(g)


_flash_sdpa.defvjp(_flash_sdpa_fwd, _flash_sdpa_bwd)


def qkv_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    n_head: int = 1,
) -> jnp.ndarray:
    """softmax(q kᵀ / sqrt(d) + mask) v over heads; [B, T, C] in and out.

    Long unmasked self-attention (the UNet's spatial tokens) dispatches to
    the Pallas flash kernel; short-kv cross-attention and masked CLIP
    attention stay on the XLA path, which is already fusion-optimal there.
    """
    b, tq, c = q.shape
    tk = k.shape[1]
    d = c // n_head
    scale = d ** -0.5

    qh = _split_heads(q, n_head)
    kh = _split_heads(k, n_head)
    vh = _split_heads(v, n_head)

    from .flash_attention import use_flash

    if use_flash(tq, tk, d, mask is not None):
        # Mosaic requires (8,128)-aligned trailing block dims, so the kernel
        # can't read head-strided (1,bq,1,64) tiles straight off [B,T,H,D];
        # the explicit BHTD transpose costs ~1.3 ms/step (r2 profile) and is
        # the cheapest legal layout.
        o = _flash_sdpa(qh, kh, vh)
        return o.transpose(0, 2, 1, 3).reshape(b, tq, c)

    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", qh * scale, kh, preferred_element_type=jnp.float32
    )
    if mask is not None:
        logits = logits + mask[: logits.shape[2], : logits.shape[3]]
    w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", w, vh)
    return o.transpose(0, 2, 1, 3).reshape(b, tq, c)
