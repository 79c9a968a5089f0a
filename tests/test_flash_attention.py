"""Flash-attention kernel correctness (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdxl_tpu.ops.attention import qkv_attention
from sdxl_tpu.ops.flash_attention import flash_attention_bhtd, use_flash


def xla_ref(q, k, v):
    d = q.shape[-1]
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q * (d**-0.5), k, preferred_element_type=jnp.float32
    )
    w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", w, v)


@pytest.mark.parametrize("shape,blocks", [
    ((1, 2, 1024, 64), (256, 512)),   # UNet level-2 shape class
    ((1, 1, 1024, 128), (512, 1024)), # single k block (n_k=1)
])
def test_flash_matches_xla(shape, blocks):
    b, h, t, d = shape
    q = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), shape, jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), shape, jnp.float32)
    ref = np.asarray(xla_ref(q, k, v))
    got = np.asarray(flash_attention_bhtd(q, k, v, *blocks))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_flash_dispatch_matches_xla_path():
    """qkv_attention must give the same result whether or not it routes to
    the flash kernel."""
    b, t, c, h = 1, 1024, 128, 2
    q = jax.random.normal(jax.random.PRNGKey(0), (b, t, c))
    k = jax.random.normal(jax.random.PRNGKey(1), (b, t, c))
    v = jax.random.normal(jax.random.PRNGKey(2), (b, t, c))
    assert use_flash(t, t, c // h, False)
    out = qkv_attention(q, k, v, None, h)

    qh = q.reshape(b, t, h, c // h).transpose(0, 2, 1, 3)
    kh = k.reshape(b, t, h, c // h).transpose(0, 2, 1, 3)
    vh = v.reshape(b, t, h, c // h).transpose(0, 2, 1, 3)
    ref = np.asarray(xla_ref(qh, kh, vh))
    got = np.asarray(out.reshape(b, t, h, c // h).transpose(0, 2, 1, 3))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_use_flash_gating():
    assert not use_flash(77, 77, 64, False)        # short text tokens
    # padded short-kv cross-attn is supported by the kernel but routed to
    # XLA (measured slower in-program; see use_flash docstring)
    assert not use_flash(4096, 77, 64, False)
    assert not use_flash(1024, 77, 64, False)
    assert not use_flash(1024, 1024, 64, True)     # masked (CLIP causal)
    assert use_flash(4096, 4096, 64, False)        # UNet L1 self
    assert use_flash(16384, 16384, 512, False)     # VAE mid attn @1024px
    # ragged buckets (padded-q + masked kv) route to flash too
    assert use_flash(15808, 15808, 512, False)     # VAE mid attn @832x1216
    assert use_flash(3952, 3952, 64, False)        # UNet L1 @832x1216
    assert use_flash(988, 988, 64, False)          # UNet L2 @832x1216
    assert use_flash(924, 924, 64, False)          # smallest L2 (704x1344)
    assert not use_flash(512, 512, 64, False)      # below the win threshold


@pytest.mark.parametrize("t,d", [
    (3952, 64),   # UNet L1 @832x1216: ragged q AND kv, multi k-block
    (988, 64),    # UNet L2 @832x1216: ragged, single padded block
    (1020, 128),  # ragged, d=128
])
def test_flash_ragged_tokens_match_xla(t, d):
    """Non-square aspect buckets produce token counts that are not block
    multiples; the kernel pads q (sliced off the output) and masks kv."""
    shape = (1, 2, t, d)
    q = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), shape, jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), shape, jnp.float32)
    ref = np.asarray(xla_ref(q, k, v))
    got = np.asarray(flash_attention_bhtd(q, k, v))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_flash_ragged_dispatch_through_qkv_attention():
    b, t, c, h = 1, 988, 128, 2
    q = jax.random.normal(jax.random.PRNGKey(0), (b, t, c))
    k = jax.random.normal(jax.random.PRNGKey(1), (b, t, c))
    v = jax.random.normal(jax.random.PRNGKey(2), (b, t, c))
    assert use_flash(t, t, c // h, False)
    out = qkv_attention(q, k, v, None, h)
    qh = q.reshape(b, t, h, c // h).transpose(0, 2, 1, 3)
    kh = k.reshape(b, t, h, c // h).transpose(0, 2, 1, 3)
    vh = v.reshape(b, t, h, c // h).transpose(0, 2, 1, 3)
    ref = np.asarray(xla_ref(qh, kh, vh))
    got = np.asarray(out.reshape(b, t, h, c // h).transpose(0, 2, 1, 3))
    np.testing.assert_allclose(got, ref, atol=2e-5)


@pytest.mark.parametrize("tq", [1024, 2048])
def test_flash_cross_attention_padded_kv(tq):
    """Short-kv (77-token context) path: zero-padded to the 128 lane tile
    and masked in-kernel; must match the XLA reference exactly."""
    qs = (1, 2, tq, 64)
    ks = (1, 2, 77, 64)
    q = jax.random.normal(jax.random.PRNGKey(0), qs, jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), ks, jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), ks, jnp.float32)
    ref = np.asarray(xla_ref(q, k, v))
    got = np.asarray(flash_attention_bhtd(q, k, v))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_qkv_attention_cross_stays_on_xla():
    b, tq, tk, c, h = 2, 1024, 77, 128, 2
    assert not use_flash(tq, tk, c // h, False)



def test_flash_path_is_differentiable_and_matches_xla_grads():
    """jax.grad through the flash-routed qkv_attention (custom_vjp:
    flash forward, XLA-math backward) == grads of the pure-XLA
    formulation. Unlocks training through the production attention
    (the raw pallas_call has no autodiff rule)."""
    b, h, t, d = 1, 2, 1024, 64
    c = h * d
    ks = jax.random.split(jax.random.PRNGKey(3), 4)
    q = jax.random.normal(ks[0], (b, t, c), jnp.float32)
    k = jax.random.normal(ks[1], (b, t, c), jnp.float32)
    v = jax.random.normal(ks[2], (b, t, c), jnp.float32)
    cot = jax.random.normal(ks[3], (b, t, c), jnp.float32)

    assert use_flash(t, t, d, False)

    def loss_flash(q, k, v):
        return jnp.sum(qkv_attention(q, k, v, n_head=h) * cot)

    def loss_xla(q, k, v):
        qh = q.reshape(b, t, h, d).transpose(0, 2, 1, 3)
        kh = k.reshape(b, t, h, d).transpose(0, 2, 1, 3)
        vh = v.reshape(b, t, h, d).transpose(0, 2, 1, 3)
        o = xla_ref(qh, kh, vh).transpose(0, 2, 1, 3).reshape(b, t, c)
        return jnp.sum(o * cot)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, r, name in zip(gf, gx, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(r), atol=2e-4, err_msg=name)


@pytest.mark.parametrize("tq,tk,d", [
    (1024, 1024, 64),    # aligned square (level-2 class)
    (1000, 1000, 64),    # ragged both sides
])
def test_flash_backward_kernels_match_xla_vjp(tq, tk, d):
    """The Pallas backward (dq + dk/dv kernels) == grads of the XLA
    formulation, incl. padded-q rows and masked kv columns."""
    from sdxl_tpu.ops.flash_attention import (
        flash_attention_bhtd,
        flash_attention_bwd_bhtd,
    )

    b, h = 1, 2
    ks = jax.random.split(jax.random.PRNGKey(5), 4)
    q = jax.random.normal(ks[0], (b, h, tq, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, h, tk, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, h, tk, d), jnp.float32)
    g = jax.random.normal(ks[3], (b, h, tq, d), jnp.float32)

    o, lse = flash_attention_bhtd(q, k, v, return_lse=True)
    np.testing.assert_allclose(
        np.asarray(o), np.asarray(xla_ref(q, k, v)), atol=2e-5)
    # lse is the base-2 log-sum-exp of the scaled logits
    z = np.einsum("bhqd,bhkd->bhqk", np.asarray(q) * d**-0.5,
                  np.asarray(k))
    lse_ref = np.log2(np.exp(z - z.max(-1, keepdims=True)).sum(-1)) \
        + z.max(-1) * np.log2(np.e)
    np.testing.assert_allclose(np.asarray(lse), lse_ref, atol=2e-4)

    dq, dk, dv = flash_attention_bwd_bhtd(q, k, v, o, lse, g)
    ref, vjp = jax.vjp(xla_ref, q, k, v)
    rq, rk, rv = vjp(g)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(rq), atol=5e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(rk), atol=5e-4)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(rv), atol=5e-4)
