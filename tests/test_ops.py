"""Numerical parity of core ops against PyTorch reference semantics.

The reference's custom LayerNorm/GroupNorm reproduce torch's formulas
(eps inside sqrt, biased variance — layernorm/mod.rs:42-49) and its
attention matches torch.scaled_dot_product_attention (backend.rs:66-74).
We verify our JAX ops against torch directly, which is the ground truth the
SDXL weights were trained with.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from sdxl_tpu.ops import (
    causal_mask,
    conditioning_embedding,
    groupnorm_nhwc,
    layernorm_affine,
    qkv_attention,
    timestep_embedding,
)

RNG = np.random.default_rng(0)


def test_layernorm_matches_torch():
    x = RNG.standard_normal((2, 7, 64)).astype(np.float32)
    g = RNG.standard_normal(64).astype(np.float32)
    b = RNG.standard_normal(64).astype(np.float32)

    ours = layernorm_affine(jnp.asarray(x), jnp.asarray(g), jnp.asarray(b))
    theirs = torch.nn.functional.layer_norm(
        torch.from_numpy(x), (64,), torch.from_numpy(g), torch.from_numpy(b)
    ).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-5)


def test_groupnorm_matches_torch():
    n, c, h, w, groups = 2, 64, 8, 8, 32
    x = RNG.standard_normal((n, c, h, w)).astype(np.float32)
    g = RNG.standard_normal(c).astype(np.float32)
    b = RNG.standard_normal(c).astype(np.float32)

    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    ours = groupnorm_nhwc(x_nhwc, jnp.asarray(g), jnp.asarray(b), n_group=groups)
    ours_nchw = np.transpose(np.asarray(ours), (0, 3, 1, 2))

    theirs = torch.nn.functional.group_norm(
        torch.from_numpy(x), groups, torch.from_numpy(g), torch.from_numpy(b)
    ).numpy()
    np.testing.assert_allclose(ours_nchw, theirs, atol=1e-5)


@pytest.mark.parametrize("n_head,causal", [(1, False), (8, False), (8, True)])
def test_attention_matches_torch_sdpa(n_head, causal):
    b, tq, tk, c = 2, 16, 16, 64
    q = RNG.standard_normal((b, tq, c)).astype(np.float32)
    k = RNG.standard_normal((b, tk, c)).astype(np.float32)
    v = RNG.standard_normal((b, tk, c)).astype(np.float32)

    mask = causal_mask(tq) if causal else None
    ours = qkv_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), mask, n_head
    )

    d = c // n_head
    qt = torch.from_numpy(q).reshape(b, tq, n_head, d).transpose(1, 2)
    kt = torch.from_numpy(k).reshape(b, tk, n_head, d).transpose(1, 2)
    vt = torch.from_numpy(v).reshape(b, tk, n_head, d).transpose(1, 2)
    theirs = (
        torch.nn.functional.scaled_dot_product_attention(qt, kt, vt, is_causal=causal)
        .transpose(1, 2)
        .reshape(b, tq, c)
        .numpy()
    )
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-5)


def test_cross_attention_different_kv_len():
    b, tq, tk, c, n_head = 1, 32, 77, 128, 2
    q = RNG.standard_normal((b, tq, c)).astype(np.float32)
    k = RNG.standard_normal((b, tk, c)).astype(np.float32)
    v = RNG.standard_normal((b, tk, c)).astype(np.float32)
    out = qkv_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), None, n_head)
    assert out.shape == (b, tq, c)


def test_timestep_embedding_cos_first():
    # reference concatenates cos then sin (unet/mod.rs:38)
    emb = np.asarray(timestep_embedding(jnp.array([0]), 8))
    np.testing.assert_allclose(emb[0, :4], np.ones(4), atol=1e-6)  # cos(0)=1
    np.testing.assert_allclose(emb[0, 4:], np.zeros(4), atol=1e-6)  # sin(0)=0


def test_timestep_embedding_values():
    # freqs = exp(-ln(10000) * i / half): golden recomputation
    t, dim = 123, 320
    half = dim // 2
    freqs = np.exp(-np.log(10000.0) * np.arange(half) / half)
    args = t * freqs
    expected = np.concatenate([np.cos(args), np.sin(args)])
    got = np.asarray(timestep_embedding(jnp.array([t]), dim))[0]
    # f32 sin/cos range reduction at |arg|~123 rad costs a few 1e-4
    np.testing.assert_allclose(got, expected, atol=5e-4)


def test_conditioning_embedding_shapes():
    pooled = jnp.zeros((2, 1280))
    size = jnp.array([[1024, 1024]] * 2)
    crop = jnp.array([[0, 0]] * 2)
    ar = jnp.array([[1024, 1024]] * 2)
    out = conditioning_embedding(pooled, 256, size, crop, ar)
    assert out.shape == (2, 2816)  # 1280 + 6*256 (base UNet adm_in_channels)

    aesthetic = jnp.array([[6]] * 2)
    out_ref = conditioning_embedding(pooled, 256, size, crop, aesthetic)
    assert out_ref.shape == (2, 2560)  # refiner adm_in_channels
