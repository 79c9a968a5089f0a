"""Ring (context-parallel) flash attention (parallel/ring_attention.py):
the log-sum-exp partial merge, exactness of the ring result against
single-device attention on the 8-device virtual mesh, and dp x cp
composition."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdxl_tpu.ops.flash_attention import flash_attention_bhtd
from sdxl_tpu.parallel.mesh import make_mesh
from sdxl_tpu.parallel.ring_attention import (
    lse_merge,
    ring_attention,
    ring_attention_local,
)


def _ref_attention(q, k, v):
    """Plain f32 softmax attention, scale 1/sqrt(d)."""
    d = q.shape[-1]
    logits = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) / np.sqrt(d)
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", w, v.astype(jnp.float32))


def _qkv(b=1, h=2, t=256, d=64, key=0, dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(key), 3)
    q = jax.random.normal(ks[0], (b, h, t, d), dtype)
    k = jax.random.normal(ks[1], (b, h, t, d), dtype)
    v = jax.random.normal(ks[2], (b, h, t, d), dtype)
    return q, k, v


def test_lse_merge_equals_full_softmax():
    """Merging the two halves' partial (o, lse) == softmax over all keys
    — pure math check, no kernel involved."""
    rng = np.random.default_rng(0)
    t, tk, d = 8, 32, 4
    z = rng.standard_normal((t, tk)).astype(np.float32) * 3
    vv = rng.standard_normal((tk, d)).astype(np.float32)

    def partial(zs, vs):
        # base-2 lse like the kernel: logits pre-scaled by log2(e)
        z2 = zs * np.log2(np.e)
        m = z2.max(-1, keepdims=True)
        w = np.exp2(z2 - m)
        o = (w @ vs) / w.sum(-1, keepdims=True)
        return jnp.asarray(o), jnp.asarray(m[:, 0] + np.log2(w.sum(-1)))

    o1, l1 = partial(z[:, :16], vv[:16])
    o2, l2 = partial(z[:, 16:], vv[16:])
    merged, _ = lse_merge(o1, l1, o2, l2)
    full = jax.nn.softmax(jnp.asarray(z), -1) @ jnp.asarray(vv)
    np.testing.assert_allclose(np.asarray(merged), np.asarray(full),
                               atol=1e-5)


@pytest.mark.parametrize("n_model", [2, 4, 8])
def test_ring_equals_single_device(n_model):
    mesh = make_mesh(n_data=8 // n_model, n_model=n_model)
    q, k, v = _qkv(t=256)
    out = ring_attention(q, k, v, mesh)
    ref = _ref_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)
    # and against the single-call kernel itself
    single = flash_attention_bhtd(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(single),
                               atol=2e-5, rtol=1e-4)


def test_ring_ragged_local_shards():
    """T/n not a block multiple: local shards of 36 tokens exercise the
    kernel's padded-q/masked-kv path inside the ring."""
    mesh = make_mesh(n_data=2, n_model=4)
    q, k, v = _qkv(t=144, key=3)
    out = ring_attention(q, k, v, mesh)
    ref = _ref_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_ring_dp_cp_composition():
    """Batch sharded over data x tokens over model == replicated result."""
    mesh = make_mesh(n_data=2, n_model=4)
    q, k, v = _qkv(b=2, t=128, key=5)
    out = ring_attention(q, k, v, mesh, batch_axis="data")
    ref = _ref_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_ring_bf16():
    mesh = make_mesh(n_data=4, n_model=2)
    q, k, v = _qkv(t=256, key=7, dtype=jnp.bfloat16)
    out = ring_attention(q, k, v, mesh)
    single = flash_attention_bhtd(q, k, v)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(single, np.float32),
        atol=2e-2, rtol=2e-2)


def test_ring_rejects_indivisible_tokens():
    mesh = make_mesh(n_data=2, n_model=4)
    q, k, v = _qkv(t=130)
    with pytest.raises(ValueError, match="divide"):
        ring_attention(q, k, v, mesh)


def test_ring_local_under_jit_matches():
    """ring_attention_local composes under jit + shard_map (the form a
    model forward would embed); same result as the wrapper."""
    from functools import partial

    from jax.sharding import PartitionSpec as P

    mesh = make_mesh(n_data=1, n_model=8)
    q, k, v = _qkv(t=256, key=11)
    spec = P(None, None, "model", None)
    f = jax.jit(jax.shard_map(
        partial(ring_attention_local, axis_name="model"),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False))
    out = f(q, k, v)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(ring_attention(q, k, v, mesh)),
                               atol=1e-6)
