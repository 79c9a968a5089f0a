"""Isolate the min_t=924 TPU worker crash at 832x1216.

Standalone flash_attention_bhtd at (2,20,988,64) passes on-chip; the full
UNet program with L2 flash enabled crashes the worker. Bisect the
composition: qkv_attention entry (transpose + pad + kernel), then a
transformer-block-like chain.
"""

import sys
import time

sys.path.insert(0, ".")

from sdxl_tpu.utils.cache import init_compilation_cache

init_compilation_cache()

import jax
import jax.numpy as jnp

from sdxl_tpu.ops.attention import qkv_attention

print("devices:", jax.devices(), flush=True)


def stage(name, fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name}: ok {time.perf_counter() - t0:.2f}s", flush=True)
    return out


# 1. qkv_attention entry at the L2-ragged shape (includes _split_heads
#    transposes + in-jit pad)
b, t, c, h = 2, 988, 1280, 20
k0 = jax.random.PRNGKey(0)
q = jax.random.normal(k0, (b, t, c), jnp.bfloat16)
k = jax.random.normal(jax.random.PRNGKey(1), (b, t, c), jnp.bfloat16)
v = jax.random.normal(jax.random.PRNGKey(2), (b, t, c), jnp.bfloat16)

f1 = jax.jit(lambda q, k, v: qkv_attention(q, k, v, None, h))
stage("qkv_attention 988x1280 bf16", f1, q, v, k)

# 2. L1 shape through the same entry
b, t, c, h = 2, 3952, 640, 10
q = jax.random.normal(k0, (b, t, c), jnp.bfloat16)
k = jax.random.normal(jax.random.PRNGKey(1), (b, t, c), jnp.bfloat16)
v = jax.random.normal(jax.random.PRNGKey(2), (b, t, c), jnp.bfloat16)
f2 = jax.jit(lambda q, k, v: qkv_attention(q, k, v, None, h))
stage("qkv_attention 3952x640 bf16", f2, q, k, v)

# 3. both inside ONE jit, chained (closer to the UNet program)
def chain(x640, x1280):
    a = qkv_attention(x640, x640, x640, None, 10)
    b_ = qkv_attention(x1280, x1280, x1280, None, 20)
    return a.sum() + b_.sum()

x640 = jax.random.normal(k0, (2, 3952, 640), jnp.bfloat16)
x1280 = jax.random.normal(k0, (2, 988, 1280), jnp.bfloat16)
stage("chained both shapes one jit", jax.jit(chain), x640, x1280)

# 4. a real spatial transformer at 1280/20 with 26x38 latent
from sdxl_tpu.models.unet import _init_spatial_transformer, _spatial_transformer

p = _init_spatial_transformer(jax.random.PRNGKey(3), 1280, 2048, 2,
                              jnp.bfloat16)
x = jax.random.normal(k0, (2, 26, 38, 1280), jnp.bfloat16)
ctx = jax.random.normal(k0, (2, 77, 2048), jnp.bfloat16)
f4 = jax.jit(lambda p, x, ctx: _spatial_transformer(p, x, ctx, 20))
stage("spatial_transformer 26x38x1280", f4, p, x, ctx)

print("ALL OK", flush=True)
