"""Microbenchmark: attention implementations at SDXL UNet shapes.

Shapes that dominate the UNet (1024x1024 image, CFG pair-batched B=2):
  - level-1 self-attn:  T=4096, H=10, D=64, depth-2 transformers
  - level-2 self-attn:  T=1024, H=20, D=64, depth-10 x3 sites
  - cross-attn:         Tq as above, Tkv=77
  - VAE mid attn:       T=16384(128^2 latent), H=1, D=512 (f32)
"""

import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(f, *args, iters=50):
    g = jax.jit(lambda *a: jnp.sum(f(*a).astype(jnp.float32)))
    _ = float(g(*args))  # compile+warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = g(*args)
    _ = float(out)  # the only reliable fence on axon is a host readback
    return (time.perf_counter() - t0) / iters


def xla_attn(q, k, v):
    d = q.shape[-1]
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q * (d**-0.5), k, preferred_element_type=jnp.float32
    )
    w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", w, v)


def jax_dpa(q, k, v):
    # jax.nn.dot_product_attention expects BTHD
    return jax.nn.dot_product_attention(
        q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3)
    ).transpose(0, 2, 1, 3)


def builtin_flash(q, k, v):
    from jax.experimental.pallas.ops.tpu.flash_attention import flash_attention

    return flash_attention(q, k, v, causal=False, sm_scale=q.shape[-1] ** -0.5)


def main():
    cases = [
        ("L1 self 4096x10x64", (2, 10, 4096, 64), (2, 10, 4096, 64)),
        ("L2 self 1024x20x64", (2, 20, 1024, 64), (2, 20, 1024, 64)),
        ("L1 cross q4096 kv77", (2, 10, 4096, 64), (2, 10, 77, 64)),
        ("L2 cross q1024 kv77", (2, 20, 1024, 64), (2, 20, 77, 64)),
    ]
    def ours(q, k, v):
        from sdxl_tpu.ops.flash_attention import flash_attention_bhtd

        return flash_attention_bhtd(q, k, v)

    impls = [
        ("xla", xla_attn),
        ("jax_dpa", jax_dpa),
        ("pallas_flash", builtin_flash),
        ("ours", ours),
    ]

    for name, qs, ks in cases:
        kq = jax.random.PRNGKey(0)
        q = jax.random.normal(kq, qs, jnp.bfloat16)
        k = jax.random.normal(kq, ks, jnp.bfloat16)
        v = jax.random.normal(kq, ks, jnp.bfloat16)
        row = [name]
        for iname, f in impls:
            try:
                dt = timeit(f, q, k, v)
                row.append(f"{iname}={dt*1e6:.0f}us")
            except Exception as e:
                row.append(f"{iname}=ERR({type(e).__name__}: {str(e)[:60]})")
        print("  ".join(row), flush=True)

    # block-size sweep for our kernel at the two self-attn shapes
    from sdxl_tpu.ops.flash_attention import flash_attention_bhtd

    for name, qs in [("sweep 4096x10x64", (2, 10, 4096, 64)),
                     ("sweep 1024x20x64", (2, 20, 1024, 64))]:
        kq = jax.random.PRNGKey(0)
        q = jax.random.normal(kq, qs, jnp.bfloat16)
        row = [name]
        t = qs[2]
        for bq in (128, 256, 512, 1024):
            for bk in (256, 512, 1024, 2048):
                if bq > t or bk > t:
                    continue
                try:
                    dt = timeit(
                        functools.partial(
                            flash_attention_bhtd, block_q=bq, block_k=bk
                        ),
                        q, q, q,
                    )
                    row.append(f"q{bq}k{bk}={dt*1e6:.0f}us")
                except Exception as e:
                    row.append(f"q{bq}k{bk}=ERR({str(e)[:40]})")
        print("  ".join(row), flush=True)


if __name__ == "__main__":
    main()
