"""On-chip flash-vs-XLA check and timing sweep at ragged (non-square-bucket)
token counts.

Validates the padded-Q kernel path on real TPU hardware: correctness
(allclose vs the XLA reference) and the win threshold that use_flash()
encodes (flash must beat the materializing XLA path at every bucket's
level-1/2 token counts, 3696..4096 and 924..1024).

Run: python scripts/bench_flash_ragged.py
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from sdxl_tpu.ops.flash_attention import flash_attention_bhtd


@jax.jit
def xla_ref(q, k, v):
    d = q.shape[-1]
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q * (d**-0.5), k, preferred_element_type=jnp.float32
    )
    w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", w, v)


def timeit(fn, *args, iters=30):
    fn(*args)[0].block_until_ready() if isinstance(fn(*args), tuple) else fn(
        *args
    ).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    out.block_until_ready()
    return (time.perf_counter() - t0) / iters * 1e6  # us


def main():
    print(f"devices: {jax.devices()}")
    # (B, H, T, D) — B=2 is the CFG pair-batch; H matches the SDXL level
    cases = [
        (2, 10, 4096, 64, "L1 1024x1024 (aligned)"),
        (2, 10, 3952, 64, "L1 832x1216 (ragged)"),
        (2, 10, 3696, 64, "L1 704x1344 (smallest ragged)"),
        (2, 20, 1024, 64, "L2 1024x1024 (aligned)"),
        (2, 20, 988, 64, "L2 832x1216 (ragged)"),
        (2, 20, 924, 64, "L2 704x1344 (smallest ragged)"),
        (1, 1, 15808, 512, "VAE mid 832x1216 (ragged)"),
    ]
    for b, h, t, d, label in cases:
        kq = jax.random.PRNGKey(0)
        q = jax.random.normal(kq, (b, h, t, d), jnp.bfloat16)
        k = jax.random.normal(jax.random.PRNGKey(1), (b, h, t, d), jnp.bfloat16)
        v = jax.random.normal(jax.random.PRNGKey(2), (b, h, t, d), jnp.bfloat16)
        got = np.asarray(flash_attention_bhtd(q, k, v), np.float32)
        ref = np.asarray(xla_ref(q, k, v), np.float32)
        err = np.abs(got - ref).max()
        t_flash = timeit(flash_attention_bhtd, q, k, v)
        t_xla = timeit(xla_ref, q, k, v)
        speedup = t_xla / t_flash
        print(
            f"{label:36s} B{b} H{h:2d} T{t:5d} D{d:3d}  "
            f"max_err {err:.2e}  flash {t_flash:8.1f}us  xla {t_xla:8.1f}us  "
            f"speedup {speedup:5.2f}x"
        )
        assert err < 3e-2, (label, err)


if __name__ == "__main__":
    main()
