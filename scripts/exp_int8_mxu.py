"""Experiment: is w8a8 (int8 x int8 -> int32 on the MXU) worth building?

Weight-only quantization (ops/quant.py) dequantizes to bf16 and pays
bf16 MXU rates. v5e's MXU doubles throughput for int8 x int8 -> int32.
This measures, at the FLUX.1 matmul shapes (4608 tokens, 3072 hidden),
the steady-state cost of a CHAINED loop of:

  a) bf16 @ bf16                      (today's compute path)
  b) dynamic act-quant + s8 @ s8 -> s32 + f32 rescale (w8a8 candidate)
  c) s8 weight dequant -> bf16 @ bf16 (today's weight-only quantized)

The chain (each iteration consumes the previous result) defeats the
async-dispatch illusion a naive timing loop produces through the axon
tunnel. If (b) is not clearly faster than (c), w8a8 buys nothing and
adds activation-quantization error.  Run: python scripts/exp_int8_mxu.py
"""

import sys
import time
from functools import partial

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

L = 64  # chained matmuls per timed program


def timed(fn, *args):
    from sdxl_tpu.utils import fence

    fence(fn(*args))  # block_until_ready is a no-op through the tunnel
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        fence(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best / L * 1e3  # ms per matmul


def main():
    rng = np.random.default_rng(0)
    m, k = 4608, 3072
    x = jnp.asarray(rng.normal(0, 1, (m, k)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(0, 0.02, (k, k)), jnp.bfloat16)
    wq = jnp.asarray(rng.integers(-127, 128, (k, k)), jnp.int8)
    ws = jnp.asarray(rng.uniform(1e-4, 1e-3, (k,)), jnp.float32)
    flops = 2 * m * k * k

    @jax.jit
    def f_bf16(x, w):
        def step(h, _):
            return jnp.tanh(h @ w), None
        return jax.lax.scan(step, x, None, length=L)[0]

    @jax.jit
    def f_w8a8(x, wq, ws):
        def step(h, _):
            s = jnp.max(jnp.abs(h)).astype(jnp.float32) / 127.0
            hq = jnp.clip(jnp.rint(h.astype(jnp.float32) / s),
                          -127, 127).astype(jnp.int8)
            acc = jax.lax.dot_general(
                hq, wq, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            out = (acc.astype(jnp.float32) * (s * ws)).astype(jnp.bfloat16)
            return jnp.tanh(out), None
        return jax.lax.scan(step, x, None, length=L)[0]

    @jax.jit
    def f_wonly(x, wq, ws):
        def step(h, _):
            wd = (wq.astype(jnp.float32) * ws).astype(jnp.bfloat16)
            return jnp.tanh(h @ wd), None
        return jax.lax.scan(step, x, None, length=L)[0]

    t_bf = timed(f_bf16, x, w)
    t_w8 = timed(f_w8a8, x, wq, ws)
    t_wo = timed(f_wonly, x, wq, ws)
    print(f"[{m}x{k}x{k} chained x{L}]")
    print(f"  bf16:               {t_bf:.3f} ms/matmul "
          f"({flops / t_bf / 1e9:.0f} GFLOP/ms = "
          f"{flops / t_bf / 1e9:.0f}e12 FLOP/s-eq)")
    print(f"  w8a8 + dyn act q:   {t_w8:.3f} ms/matmul "
          f"({t_bf / t_w8:.2f}x bf16)")
    print(f"  weight-only dequant:{t_wo:.3f} ms/matmul "
          f"({t_bf / t_wo:.2f}x bf16)")


if __name__ == "__main__":
    main()
