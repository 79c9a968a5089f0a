"""Software-pipelined flash attention: overlap softmax (VPU) with the next
k-block's QK matmul (MXU).

The production kernel's per-step chain QK -> softmax -> PV serializes the
VPU behind the MXU (exp_flash_floor.py: full 1511us vs mxu_only 1195us at
T=4096). This variant extends the k grid axis by one step and ping-pongs
the f32 logits tile between two VMEM buffers:

  step ik:  produce   s[ik%2]   = QK(k_block ik)        (MXU)   [ik < n_k]
            consume   softmax(s[(ik-1)%2]) -> PV/acc    (VPU+MXU) [ik > 0]

Within a step the two halves touch different buffers, so Mosaic may
schedule them concurrently. v's index map lags k's by one block.

Timing-only experiment; correctness asserted vs the production kernel.
"""

import functools
import math
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_LOG2E = math.log2(math.e)


def _kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, s0_ref, s1_ref,
            *, n_k):
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    def consume(s_buf):
        s = s_buf[:]
        m_prev = m_ref[:, :1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp2(s - m_new)
        alpha = jnp.exp2(m_prev - m_new)
        l_ref[:] = jnp.broadcast_to(
            alpha * l_ref[:, :1] + jnp.sum(p, axis=-1, keepdims=True),
            l_ref.shape,
        )
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        pv = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[:] = acc_ref[:] * alpha + pv

    def produce(s_buf):
        s_buf[:] = jax.lax.dot_general(
            q_ref[0], k_ref[0],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    even = ik % 2 == 0

    @pl.when((ik > 0) & even)
    def _c_odd():  # previous block was odd-parity
        consume(s1_ref)

    @pl.when((ik > 0) & jnp.logical_not(even))
    def _c_even():
        consume(s0_ref)

    @pl.when((ik < n_k) & even)
    def _p_even():
        produce(s0_ref)

    @pl.when((ik < n_k) & jnp.logical_not(even))
    def _p_odd():
        produce(s1_ref)

    @pl.when(ik == n_k)
    def _finish():
        o_ref[0] = (acc_ref[:] / l_ref[:, :1]).astype(v_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bq", "bk"))
def flash_pipelined(q, k, v, bq=512, bk=2048):
    b, h, tq, d = q.shape
    tk = k.shape[2]
    bq = min(bq, tq)
    bk = min(bk, tk)
    n_k = tk // bk
    q = (q.astype(jnp.float32) * (d**-0.5 * _LOG2E)).astype(q.dtype)
    qf = q.reshape(b * h, tq, d)
    kf = k.reshape(b * h, tk, d)
    vf = v.reshape(b * h, tk, d)
    return pl.pallas_call(
        functools.partial(_kernel, n_k=n_k),
        grid=(b * h, tq // bq, n_k + 1),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda ibh, iq, ik: (ibh, iq, 0)),
            # QK at step ik uses k block ik (clamped at the final step)
            pl.BlockSpec((1, bk, d),
                         lambda ibh, iq, ik: (ibh, jnp.minimum(ik, pl.num_programs(2) - 2), 0)),
            # PV at step ik uses v block ik-1 (clamped at step 0)
            pl.BlockSpec((1, bk, d),
                         lambda ibh, iq, ik: (ibh, jnp.maximum(ik - 1, 0), 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda ibh, iq, ik: (ibh, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, tq, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, _LANES), jnp.float32),
            pltpu.VMEM((bq, _LANES), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
            pltpu.VMEM((bq, bk), jnp.float32),  # s ping
            pltpu.VMEM((bq, bk), jnp.float32),  # s pong
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * tq * tk * d,
            bytes_accessed=(tq * d * 2 + 2 * tk * d) * b * h * q.dtype.itemsize,
            transcendentals=b * h * tq * tk,
        ),
    )(qf, kf, vf).reshape(b, h, tq, d)


def chained_time(f, shape, n_chain=10, iters=10):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], shape, jnp.bfloat16)
    k = jax.random.normal(ks[1], shape, jnp.bfloat16)
    v = jax.random.normal(ks[2], shape, jnp.bfloat16)

    @jax.jit
    def chain(q, k, v):
        out = q
        for _ in range(n_chain):
            out = f(out, k, v) + 1e-3
        return jnp.sum(out.astype(jnp.float32))

    _ = float(chain(q, k, v))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = chain(q, k, v)
    _ = float(r)
    return (time.perf_counter() - t0) / iters / n_chain


def main():
    from sdxl_tpu.ops.flash_attention import flash_attention_bhtd

    for name, shape, blocks in [
        ("T4096 h10", (2, 10, 4096, 64), [(512, 2048), (512, 1024),
                                          (1024, 1024), (256, 2048)]),
        ("T1024 h20", (2, 20, 1024, 64), [(1024, 512), (1024, 256),
                                          (512, 512)]),
    ]:
        base = chained_time(flash_attention_bhtd, shape)
        print(f"{name}: production {base*1e6:7.0f}us/call", flush=True)
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(ks[0], shape, jnp.bfloat16)
        k = jax.random.normal(ks[1], shape, jnp.bfloat16)
        v = jax.random.normal(ks[2], shape, jnp.bfloat16)
        ref = flash_attention_bhtd(q, k, v).astype(jnp.float32)
        for bq, bk in blocks:
            try:
                f = functools.partial(flash_pipelined, bq=bq, bk=bk)
                err = float(jnp.max(jnp.abs(f(q, k, v).astype(jnp.float32) - ref)))
                dt = chained_time(f, shape)
                print(f"  pipelined bq={bq} bk={bk}: {dt*1e6:7.0f}us/call "
                      f"(err {err:.1e})", flush=True)
            except Exception as e:
                print(f"  pipelined bq={bq} bk={bk}: ERR {type(e).__name__}: "
                      f"{str(e)[:90]}", flush=True)


if __name__ == "__main__":
    main()
