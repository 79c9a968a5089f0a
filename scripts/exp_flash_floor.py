"""Measure the flash kernel's MXU floor vs VPU-softmax cost in-program.

Chains N dependent kernel calls inside one jit so each call is timed the
way the UNet program runs it (no dispatch overhead, warm VMEM pipelines).
Variants strip parts of the online softmax to attribute time:

  full      — the production kernel
  noexp     — exp2 replaced by a linear shift (VPU mul instead of exp)
  mxu_only  — p = s cast to bf16, no max/l tracking (QK + PV only)
  qscaled   — scale folded into q outside the kernel (one fewer VPU pass)

Numerically wrong outputs (except full/qscaled) — timing only.
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


def make_kernel(mode):
    def kern(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *, scale, n_k):
        ik = pl.program_id(2)

        @pl.when(ik == 0)
        def _init():
            m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
            l_ref[:] = jnp.zeros_like(l_ref)
            acc_ref[:] = jnp.zeros_like(acc_ref)

        q, k, v = q_ref[0], k_ref[0], v_ref[0]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if mode != "qscaled":
            s = s * scale

        if mode == "mxu_only":
            pv = jax.lax.dot_general(
                s.astype(v.dtype), v,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_ref[:] = acc_ref[:] + pv

            @pl.when(ik == n_k - 1)
            def _fin0():
                o_ref[0] = (acc_ref[:] * (1.0 / 4096.0)).astype(v.dtype)
            return

        m_prev = m_ref[:, :1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        if mode == "noexp":
            p = (s - m_new) * 0.01 + 0.5
            alpha = (m_prev - m_new) * 0.01 + 0.5
        else:
            p = jnp.exp2(s - m_new)
            alpha = jnp.exp2(m_prev - m_new)
        l_ref[:] = jnp.broadcast_to(
            alpha * l_ref[:, :1] + jnp.sum(p, axis=-1, keepdims=True),
            l_ref.shape,
        )
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[:] = acc_ref[:] * alpha + pv

        @pl.when(ik == n_k - 1)
        def _fin():
            o_ref[0] = (acc_ref[:] / l_ref[:, :1]).astype(v.dtype)

    return kern


@functools.partial(jax.jit, static_argnames=("mode", "bq", "bk"))
def attn(q, k, v, mode="full", bq=1024, bk=1024):
    b, h, tq, d = q.shape
    tk = k.shape[2]
    bq = min(bq, tq)
    bk = min(bk, tk)
    n_k = tk // bk
    scale = d**-0.5 * _LOG2E
    if mode == "qscaled":
        q = (q.astype(jnp.float32) * scale).astype(q.dtype)
    qf = q.reshape(b * h, tq, d)
    kf = k.reshape(b * h, tk, d)
    vf = v.reshape(b * h, tk, d)
    return pl.pallas_call(
        functools.partial(make_kernel(mode), scale=scale, n_k=n_k),
        grid=(b * h, tq // bq, n_k),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda ibh, iq, ik: (ibh, iq, 0)),
            pl.BlockSpec((1, bk, d), lambda ibh, iq, ik: (ibh, ik, 0)),
            pl.BlockSpec((1, bk, d), lambda ibh, iq, ik: (ibh, ik, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda ibh, iq, ik: (ibh, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, tq, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, _LANES), jnp.float32),
            pltpu.VMEM((bq, _LANES), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
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


def chained_time(shape, mode, bq, bk, n_chain=10, iters=10):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], shape, jnp.bfloat16)
    k = jax.random.normal(ks[1], shape, jnp.bfloat16)
    v = jax.random.normal(ks[2], shape, jnp.bfloat16)

    @jax.jit
    def chain(q, k, v):
        out = q
        for _ in range(n_chain):
            out = attn(out, k, v, mode=mode, bq=bq, bk=bk)
            out = out + 1e-3  # keep values bounded, force dependency
        return jnp.sum(out.astype(jnp.float32))

    _ = float(chain(q, k, v))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = chain(q, k, v)
    _ = float(r)
    per_call = (time.perf_counter() - t0) / iters / n_chain
    return per_call


def main():
    for name, shape in [("T4096 h10", (2, 10, 4096, 64)),
                        ("T1024 h20", (2, 20, 1024, 64))]:
        t = shape[2]
        for mode in ("full", "qscaled", "noexp", "mxu_only"):
            for bq, bk in ((512, 2048), (1024, 1024)) if t == 4096 else ((1024, 1024),):
                try:
                    dt = chained_time(shape, mode, bq, bk)
                    print(f"{name} {mode:9s} bq={bq} bk={bk}: {dt*1e6:7.0f}us/call",
                          flush=True)
                except Exception as e:
                    print(f"{name} {mode:9s} bq={bq} bk={bk}: ERR "
                          f"{type(e).__name__}: {str(e)[:70]}", flush=True)


if __name__ == "__main__":
    main()
