"""Pallas TPU flash attention for the UNet's spatial self-attention.

The XLA attention path materializes the [B,H,T,T] logits in HBM (f32
softmax over 4096x4096 at level 1 costs ~3 GB of HBM round-trips per
SpatialTransformer). This kernel keeps the running softmax in VMEM
(online-softmax/flash algorithm): per (batch*head, q-block) it streams
k/v blocks, maintaining the running max m, normalizer l and the f32
accumulator, and writes each output tile exactly once.

Targets the SDXL shapes: T in {1024, 4096} (32x32 / 64x64 latents),
head_dim 64, bf16 in/out with f32 accumulation — numerically matching the
reference attention semantics (backend.rs:88-128 up to f32 softmax).

Grid: (B*H, T/BQ, T/BK), the k dimension innermost — TPU grid steps run
sequentially per core so the VMEM scratch carries across k blocks.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
# The softmax runs in base 2: folding log2(e) into the logit scale turns
# every exp(x) into exp2(x'), dropping one VPU multiply per [BQ, BK]
# element. Identical softmax: exp(s - m) == exp2(s*log2e - m*log2e) with
# the max tracked in base-2 units. Measured (scripts/exp_flash_exp2.py /
# exp_flash_floor.py, v5e): dispatch-level microbench improves (-23% at
# T=1024), but inside the compiled UNet step the per-call time is
# MXU/pipeline-bound and unchanged (1.36 ms at T=4096) — kept because it
# is strictly fewer VPU ops and simplifies further softmax-cost work.
_LOG2E = math.log2(math.e)


def _flash_kernel_core(q, k, v, write_out, m_ref, l_ref, acc_ref, *, scale,
                       n_k, block_k=0, n_valid=0):
    """Online-softmax inner body shared by both entry layouts.

    q (BQ, D), k/v (BK, D); write_out(value) stores the final (BQ, D) tile.
    n_valid > 0 marks a right-padded kv (short cross-attention contexts
    padded up to the 128-lane tile): key columns >= n_valid are masked to
    -inf before the max/exp so they contribute nothing.
    """
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    s = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BQ, BK) f32, logits in base-2 units
    if scale != 1.0:  # scale is usually folded into q by the caller
        s = s * scale
    if n_valid:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ik * block_k
        s = jnp.where(col < n_valid, s, -jnp.inf)

    m_prev = m_ref[:, :1]  # (BQ, 1), lanes replicated
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)

    p = jnp.exp2(s - m_new)  # (BQ, BK)
    alpha = jnp.exp2(m_prev - m_new)  # (BQ, 1)

    l_ref[:] = jnp.broadcast_to(
        alpha * l_ref[:, :1] + jnp.sum(p, axis=-1, keepdims=True), l_ref.shape
    )
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)

    pv = jax.lax.dot_general(
        p.astype(v.dtype), v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BQ, D) f32
    acc_ref[:] = acc_ref[:] * alpha + pv

    @pl.when(ik == n_k - 1)
    def _finish():
        write_out((acc_ref[:] / l_ref[:, :1]).astype(v.dtype))


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *,
                  scale, n_k, block_k=0, n_valid=0):
    _flash_kernel_core(
        q_ref[0], k_ref[0], v_ref[0],
        lambda val: o_ref.__setitem__(0, val),
        m_ref, l_ref, acc_ref, scale=scale, n_k=n_k,
        block_k=block_k, n_valid=n_valid,
    )


def _flash_kernel_lse(q_ref, k_ref, v_ref, o_ref, lse_ref, m_ref, l_ref,
                      acc_ref, *, scale, n_k, block_k=0, n_valid=0):
    """Forward variant that ALSO writes the base-2 log-sum-exp per query
    row (lse = m + log2(l), in the same base-2 units the folded-q logits
    use) — the residual the flash backward recomputes p from. Stored
    lane-replicated (BQ, 128) because Mosaic requires output tiles whose
    trailing dim is a lane multiple; the wrapper slices lane 0."""
    _flash_kernel_core(
        q_ref[0], k_ref[0], v_ref[0],
        lambda val: o_ref.__setitem__(0, val),
        m_ref, l_ref, acc_ref, scale=scale, n_k=n_k,
        block_k=block_k, n_valid=n_valid,
    )

    @pl.when(pl.program_id(2) == n_k - 1)
    def _write_lse():
        lse_ref[0] = m_ref[:] + jnp.log2(l_ref[:])  # (BQ, LANES)


def _default_blocks(tq: int, tk: int, d: int):
    """Tuned on v5e (scripts/exp_flash_exp2.py sweep, r2): with the exp2
    softmax, (1024, 1024) wins at T=1024 (756us vs 976us before) and
    (512, 2048) at T=4096 (1952us; bk=4096 is marginally faster at 1890us
    but leaves no VMEM headroom inside the full UNet program). Shrink for
    wide heads (VAE d=512) to stay inside VMEM."""
    if d > 128:
        return 256, 512
    if tk >= 4096:
        return 512, 2048
    return 1024, 1024


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


@functools.partial(jax.jit,
                   static_argnames=("block_q", "block_k", "return_lse"))
def flash_attention_bhtd(
    q: jnp.ndarray,  # [B, H, Tq, D]
    k: jnp.ndarray,  # [B, H, Tk, D]
    v: jnp.ndarray,  # [B, H, Tk, D]
    block_q: int = 0,
    block_k: int = 0,
    return_lse: bool = False,
) -> jnp.ndarray:
    """Unmasked flash attention over [B, H, T, D]; softmax scale 1/sqrt(D).

    Ragged token counts are handled on both sides, so every SDXL aspect
    bucket (stablediffusion/mod.rs:583-624; level-1 self-attention runs at
    e.g. 52x76 = 3952 tokens for 832x1216) hits the kernel:
    - kv shorter than a block multiple (incl. the 77-token text context)
      is zero-padded and masked inside the kernel via ``n_valid`` — the
      [Tq, Tk] logits never round-trip HBM, unlike the XLA path which
      materializes ~62 MB of f32 logits per non-square L1 self-attention.
    - q is zero-padded up to a block_q multiple; the padded rows attend
      only to valid kv (finite softmax, no NaNs) and are sliced off the
      output. Padding overhead is < 1 block (< 3.7% FLOPs at T=3952).
    """
    b, h, tq, d = q.shape
    tq_orig, tk_orig = tq, k.shape[2]
    tk = tk_orig
    dbq, dbk = _default_blocks(tq, _round_up(tk, _LANES), d)
    # sublane alignment: bf16 tiles want block_q % 16 == 0
    block_q = min(block_q or dbq, _round_up(tq, 16))
    block_k = min(block_k or dbk, _round_up(tk, _LANES))
    if tq % block_q != 0:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, -tq % block_q), (0, 0)))
        tq = q.shape[2]
    n_valid = 0
    if tk % block_k != 0:
        pad = -tk % block_k
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
        n_valid, tk = tk, tk + pad
    assert tq % block_q == 0 and tk % block_k == 0, (tq, tk, block_q, block_k)
    n_k = tk // block_k
    # base-2 softmax scale (see _LOG2E above), folded into q ahead of the
    # kernel: one [B,H,T,D] pass replaces a [BQ,BK] pass per k-iteration
    # (measured -124us/call at T=4096 in the chained in-program bench,
    # scripts/exp_flash_floor.py "qscaled"). bf16 rounding of the scaled q
    # matches the reference's own pre-scaled-q semantics (backend.rs:98
    # scales q and k each by (d/h)^-0.25 before the matmul).
    q = (q.astype(jnp.float32) * (d ** -0.5 * _LOG2E)).astype(q.dtype)
    scale = 1.0

    qf = q.reshape(b * h, tq, d)
    kf = k.reshape(b * h, tk, d)
    vf = v.reshape(b * h, tk, d)

    grid = (b * h, tq // block_q, n_k)

    # CPU (tests / dryrun): no Mosaic backend — run the kernel interpreted
    interpret = jax.default_backend() == "cpu"

    kernel = _flash_kernel_lse if return_lse else _flash_kernel
    out_specs = pl.BlockSpec((1, block_q, d), lambda ibh, iq, ik: (ibh, iq, 0))
    out_shape = jax.ShapeDtypeStruct((b * h, tq, d), q.dtype)
    if return_lse:
        out_specs = [out_specs,
                     pl.BlockSpec((1, block_q, _LANES),
                                  lambda ibh, iq, ik: (ibh, iq, 0))]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((b * h, tq, _LANES), jnp.float32)]

    out = pl.pallas_call(
        functools.partial(kernel, scale=scale, n_k=n_k,
                          block_k=block_k, n_valid=n_valid),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda ibh, iq, ik: (ibh, iq, 0)),
            pl.BlockSpec((1, block_k, d), lambda ibh, iq, ik: (ibh, ik, 0)),
            pl.BlockSpec((1, block_k, d), lambda ibh, iq, ik: (ibh, ik, 0)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((block_q, _LANES), jnp.float32),  # running max
            pltpu.VMEM((block_q, _LANES), jnp.float32),  # running normalizer
            pltpu.VMEM((block_q, d), jnp.float32),       # output accumulator
        ],
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(
            # bh and q-block grid axes are independent; only the k axis
            # carries state through the scratch accumulators
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * tq * tk * d,
            bytes_accessed=(tq * d * 2 + 2 * tk * d) * b * h * q.dtype.itemsize,
            transcendentals=b * h * tq * tk,
        ),
        interpret=interpret,
    )(qf, kf, vf)

    if return_lse:
        out, lse = out
        lse = lse[:, :, 0]  # drop the lane replication
        if tq != tq_orig:
            out, lse = out[:, :tq_orig], lse[:, :tq_orig]
        return (out.reshape(b, h, tq_orig, d),
                lse.reshape(b, h, tq_orig))
    if tq != tq_orig:
        out = out[:, :tq_orig]
    return out.reshape(b, h, tq_orig, d)


# ---------------------------------------------------------------------------
# backward kernels (FlashAttention-2 backward, arXiv:2307.08691 §3.1)
#
# Residuals from the forward: O and the base-2 row log-sum-exp
# lse = m + log2(l). With z = q·kᵀ/sqrt(d) (natural logits) and
# p = softmax(z):
#     delta_i = dO_i · O_i          (row sum, precomputed in XLA)
#     dp_ij   = dO_i · v_j
#     dz_ij   = p_ij (dp_ij - delta_i)
#     dq_i    = Σ_j dz_ij k_j / sqrt(d)
#     dk_j    = Σ_i dz_ij q_i / sqrt(d)
#     dv_j    = Σ_i p_ij dO_i
# p is recomputed blockwise as exp2(qf·kᵀ - lse) with the same folded
# qf = q * (d^-0.5 * log2e) the forward used, so forward and backward see
# bit-identical logits. Two kernels: dq accumulates over k blocks
# (k innermost), dk/dv accumulate over q blocks (q innermost) — each
# output tile is written exactly once and the [Tq,Tk] weights never
# touch HBM (the XLA backward materializes them; at SDXL level 1 that is
# a 4096x4096 f32 per (batch, head) per attention site).
# ---------------------------------------------------------------------------


def _flash_bwd_dq_kernel(qf_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                         dq_ref, dq_acc, *, nat_scale, n_k, block_k,
                         n_valid):
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _init():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    qf, k, v, do = qf_ref[0], k_ref[0], v_ref[0], do_ref[0]
    s2 = jax.lax.dot_general(
        qf, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # (BQ, BK) base-2 logits
    if n_valid:
        col = jax.lax.broadcasted_iota(jnp.int32, s2.shape, 1) + ik * block_k
        s2 = jnp.where(col < n_valid, s2, -jnp.inf)
    p = jnp.exp2(s2 - lse_ref[0, :, :1])                 # (BQ, BK)
    dp = jax.lax.dot_general(
        do, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # (BQ, BK)
    dz = p * (dp - delta_ref[0, :, :1])
    dq_acc[:] += jax.lax.dot_general(
        dz.astype(k.dtype), k, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * nat_scale

    @pl.when(ik == n_k - 1)
    def _finish():
        dq_ref[0] = dq_acc[:].astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(qf_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                          dk_ref, dv_ref, dk_acc, dv_acc, *, n_q,
                          block_k, n_valid):
    iq = pl.program_id(2)

    @pl.when(iq == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    qf, k, v, do = qf_ref[0], k_ref[0], v_ref[0], do_ref[0]
    s2 = jax.lax.dot_general(
        qf, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # (BQ, BK)
    if n_valid:
        ikb = pl.program_id(1)
        col = jax.lax.broadcasted_iota(jnp.int32, s2.shape, 1) + ikb * block_k
        s2 = jnp.where(col < n_valid, s2, -jnp.inf)
    p = jnp.exp2(s2 - lse_ref[0, :, :1])
    # dv_j = Σ_i p_ij dO_i  — contract the q axis
    dv_acc[:] += jax.lax.dot_general(
        p.astype(do.dtype), do, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(
        do, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dz = p * (dp - delta_ref[0, :, :1])
    # dk_j = Σ_i dz_ij q_i / sqrt(d); qf carries scale*log2e, so divide
    # the fold back out: q * scale == qf / log2e
    dk_acc[:] += jax.lax.dot_general(
        dz.astype(qf.dtype), qf, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * (1.0 / _LOG2E)

    @pl.when(iq == n_q - 1)
    def _finish():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k"))
def flash_attention_bwd_bhtd(
    q: jnp.ndarray,    # [B, H, Tq, D]
    k: jnp.ndarray,    # [B, H, Tk, D]
    v: jnp.ndarray,    # [B, H, Tk, D]
    o: jnp.ndarray,    # [B, H, Tq, D]  forward output
    lse: jnp.ndarray,  # [B, H, Tq]     forward base-2 row log-sum-exp
    do: jnp.ndarray,   # [B, H, Tq, D]  output cotangent
    block_q: int = 0,
    block_k: int = 0,
):
    """(dq, dk, dv) for unmasked flash attention; same ragged-token
    handling as the forward (padded q rows carry zero dO; padded kv
    columns are masked to p == 0, so their dk/dv rows come out zero and
    are sliced off)."""
    b, h, tq, d = q.shape
    tq_orig, tk_orig = tq, k.shape[2]
    tk = tk_orig
    dbq, dbk = _default_blocks(tq, _round_up(tk, _LANES), d)
    block_q = min(block_q or dbq, _round_up(tq, 16))
    block_k = min(block_k or dbk, _round_up(tk, _LANES))

    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), -1)
    if tq % block_q != 0:
        pad = -tq % block_q
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
        do = jnp.pad(do, ((0, 0), (0, 0), (0, pad), (0, 0)))
        # padded q rows: dO = 0 kills their dkv/dz contribution; keep lse
        # finite (0) so exp2 stays well-defined
        lse = jnp.pad(lse, ((0, 0), (0, 0), (0, pad)))
        delta = jnp.pad(delta, ((0, 0), (0, 0), (0, pad)))
        tq += pad
    n_valid = 0
    if tk % block_k != 0:
        pad = -tk % block_k
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
        n_valid, tk = tk, tk + pad
    n_q, n_k = tq // block_q, tk // block_k
    nat_scale = d ** -0.5
    qf = (q.astype(jnp.float32) * (nat_scale * _LOG2E)).astype(q.dtype)

    qf_ = qf.reshape(b * h, tq, d)
    k_ = k.reshape(b * h, tk, d)
    v_ = v.reshape(b * h, tk, d)
    do_ = do.reshape(b * h, tq, d).astype(q.dtype)
    # lane-replicate the row vectors: Mosaic wants tiles whose trailing
    # dim is a lane multiple (same layout the forward's lse output uses)
    lse_ = jnp.broadcast_to(
        lse.reshape(b * h, tq)[:, :, None], (b * h, tq, _LANES))
    delta_ = jnp.broadcast_to(
        delta.reshape(b * h, tq)[:, :, None], (b * h, tq, _LANES))

    interpret = jax.default_backend() == "cpu"
    params = (None if interpret else pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "arbitrary")))

    qspec = pl.BlockSpec((1, block_q, d), lambda ibh, iq, ik: (ibh, iq, 0))
    kspec = pl.BlockSpec((1, block_k, d), lambda ibh, iq, ik: (ibh, ik, 0))
    rowq = pl.BlockSpec((1, block_q, _LANES), lambda ibh, iq, ik: (ibh, iq, 0))

    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, nat_scale=nat_scale,
                          n_k=n_k, block_k=block_k, n_valid=n_valid),
        grid=(b * h, n_q, n_k),
        in_specs=[qspec, kspec, kspec, qspec, rowq, rowq],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct((b * h, tq, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=params,
        cost_estimate=pl.CostEstimate(
            flops=6 * b * h * tq * tk * d,
            bytes_accessed=(2 * tq * d * 2 + 2 * tk * d) * b * h
            * q.dtype.itemsize,
            transcendentals=b * h * tq * tk,
        ),
        interpret=interpret,
    )(qf_, k_, v_, do_, lse_, delta_)

    # dk/dv: swap the roles — k blocks are the parallel axis, q innermost
    qspec2 = pl.BlockSpec((1, block_q, d), lambda ibh, ik, iq: (ibh, iq, 0))
    kspec2 = pl.BlockSpec((1, block_k, d), lambda ibh, ik, iq: (ibh, ik, 0))
    rowq2 = pl.BlockSpec((1, block_q, _LANES),
                         lambda ibh, ik, iq: (ibh, iq, 0))

    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, n_q=n_q,
                          block_k=block_k, n_valid=n_valid),
        grid=(b * h, n_k, n_q),
        in_specs=[qspec2, kspec2, kspec2, qspec2, rowq2, rowq2],
        out_specs=[kspec2, kspec2],
        out_shape=[jax.ShapeDtypeStruct((b * h, tk, d), k.dtype),
                   jax.ShapeDtypeStruct((b * h, tk, d), v.dtype)],
        scratch_shapes=[pltpu.VMEM((block_k, d), jnp.float32),
                        pltpu.VMEM((block_k, d), jnp.float32)],
        compiler_params=params,
        cost_estimate=pl.CostEstimate(
            flops=8 * b * h * tq * tk * d,
            bytes_accessed=(2 * tq * d * 2 + 3 * tk * d) * b * h
            * q.dtype.itemsize,
            transcendentals=b * h * tq * tk,
        ),
        interpret=interpret,
    )(qf_, k_, v_, do_, lse_, delta_)

    dq = dq[:, :tq_orig].reshape(b, h, tq_orig, d)
    dk = dk[:, :tk_orig].reshape(b, h, tk_orig, d)
    dv = dv[:, :tk_orig].reshape(b, h, tk_orig, d)
    return dq, dk, dv


import os

# A/B escape hatch (scripts/bench_unet_ablation.py): 1 routes everything to
# the XLA attention path.
FLASH_DISABLED = os.environ.get("SDXL_TPU_DISABLE_FLASH", "0") == "1"

# Minimum self-attention token count routed to the kernel; 924 covers the
# smallest level-2 bucket (scripts/bench_flash_ragged.py + in-program
# A/B via scripts/bench_nonsquare.py back the default).
FLASH_MIN_T = int(os.environ.get("SDXL_TPU_FLASH_MIN_T", "924"))


def use_flash(tq: int, tk: int, d: int, has_mask: bool) -> bool:
    """Flash pays off for the long spatial self-attentions (UNet levels 1-2
    and the VAE mid-attention at ~16k tokens). Ragged token counts are
    fine (padded q + masked kv in-kernel), so ALL 40 SDXL aspect buckets
    route here: level-1 self-attention runs at 3696..4096 tokens and
    level-2 at 924..1024 across the bucket table
    (stablediffusion/mod.rs:583-624); 924 is the smallest level-2 count
    (704x1344 -> 22x42). Short-kv cross-attention
    stays on XLA: the kernel supports padded 77-token kv (n_valid masking,
    tested in interpret mode), but routing it was measured SLOWER in the
    UNet step (128.2 vs 120.7 ms/step on v5e) — 128-column k-blocks leave
    the grid overhead-dominated while XLA's fused short-kv path is already
    good. Masked CLIP attention (77 query tokens) stays on XLA too."""
    return (
        not FLASH_DISABLED
        and not has_mask
        and tq == tk
        and tq >= FLASH_MIN_T
        and (d in (64, 128) or (tq >= 3696 and d <= 512 and d % 128 == 0))
    )
