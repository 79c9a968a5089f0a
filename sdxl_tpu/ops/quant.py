"""Weight-only quantization for the big transformer linears.

Capability extension beyond the reference (which stores f16 weights,
convert/main.rs:69, and computes in f16): int8 per-output-channel and
packed-int4 group-wise quantized storage for linear weights, dequantized
on the fly INSIDE the jitted sampling loop. The point is HBM residency,
not speed: FLUX.1's 12B-parameter transformer is 23.8 GB in bf16 — too
big for one 16 GB v5e chip — but 11.9 GB at int8 and ~6 GB at int4,
turning a tp>=2 deployment into a single-chip one.

TPU notes (verified on the optimized HLO, tests/test_quant.py):
  - the dequant (convert s8->bf16, multiply by scale) is emitted inside
    the lax.scan's while body and FUSED into the consuming matmul as a
    kOutput fusion — XLA does NOT hoist it out of the loop, so the only
    HBM-resident copy of a quantized weight is the int8 one, carried
    through the while tuple;
  - reading s8 instead of bf16 also halves the weight-streaming
    bandwidth of memory-bound matmuls (the per-image modulation matvecs);
    for the compute-bound 4608-token attention/MLP matmuls the dequant
    is amortized noise;
  - packed int4 stores two signed nibbles per uint8 along the INPUT
    (contracting) axis; the shift/mask unpack is elementwise and fuses
    exactly like the int8 convert.

Quantization math:
  int8: symmetric per-output-channel. scale[o] = max|w[:, o]| / 127,
        qw = round(w / scale) in [-127, 127].
  int4: symmetric per-(group, output-channel), group_size input rows per
        group (default 64). scale[g, o] = max|w[g, :, o]| / 7,
        qw in [-8, 7], packed pairs (even row -> low nibble).

Scales are stored f32; dequant computes q * scale in f32 and casts to
the activation dtype, so a weight that is exactly representable
(w == q * scale) round-trips bit-exactly through the quantized path.
"""

from __future__ import annotations

from typing import Union

import jax.numpy as jnp
import numpy as np

INT4_GROUP = 64  # default input-rows per int4 scale group


def _is_np(x) -> bool:
    return isinstance(x, np.ndarray)


# ---------------------------------------------------------------------------
# quantize (host numpy or on-device jax, dispatched on input type)
# ---------------------------------------------------------------------------


def quantize_int8(w: Union[np.ndarray, jnp.ndarray]) -> dict:
    """[d_in, d_out] float -> {"qw": int8 [d_in, d_out], "qs": f32 [d_out]}."""
    xp = np if _is_np(w) else jnp
    wf = w.astype(xp.float32)
    s = xp.max(xp.abs(wf), axis=0) / 127.0
    s = xp.where(s == 0, xp.float32(1.0), s)
    q = xp.clip(xp.rint(wf / s), -127, 127).astype(xp.int8)
    return {"qw": q, "qs": s.astype(xp.float32)}


def quantize_int4(w: Union[np.ndarray, jnp.ndarray],
                  group: int = INT4_GROUP) -> dict:
    """[d_in, d_out] float -> {"qw4": uint8 [d_in/2, d_out],
    "qs": f32 [d_in/group, d_out]} (packed signed nibbles, group-wise
    scales along the input axis).

    Nibble pairing: byte i packs rows (i, i + d_in/2) — low nibble the
    FIRST-half row, high nibble the second-half row — so the traced
    dequant is two fused elementwise maps and ONE contiguous concat
    (no per-element interleave: 671 vs 925 ms/step on the full FLUX.1
    scan — 1.38x faster than the adjacent-row pairing on TPU, within
    13% of int8). Group scales still cover g
    consecutive ORIGINAL rows; g must divide d_in/2 so groups do not
    straddle the half boundary."""
    xp = np if _is_np(w) else jnp
    d_in, d_out = w.shape
    if d_in % 2 or (d_in // 2) % group:
        raise ValueError(f"int4 needs even d_in with group | d_in/2, "
                         f"got {w.shape} (group {group})")
    wf = w.astype(xp.float32).reshape(d_in // group, group, d_out)
    s = xp.max(xp.abs(wf), axis=1) / 7.0
    s = xp.where(s == 0, xp.float32(1.0), s)
    q = xp.clip(xp.rint(wf / s[:, None, :]), -8, 7)
    q = q.astype(xp.int32).reshape(d_in, d_out)
    qu = (q & 0xF).astype(xp.uint8)
    half = d_in // 2
    packed = (qu[half:] << 4) | qu[:half]
    return {"qw4": packed, "qs": s.astype(xp.float32)}


def quantize_weight(w, bits: int, group: int = INT4_GROUP) -> dict:
    if bits == 8:
        return quantize_int8(w)
    if bits == 4:
        return quantize_int4(w, group)
    raise ValueError(f"bits must be 4 or 8, got {bits}")


# ---------------------------------------------------------------------------
# dequantize (traced; fuses into the consuming matmul)
# ---------------------------------------------------------------------------


def _dequant_int8(p: dict, dtype) -> jnp.ndarray:
    return (p["qw"].astype(jnp.float32) * p["qs"]).astype(dtype)


def _dequant_int4(p: dict, dtype) -> jnp.ndarray:
    packed = p["qw4"]                       # uint8 [d_in/2, d_out]
    qs = p["qs"]                            # f32 [d_in/group, d_out]
    d_out = packed.shape[-1]
    half = packed.shape[0]
    n_groups = qs.shape[0]
    group = 2 * half // n_groups
    qs_lo, qs_hi = qs[: n_groups // 2], qs[n_groups // 2:]

    def nibble(v, scales):
        v = v.astype(jnp.int8)
        v = v - ((v >> 3) << 4)             # sign-extend
        w = (v.reshape(n_groups // 2, group, d_out).astype(jnp.float32)
             * scales[:, None])
        return w.reshape(half, d_out).astype(dtype)

    # byte i packs original rows (i, i + d_in/2): one contiguous concat
    return jnp.concatenate(
        [nibble(packed & 0xF, qs_lo), nibble(packed >> 4, qs_hi)], axis=0)


def is_quantized(p) -> bool:
    return isinstance(p, dict) and ("qw" in p or "qw4" in p)


def dequant_weight(p: dict, dtype=jnp.bfloat16) -> jnp.ndarray:
    """Quantized linear param dict -> [d_in, d_out] weight in `dtype`."""
    if "qw" in p:
        return _dequant_int8(p, dtype)
    if "qw4" in p:
        return _dequant_int4(p, dtype)
    raise KeyError(f"not a quantized param dict (keys {list(p)})")
