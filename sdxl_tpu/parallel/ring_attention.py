"""Ring (context-parallel) flash attention over a mesh axis.

Capability extension beyond the reference's single-GPU design (SURVEY.md
§5 records sequence parallelism as absent there; at the trained SDXL
buckets it is also unnecessary — level-1 self-attention tops out at 4096
tokens, comfortably single-chip). This module is the scale-OUT path for
the lengths the extensions reach: >=2048px hires latents (16k-65k spatial
tokens at UNet level 1 / the VAE mid-attention), where even flash
attention's O(T) activations and the q/k/v tensors themselves outgrow a
single chip's HBM.

TPU-native design (the scaling-book ring pattern):

  - the TOKEN axis of q/k/v is sharded over a mesh axis; each of the n
    devices holds a [B, H, T/n, D] shard of all three.
  - n ring steps: each step runs the LOCAL Pallas flash kernel
    (ops/flash_attention.py, return_lse=True) on the resident q shard
    against the currently-held k/v shard, then rotates k/v one hop around
    the ring with ``lax.ppermute`` — each step moves only 2·B·H·(T/n)·D
    elements over ICI and overlaps with the next local kernel under
    XLA's async collectives.
  - partial outputs combine with the numerically-stable log-sum-exp
    merge: the kernel's base-2 row lse (m + log2(l), in the same
    folded-q units its logits use) weights each partial exactly; the
    result is bit-close to single-device softmax over the full T
    (tests/test_ring_attention.py asserts allclose against both the
    single-call kernel and reference XLA attention).

No [T, T] logits exist anywhere, no device ever materializes the full
sequence, and the only collective is the ppermute rotation. Forward-only
by design: inference is this framework's serving surface (training runs
single-chip flash with its fused backward; ring-backward would add a
second rotation pass — out of scope until a >16k-token training need
exists).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops.flash_attention import flash_attention_bhtd
from .mesh import MODEL_AXIS


def lse_merge(o: jnp.ndarray, lse: jnp.ndarray,
              o_i: jnp.ndarray, lse_i: jnp.ndarray):
    """Combine two softmax partials over disjoint key sets.

    o / o_i: [..., T, D] partial attention outputs, each already
    normalized by its OWN partial denominator; lse / lse_i: [..., T]
    base-2 log-sum-exp of the partial logits. Returns the combined
    (o, lse) — the exact softmax over the union of the key sets:
        w   = 2^(lse - m),  w_i = 2^(lse_i - m),  m = max(lse, lse_i)
        out = (w·o + w_i·o_i) / (w + w_i)
    """
    m = jnp.maximum(lse, lse_i)
    w = jnp.exp2(lse - m)
    w_i = jnp.exp2(lse_i - m)
    denom = w + w_i
    out = (o.astype(jnp.float32) * (w / denom)[..., None]
           + o_i.astype(jnp.float32) * (w_i / denom)[..., None])
    return out.astype(o.dtype), m + jnp.log2(denom)


def ring_attention_local(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                         axis_name: str) -> jnp.ndarray:
    """Per-shard ring attention body — call INSIDE shard_map/pjit with
    q, k, v: [B, H, T_local, D] token shards of the same global sequence.
    Returns the [B, H, T_local, D] output shard (exact full-sequence
    softmax attention, scale 1/sqrt(D))."""
    n = lax.axis_size(axis_name)
    o, lse = flash_attention_bhtd(q, k, v, return_lse=True)
    if n == 1:
        return o
    # rotate k/v so each device sees every shard exactly once
    perm = [(i, (i + 1) % n) for i in range(n)]

    def body(i, carry):
        o, lse, k_cur, v_cur = carry
        k_cur = lax.ppermute(k_cur, axis_name, perm)
        v_cur = lax.ppermute(v_cur, axis_name, perm)
        o_i, lse_i = flash_attention_bhtd(q, k_cur, v_cur, return_lse=True)
        o, lse = lse_merge(o, lse, o_i, lse_i)
        return o, lse, k_cur, v_cur

    o, lse, _, _ = lax.fori_loop(1, n, body, (o, lse, k, v))
    return o


def ring_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   mesh: Mesh, axis: str = MODEL_AXIS,
                   batch_axis: Optional[str] = None) -> jnp.ndarray:
    """Context-parallel attention over global [B, H, T, D] tensors.

    Shards the token axis over ``axis`` of ``mesh`` (and optionally the
    batch axis over ``batch_axis`` — dp x cp composes), runs the ring,
    and returns the global-shape output with the same sharding. T must
    divide by the axis size (pad upstream if not; spatial token counts
    at the hires sizes this serves are highly composite)."""
    t = q.shape[2]
    n = mesh.shape[axis]
    if t % n != 0:
        raise ValueError(f"token count {t} must divide the {axis!r} axis "
                         f"size {n}")
    spec = P(batch_axis, None, axis, None)
    f = shard_map(
        functools.partial(ring_attention_local, axis_name=axis),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )
    return f(q, k, v)
