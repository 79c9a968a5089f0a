"""Quantize a parameter pytree for low-HBM deployment.

Walks a model's param tree and replaces eligible linear weight dicts
({"w": [d_in, d_out], "b"?}) with quantized ones (ops/quant.py: int8
per-output-channel or packed-int4 group-wise). ops/linear.py dequantizes
at the use site, inside the jitted sampling loop, where XLA fuses the
dequant into the consuming matmul — so the full-precision weight never
becomes HBM-resident (verified on HLO, tests/test_quant.py).

Eligibility is structural + path-scoped, NOT name-per-layer:
  - only 2-D weights with min(shape) >= min_dim (default 1024) — norms,
    biases, head RMS scales and small projections stay full precision;
  - only under path segments in `within` (default transformer block
    lists: "blocks"/"single_blocks" for Flux and MMDiT, T5's "blocks") —
    embedding tables and embedder/head linears outside the block stacks
    stay full precision (they are consumed by gathers, not matmuls, or
    are a rounding error of the total);
  - dicts whose final key is in `keep8` (adaLN/modulation linears,
    key "mod") are clamped to int8 even in int4 mode — modulation
    outputs scale whole activation streams, so they get the gentler
    quantizer while still dropping 4x from bf16.

Works on host numpy arrays (the loaders' native state — quantize before
the device transfer, halving peak HBM during load too), on device
arrays, and on jax.ShapeDtypeStruct trees (for building quantized
random params without materializing the bf16 model; see
random_quantized_like).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.quant import INT4_GROUP, quantize_weight
from ..utils import log

# path segments under which linear dicts are quantized, by model family
DEFAULT_WITHIN = ("blocks", "single_blocks")
# dict keys kept at >= 8 bits even when int4 is requested
DEFAULT_KEEP8 = ("mod",)

# UNet families (SDXL/SD1/SD2): quantize only inside the block stacks —
# the transformer linears there are ~2.0B of the base UNet's 2.6B params
# (the depth-10 1280-ch sites); convs (4-D) and norms pass through the
# structural rules untouched. lin_embed (the per-resblock timestep-emb
# projection) joins "mod" in the int8 clamp: like Flux's modulation
# linears it feeds a whole activation stream, so it gets the gentler
# quantizer in int4 mode.
UNET_WITHIN = ("input_blocks", "middle_block", "output_blocks")
UNET_KEEP8 = ("mod", "lin_embed")


def parse_quantize_spec(spec: Optional[str]) -> Optional[int]:
    """CLI '--quantize int8|int4' -> bits (None passes through)."""
    if spec is None or spec == "none":
        return None
    table = {"int8": 8, "8": 8, "int4": 4, "4": 4}
    if spec not in table:
        raise ValueError(f"--quantize must be int8 or int4, got {spec!r}")
    return table[spec]


def _is_linear_dict(node) -> bool:
    if not isinstance(node, dict) or "w" not in node:
        return False
    w = node["w"]
    return getattr(w, "ndim", 0) == 2


def _quantize_linear_dict(node: dict, bits: int, group: int) -> dict:
    w = node["w"]
    if isinstance(w, jax.ShapeDtypeStruct):
        q = _abstract_quantized(w, bits, group)
    else:
        q = quantize_weight(w, bits, group)
    out = {k: v for k, v in node.items() if k != "w"}
    out.update(q)
    return out


def _abstract_quantized(w: jax.ShapeDtypeStruct, bits: int,
                        group: int) -> dict:
    d_in, d_out = w.shape
    if bits == 8:
        return {"qw": jax.ShapeDtypeStruct((d_in, d_out), jnp.int8),
                "qs": jax.ShapeDtypeStruct((d_out,), jnp.float32)}
    return {"qw4": jax.ShapeDtypeStruct((d_in // 2, d_out), jnp.uint8),
            "qs": jax.ShapeDtypeStruct((d_in // group, d_out),
                                       jnp.float32)}


def quantize_tree(
    params,
    bits: int = 8,
    min_dim: Optional[int] = None,
    group: int = INT4_GROUP,
    within: Sequence[str] = DEFAULT_WITHIN,
    keep8: Sequence[str] = DEFAULT_KEEP8,
):
    """Return a copy of `params` with eligible linears quantized.

    min_dim defaults to 1024 (env override SDXL_TPU_QUANT_MIN_DIM — for
    driving the quantized path end-to-end on tiny fixtures). Stats are
    logged: quantized / kept bytes. Leaves shared between calls are not
    copied (norms, biases pass through by reference)."""
    import os

    if min_dim is None:
        min_dim = int(os.environ.get("SDXL_TPU_QUANT_MIN_DIM", "1024"))
    group = int(os.environ.get("SDXL_TPU_QUANT_GROUP", group))
    within = set(within)
    keep8 = set(keep8)
    stats = {"q_bytes": 0, "orig_bytes": 0, "n": 0}

    def nbytes(a) -> int:  # works for arrays, tracers, ShapeDtypeStructs
        return int(np.prod(a.shape)) * np.dtype(a.dtype).itemsize

    def walk(node, path, in_scope):
        if isinstance(node, dict):
            if in_scope and _is_linear_dict(node):
                w = node["w"]
                b = bits
                if path and path[-1] in keep8:
                    b = max(bits, 8)
                if b == 4 and (w.shape[0] % 2
                               or (w.shape[0] // 2) % group):
                    b = 8  # ragged input dim: fall back to per-channel int8
                if min(w.shape) >= min_dim:
                    q = _quantize_linear_dict(node, b, group)
                    stats["n"] += 1
                    stats["orig_bytes"] += nbytes(w)
                    stats["q_bytes"] += sum(
                        nbytes(v) for k, v in q.items() if k != "b")
                    return q
            return {k: walk(v, path + (k,), in_scope or k in within)
                    for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            walked = [walk(v, path + (str(i),), in_scope)
                      for i, v in enumerate(node)]
            return walked if isinstance(node, list) else tuple(walked)
        return node

    out = walk(params, (), False)
    if stats["n"]:
        log(f"quantized {stats['n']} linears (int{bits}, mods>=int8): "
            f"{stats['orig_bytes'] / 2**30:.2f} GiB -> "
            f"{stats['q_bytes'] / 2**30:.2f} GiB")
    return out


def random_quantized_like(key, params_abstract, bits: int = 8,
                          min_dim: int = 1024, group: int = INT4_GROUP,
                          within: Sequence[str] = DEFAULT_WITHIN,
                          keep8: Sequence[str] = DEFAULT_KEEP8):
    """Materialize a random param tree in the QUANTIZED layout directly,
    never allocating the full-precision model — for benching real-size
    quantized configs on one chip (e.g. FLUX.1's 12B, whose bf16 form
    cannot exist on a 16 GB device at all).

    `params_abstract` is a jax.eval_shape result of the model's init.
    One jitted program builds the whole tree (a single dispatch — the
    per-leaf eager path costs hundreds of tunnel round-trips)."""
    qabstract = quantize_tree(params_abstract, bits, min_dim, group,
                              within, keep8)

    def materialize(k):
        def leaf(a):
            if a.dtype == jnp.int8:
                return jax.random.randint(k, a.shape, -127, 128, jnp.int32
                                          ).astype(jnp.int8)
            if a.dtype == jnp.uint8:
                return jax.random.randint(k, a.shape, 0, 256, jnp.int32
                                          ).astype(jnp.uint8)
            if a.dtype == jnp.float32 and a.ndim <= 2:
                # scales: small positive values
                return jnp.full(a.shape, 0.02 / 127.0, jnp.float32)
            return (jax.random.normal(k, a.shape, jnp.float32) * 0.02
                    ).astype(a.dtype)
        return jax.tree_util.tree_map(leaf, qabstract)

    return jax.jit(materialize)(key)
