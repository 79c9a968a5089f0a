"""Linear-layer helpers.

Weights are stored [d_in, d_out] (burn's Linear layout; the reference's
export transposes torch's [out, in] at dump time, python/save.py:23), so
application is a plain ``x @ w + b`` that XLA maps straight onto the MXU.

A param dict may instead carry a QUANTIZED weight (``qw``/``qw4`` + ``qs``
from ops/quant.py, produced by io/quantize.quantize_tree); it is
dequantized here, at the use site, so the dequant lands inside whatever
jitted loop calls the model and XLA fuses it into the matmul — the
HBM-resident copy stays int8/int4.

A param dict may ALSO carry an UNMERGED LoRA factor pair
(``lora_down`` [d_in, r] + ``lora_up`` [r, d_out], injected by
train/lora.py): the low-rank delta is applied at the use site as
``y += (x @ down) @ up`` so the base weight stays frozen (and possibly
quantized — QLoRA composes for free) while gradients flow only through
the factors. Inference merges LoRA into ``w`` instead (io/lora.py);
this runtime path exists for TRAINING, where the factorization is the
whole point.
"""

from __future__ import annotations

import jax.numpy as jnp

from .quant import dequant_weight


def _weight(p, x: jnp.ndarray) -> jnp.ndarray:
    w = p.get("w")
    if w is None:
        w = dequant_weight(p, x.dtype)
    return w


def _lora(p, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    d = p.get("lora_down")
    if d is None:
        return y
    u = p["lora_up"]
    return y + ((x @ d.astype(x.dtype)) @ u.astype(x.dtype)).astype(y.dtype)


def linear(p, x: jnp.ndarray) -> jnp.ndarray:
    y = x @ _weight(p, x)
    b = p.get("b")
    if b is not None:
        y = y + b
    return _lora(p, x, y)


def linear_nobias(p, x: jnp.ndarray) -> jnp.ndarray:
    return _lora(p, x, x @ _weight(p, x))
