"""Linear-layer helpers.

Weights are stored [d_in, d_out] (burn's Linear layout; the reference's
export transposes torch's [out, in] at dump time, python/save.py:23), so
application is a plain ``x @ w + b`` that XLA maps straight onto the MXU.

A param dict may instead carry a QUANTIZED weight (``qw``/``qw4`` + ``qs``
from ops/quant.py, produced by io/quantize.quantize_tree); it is
dequantized here, at the use site, so the dequant lands inside whatever
jitted loop calls the model and XLA fuses it into the matmul — the
HBM-resident copy stays int8/int4.
"""

from __future__ import annotations

import jax.numpy as jnp

from .quant import dequant_weight


def _weight(p, x: jnp.ndarray) -> jnp.ndarray:
    w = p.get("w")
    if w is None:
        w = dequant_weight(p, x.dtype)
    return w


def linear(p, x: jnp.ndarray) -> jnp.ndarray:
    y = x @ _weight(p, x)
    b = p.get("b")
    if b is not None:
        y = y + b
    return y


def linear_nobias(p, x: jnp.ndarray) -> jnp.ndarray:
    return x @ _weight(p, x)
