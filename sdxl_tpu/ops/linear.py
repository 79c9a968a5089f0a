"""Linear-layer helpers.

Weights are stored [d_in, d_out] (burn's Linear layout; the reference's
export transposes torch's [out, in] at dump time, python/save.py:23), so
application is a plain ``x @ w + b`` that XLA maps straight onto the MXU.
"""

from __future__ import annotations

import jax.numpy as jnp


def linear(p, x: jnp.ndarray) -> jnp.ndarray:
    y = x @ p["w"]
    b = p.get("b")
    if b is not None:
        y = y + b
    return y


def linear_nobias(p, x: jnp.ndarray) -> jnp.ndarray:
    return x @ p["w"]
