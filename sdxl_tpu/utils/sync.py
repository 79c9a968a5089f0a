"""Device synchronization helper.

On the axon tunnel platform jax.block_until_ready returns before execution
finishes; the only reliable fence is a (tiny) host readback. ``fence``
reduces the first array leaf to a scalar and reads it back (4 bytes over
the wire), synchronizing without the cost of transferring full outputs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def fence(tree) -> float:
    leaves = [l for l in jax.tree.leaves(tree) if hasattr(l, "dtype")]
    if not leaves:
        return 0.0
    x = leaves[0]
    return float(jnp.sum(x.astype(jnp.float32)))
