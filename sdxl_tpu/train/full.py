"""Full-parameter fine-tuning (every float leaf of the tower trains).

Capability extension beyond LoRA (train/lora.py): the classic "dreambooth
/ full fine-tune" regime. TPU-first design decisions:

  - **Master weights as the trainable pytree.** The trainable dict is
    flat {dotted-path: leaf} over ALL float leaves of the tower, held in
    a master dtype (f32 default; bf16 halves HBM at some quality cost).
    The loss wrapper casts each leaf back to the frozen tower's own
    dtype before ``set_leaves`` inserts it, so the forward runs the
    EXACT inference program (bf16 matmuls on the MXU) while the
    optimizer update happens in master precision — the standard
    mixed-precision recipe, with the cast inside the jitted step.
  - **The frozen template is stripped.** Every trained leaf is replaced
    by None in the template pytree that rides along as the static
    structure donor, so the base tower's bf16 copy does not sit in HBM
    next to the master copy (a 5.2 GB saving on SDXL-base).
  - **Adafactor is the single-chip default.** Adam's two f32 moments
    add 2x param bytes (20.8 GB for SDXL-base — over a 16 GB chip on
    their own); Adafactor's factored second moment is O(rows + cols)
    (the classic TPU-era optimizer, arXiv:1804.04235) and trains the
    full 2.6B-param UNet in master-bf16 on one chip.
  - **ZeRO-1 sharding over the data axis.** ``zero_specs`` assigns every
    trainable/optimizer leaf a NamedSharding that splits its largest
    dp-divisible axis across the 'data' mesh axis; jitting the train
    step with those in/out shardings makes GSPMD reduce-scatter grads,
    update each shard locally, and all-gather params for the next
    forward — optimizer state never exists replicated. (Scaling-book
    recipe: annotate shardings, let XLA insert the collectives.)

The reference has no training of any kind (SURVEY.md §2).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .lora import path_str, set_leaves

# ---------------------------------------------------------------------------
# trainable extraction
# ---------------------------------------------------------------------------


def iter_array_leaves(tree):
    """Yield (path_tuple, leaf) for every array leaf (dict/list pytree)."""

    def rec(node, path):
        if isinstance(node, dict):
            for k in sorted(node):
                yield from rec(node[k], path + (k,))
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                yield from rec(v, path + (i,))
        elif node is not None:
            yield path, node

    yield from rec(tree, ())


def full_trainable(
    frozen, master_dtype=jnp.float32
) -> Tuple[Dict[str, jnp.ndarray], Dict[str, jnp.dtype], object]:
    """(master, dtypes, template) for a full fine-tune.

    master:   flat {path: leaf.astype(master_dtype)} over every float
              leaf — the trainable pytree.
    dtypes:   {path: original dtype} the loss wrapper casts back to.
    template: the frozen tree with every trained leaf replaced by None
              (a pure structure donor; jit sees no duplicate buffers).

    Quantized towers (int8/int4 ``qw`` leaves) are rejected: full FT
    must update the weights it trains (QLoRA is the quantized-base
    recipe, train/lora.py)."""
    master: Dict[str, jnp.ndarray] = {}
    dtypes: Dict[str, jnp.dtype] = {}
    for path, leaf in iter_array_leaves(frozen):
        s = path_str(path)
        if not jnp.issubdtype(leaf.dtype, jnp.floating):
            raise ValueError(
                f"full fine-tune over a quantized tower is unsupported "
                f"({s}: {leaf.dtype}); use QLoRA (--rank) instead")
        master[s] = leaf.astype(master_dtype)
        dtypes[s] = leaf.dtype
    template = set_leaves(frozen, {s: None for s in master})
    return master, dtypes, template


def wrap_loss_full(base_loss_fn, dtypes: Dict[str, jnp.dtype]):
    """loss(master, template, batch, key): cast master -> tower dtypes,
    insert into the template, call the (generic) set_leaves-based loss."""

    def loss_fn(master, template, batch, key):
        cast = {s: v.astype(dtypes[s]) for s, v in master.items()}
        return base_loss_fn(cast, template, batch, key)

    return loss_fn


def merge_trained(frozen, master: Dict[str, jnp.ndarray],
                  dtypes: Dict[str, jnp.dtype]):
    """Fold trained master weights back into a copy of the frozen tower
    (each leaf cast to its original dtype) — the export artifact."""
    return set_leaves(
        frozen, {s: jnp.asarray(v).astype(dtypes[s])
                 for s, v in master.items()})


# ---------------------------------------------------------------------------
# optimizers
# ---------------------------------------------------------------------------


def adafactor_sched(
    lr: float,
    steps: int,
    warmup: int = 0,
    weight_decay: float = 0.0,
    grad_clip: Optional[float] = 1.0,
    final_lr_frac: float = 0.0,
) -> optax.GradientTransformation:
    """Adafactor with the same warmup-cosine schedule shape as
    train/step.py's adamw_cosine. Factored second moment only (no
    momentum): optimizer state is O(rows + cols) per matrix — the
    single-chip full-FT default."""
    if warmup > 0:
        sched = optax.warmup_cosine_decay_schedule(
            0.0, lr, warmup, max(steps, warmup + 1),
            end_value=lr * final_lr_frac)
    else:
        sched = optax.cosine_decay_schedule(lr, max(steps, 1),
                                            alpha=final_lr_frac)
    parts = []
    if grad_clip is not None:
        parts.append(optax.clip_by_global_norm(grad_clip))
    parts.append(optax.adafactor(
        learning_rate=sched,
        multiply_by_parameter_scale=False,  # plain LR semantics, like Adam
        clipping_threshold=None,            # global-norm clip above instead
        momentum=None,
        weight_decay_rate=weight_decay if weight_decay else None,
    ))
    return optax.chain(*parts)


# ---------------------------------------------------------------------------
# ZeRO-1 optimizer-state sharding
# ---------------------------------------------------------------------------


def zero_spec_for(shape: Tuple[int, ...], n_data: int, axis: str = "data"):
    """PartitionSpec sharding the largest n_data-divisible dim over the
    data axis (None everywhere else); fully replicated if nothing
    divides."""
    from jax.sharding import PartitionSpec as P

    if n_data <= 1 or not shape:
        return P()
    dims = [None] * len(shape)
    cand = [i for i, d in enumerate(shape) if d % n_data == 0 and d > 1]
    if not cand:
        return P()
    best = max(cand, key=lambda i: shape[i])
    dims[best] = axis
    return P(*dims)


def zero_shardings(tree, mesh, axis: str = "data"):
    """NamedSharding pytree for ZeRO-1: every array leaf split over the
    data axis per ``zero_spec_for``; non-array leaves -> replicated.
    Apply to the trainable master AND the optimizer state (they share
    tree structure per-leaf), then jit the step with these as
    in_shardings/out_shardings for state — GSPMD turns the grad
    all-reduce into reduce-scatter + sharded update + all-gather."""
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    n_data = mesh.shape[axis]

    def place(leaf):
        if hasattr(leaf, "shape"):
            return NamedSharding(mesh, zero_spec_for(leaf.shape, n_data,
                                                     axis))
        return NamedSharding(mesh, P())

    return jax.tree.map(place, tree)


def shard_state_zero1(state, mesh, axis: str = "data"):
    """device_put a freshly created TrainState into its ZeRO-1 layout."""
    return jax.device_put(state, zero_shardings(state, mesh, axis))
