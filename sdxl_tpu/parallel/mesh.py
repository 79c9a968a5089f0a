"""Device mesh + sharding rules for multi-chip SDXL inference.

The reference is strictly single-GPU (one LibTorchDevice::Cuda(0),
sample/main.rs:131; no NCCL/MPI anywhere — SURVEY.md §5). The TPU-native
scaling design uses a 2-axis ``jax.sharding.Mesh``:

  - "data":  batch-parallel sampling — prompts shard across chips; the
    only cross-chip traffic is the final image gather (pure pjit sharding,
    collectives ride ICI)
  - "model": tensor parallelism over attention heads / MLP hidden dims of
    the UNet + CLIP transformer linears (column-parallel qkv/fc1/geglu,
    row-parallel out/fc2) for latency scaling; GSPMD inserts the matching
    all-reduces. Convolutions are replicated: at SDXL sizes they are
    bandwidth-bound and GN's channel statistics would force extra
    collectives per block.

No explicit collective calls appear anywhere — shardings are annotated on
params/batch and XLA's SPMD partitioner inserts ICI collectives
(scaling-book recipe: pick mesh, annotate, let XLA do the rest).
"""

from __future__ import annotations

import re
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: Optional[int] = None,
    n_model: Optional[int] = None,
    devices=None,
) -> Mesh:
    """Build a (data, model) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n_data is None and n_model is None:
        n_model = 1
        n_data = n
    elif n_data is None:
        n_data = n // n_model
    elif n_model is None:
        n_model = n // n_data
    assert n_data * n_model == n, f"{n_data}x{n_model} != {n} devices"
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


# (path regex, PartitionSpec, kind) — first match wins; default replicated.
# Paths are dot-joined pytree key paths, e.g.
# "input_blocks.4.transformer.blocks.0.attn1.q.w".
# kind marks attention projections whose sharding must stay HEAD-ALIGNED
# (see shard_params): splitting the feature axis mid-head (e.g. the base
# UNet's 10 heads at 640ch over tp=4) forces GSPMD to all-gather the
# activations at the [B,T,H,64] head reshape — measured 6 all-gathers per
# transformer block vs 0 when head-aligned (scripts/exp_tp_hlo.py).
_TP_RULES: Sequence = (
    # column-parallel: split output features over MODEL
    (re.compile(r"\.attn\d?\.(q|k|v)\.w$"), P(None, MODEL_AXIS), "attn_col"),
    # fused self-attn qkv ([C, 3C], fuse_unet_qkv): still column-parallel;
    # GSPMD reshards at the 3-way split (dp x tp equivalence is tested with
    # fused params in tests/test_parallel.py)
    (re.compile(r"\.attn\d?\.qkv\.w$"), P(None, MODEL_AXIS), "attn_qkv"),
    (re.compile(r"\.mlp\.proj\.w$"), P(None, MODEL_AXIS), None),
    (re.compile(r"\.mlp\.fc1\.w$"), P(None, MODEL_AXIS), None),
    (re.compile(r"\.mlp\.proj\.b$"), P(MODEL_AXIS), None),
    (re.compile(r"\.mlp\.fc1\.b$"), P(MODEL_AXIS), None),
    # row-parallel: split input features over MODEL (output all-reduced)
    (re.compile(r"\.attn\d?\.out\.w$"), P(MODEL_AXIS, None), "attn_row"),
    (re.compile(r"\.mlp\.fc2\.w$"), P(MODEL_AXIS, None), None),
    (re.compile(r"\.mlp\.lin\.w$"), P(MODEL_AXIS, None), None),
    # --- MMDiT (SD3, models/mmdit.py) joint-attention + dual-stream MLPs:
    # per-stream q/k/v column-parallel (24 heads x 64 — head-aligned for
    # any power-of-two tp), out projections row-parallel, adaLN modulation
    # linears replicated (tiny next to attention/MLP)
    (re.compile(
        r"\.attn2?\.(to_q|to_k|to_v|add_q_proj|add_k_proj|add_v_proj)\.w$"),
     P(None, MODEL_AXIS), "attn_col"),
    (re.compile(
        r"\.attn2?\.(to_q|to_k|to_v|add_q_proj|add_k_proj|add_v_proj)\.b$"),
     P(MODEL_AXIS), "attn_col"),
    (re.compile(r"\.attn2?\.(to_out|to_add_out)\.w$"),
     P(MODEL_AXIS, None), "attn_row"),
    # fused MMDiT context-stream projections (fuse_mmdit_qkv); the
    # latent-stream .qkv already matches the UNet fused rule above
    (re.compile(r"\.attn2?\.add_qkv\.w$"), P(None, MODEL_AXIS),
     "attn_qkv"),
    (re.compile(r"\.mlp(_context)?\.in\.w$"), P(None, MODEL_AXIS), None),
    (re.compile(r"\.mlp(_context)?\.in\.b$"), P(MODEL_AXIS), None),
    (re.compile(r"\.mlp(_context)?\.out\.w$"), P(MODEL_AXIS, None), None),
    # --- T5 encoder (models/t5.py): q/k/v already match the first rule;
    # o row-parallel, gated FFN column/row (all bias-free)
    (re.compile(r"\.attn\.o\.w$"), P(MODEL_AXIS, None), "attn_row"),
    (re.compile(r"\.ffn\.wi_[01]\.w$"), P(None, MODEL_AXIS), None),
    (re.compile(r"\.ffn\.wo\.w$"), P(MODEL_AXIS, None), None),
    # --- Flux single-stream blocks (models/flux.py): attn to_q/k/v match
    # the MMDiT rule; the parallel MLP is column-parallel and the fusing
    # projection of [attn ⧺ gelu(mlp)] is row-parallel (one all-reduce)
    (re.compile(r"single_blocks\.\d+\.proj_mlp\.w$"),
     P(None, MODEL_AXIS), None),
    (re.compile(r"single_blocks\.\d+\.proj_mlp\.b$"), P(MODEL_AXIS), None),
    (re.compile(r"single_blocks\.\d+\.proj_out\.w$"),
     P(MODEL_AXIS, None), None),
)


def _expand_quant_rules(rules: Sequence) -> Sequence:
    """Extend every `.w` rule to the int8-quantized layout (io/quantize):
    `qw` [d_in, d_out] shards exactly like `w`; the per-output-channel
    scale `qs` [d_out] splits with the output axis in the column-parallel
    case and replicates in the row-parallel one. Packed int4 (`qw4`) has
    no rule — its packed input axis halves the row dimension, so it
    replicates (int4 is the single-chip fit mode; TP is what it avoids)."""
    out = list(rules)
    for rx, spec, kind in rules:
        pat = rx.pattern
        if not pat.endswith(r"\.w$"):
            continue
        base = pat[: -len(r"\.w$")]
        out.append((re.compile(base + r"\.qw$"), spec, kind))
        qs_spec = P(MODEL_AXIS) if spec == P(None, MODEL_AXIS) else P()
        out.append((re.compile(base + r"\.qs$"), qs_spec, None))
    return tuple(out)


_TP_RULES = _expand_quant_rules(_TP_RULES)


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return ".".join(parts)


def _spec_kind_for(path: str, tensor_parallel: bool):
    if tensor_parallel:
        for rx, spec, kind in _TP_RULES:
            if rx.search("." + path):
                return spec, kind
    return P(), None


def partition_spec_for(path: str, tensor_parallel: bool) -> P:
    return _spec_kind_for(path, tensor_parallel)[0]


def shard_params(params, mesh: Mesh, tensor_parallel: bool = True,
                 head_channels: int = 64, fixed_heads: int = 0):
    """Place a parameter pytree on the mesh per the TP rules.

    With tensor_parallel=False (or a size-1 model axis) everything is
    replicated — the pure data-parallel throughput mode.

    Attention projections are sharded only when the split is HEAD-ALIGNED:
    n_heads % tp == 0, with n_heads = fixed_heads (SD1/2-style configs) or
    attention features / head_channels (SDXL: 64, unet/mod.rs:113). A
    mid-head split (the base UNet's 10 heads at 640ch over tp=4) would
    make GSPMD all-gather activations at every [B,T,H,D] head reshape —
    measured 6 all-gathers/transformer block vs 0 aligned
    (scripts/exp_tp_hlo.py); such tensors are replicated instead and only
    the MLP halves of those blocks stay tensor-parallel.
    """
    tp = tensor_parallel and mesh.shape[MODEL_AXIS] > 1
    n_model = mesh.shape[MODEL_AXIS]

    def attn_heads(kind, shape) -> int:
        """Head count of the attention this projection belongs to; 0 if
        it cannot be derived (conservatively replicates)."""
        if fixed_heads:
            return fixed_heads
        if kind == "attn_col":      # [C_in, H*D] (or stacked [S, ., .])
            feat = shape[-1]
        elif kind == "attn_qkv":    # [C, 3*H*D]
            feat = shape[-1] // 3
        else:                       # attn_row: [H*D, C]
            feat = shape[-2] if len(shape) == 3 else shape[0]
        return feat // head_channels if feat % head_channels == 0 else 0

    def place(path, leaf):
        if leaf is None:
            return None
        spec, kind = _spec_kind_for(_path_str(path), tp)
        # TP rules target 2-D linear weights / 1-D biases. Stacked
        # transformer blocks (stack_unet_transformers) add a leading depth
        # axis — shift the spec right. The VAE mid-attention reuses q/k/v
        # names for 4-D conv kernels — replicate those.
        if len(spec) == 2 and leaf.ndim == 3:
            spec = P(None, *spec)
        elif len(spec) == 1 and leaf.ndim == 2:
            spec = P(None, *spec)
        elif len(spec) > 0 and leaf.ndim > len(spec):
            spec = P()
        if kind is not None and len(spec) > 0:
            heads = attn_heads(kind, leaf.shape)
            if heads <= 0 or heads % n_model != 0:
                spec = P()
        # guard: axes must divide the dim; otherwise replicate
        for dim, axis in zip(leaf.shape, spec):
            if axis is not None and dim % mesh.shape[axis] != 0:
                spec = P()
                break
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params, is_leaf=lambda x: x is None)


def shard_batch(tree, mesh: Mesh):
    """Shard leading (batch) axis over the data axis; used for latents,
    contexts and channel contexts in batched sampling."""
    sharding = NamedSharding(mesh, P(DATA_AXIS))

    def place(leaf):
        if leaf is None:
            return None
        if leaf.ndim == 0 or leaf.shape[0] % mesh.shape[DATA_AXIS] != 0:
            return jax.device_put(leaf, NamedSharding(mesh, P()))
        spec = P(DATA_AXIS, *([None] * (leaf.ndim - 1)))
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree.map(place, tree, is_leaf=lambda x: x is None)
