"""LoRA injection, trainable-parameter partitioning, and export.

Capability extension (the reference has no training at all; its weight
surface is load-only, SURVEY.md §2). Design:

  - ``init_lora(tree, rank, key)`` walks a model pytree, finds the
    target linear leaves (dicts with a 2-D ``w`` — or a quantized
    ``qw``/``qw4`` pair, QLoRA) and returns a FLAT dict
    ``{"path.to.leaf.lora_down": [d_in, r], ".../lora_up": [r, d_out]}``
    of freshly initialized factors. The base tree is NOT modified: the
    flat dict is the trainable pytree that ``jax.grad`` differentiates.
  - ``set_leaves(tree, flat)`` functionally inserts the factors into a
    copy of the tree (shallow copies along each path only), producing
    the params the forward pass runs with. ops/linear.py applies the
    pair unmerged: ``y += (x @ down) @ up`` — base weights stay frozen
    (and stay int8/int4 under QLoRA).
  - Factor convention: OUR layout is ``down [d_in, r]``, ``up [r,
    d_out]`` with NO runtime scale — the effective delta is
    ``down @ up``. Export writes the torch orientation (kohya ``down
    [r, d_in]`` / ``up [d_out, r]``) with ``alpha == rank`` so the
    standard merge ``scale*(alpha/r)*up@down`` (io/lora.py:6) reproduces
    the trained delta exactly; a trained file round-trips through the
    inference `--lora` merge path bit-for-bit in f32.
  - Init follows the LoRA paper / kohya: ``down ~ N(0, 1/rank)``,
    ``up = 0`` — the model starts EXACTLY at the base function.

Name mapping for export reuses io/lora.py's resolver tables in reverse:
candidate ecosystem module names are enumerated and resolved through the
SAME ``_resolve_unet``/``_resolve_te``/``_resolve_transformer`` functions
the loader uses, so the inverse map is self-verifying — an exported name
is by construction one the loader maps back onto the same pytree path.
"""

from __future__ import annotations

import re
from typing import Callable, Dict, Iterable, Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..io import lora as lora_io

Path = Tuple[object, ...]  # str keys / int list indices

# ---------------------------------------------------------------------------
# pytree walking
# ---------------------------------------------------------------------------


def _is_linear_leaf(node) -> bool:
    if not isinstance(node, dict):
        return False
    w = node.get("w")
    if w is not None:
        return getattr(w, "ndim", 0) == 2
    return "qw" in node or "qw4" in node


def _linear_dims(node) -> Tuple[int, int]:
    if node.get("w") is not None:
        return int(node["w"].shape[0]), int(node["w"].shape[1])
    if "qw" in node:
        return int(node["qw"].shape[0]), int(node["qw"].shape[1])
    qw4 = node["qw4"]
    return 2 * int(qw4.shape[0]), int(qw4.shape[1])


def iter_linear_paths(tree) -> Iterator[Tuple[Path, dict]]:
    """Yield (path, leaf) for every linear param dict in the tree."""

    def rec(node, path):
        if _is_linear_leaf(node):
            yield path, node
            return
        if isinstance(node, dict):
            for k in sorted(node):
                yield from rec(node[k], path + (k,))
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                yield from rec(v, path + (i,))

    yield from rec(tree, ())


def path_str(path: Path) -> str:
    return ".".join(str(p) for p in path)


def parse_path(s: str) -> Path:
    return tuple(int(p) if p.isdigit() else p for p in s.split("."))


# target presets: regex over the DOTTED leaf path. "attn" covers the
# attention projections every standard trainer targets; "all-linear"
# additionally takes the MLPs and the transformer in/out projections
# (kohya's default SDXL target set).
_PRESETS: Dict[str, re.Pattern] = {
    "attn": re.compile(
        r"(^|\.)(attn2?|attn1)\."
        r"(q|k|v|out|o|to_q|to_k|to_v|to_out|"
        r"add_q_proj|add_k_proj|add_v_proj|to_add_out)$"
    ),
    "all-linear": re.compile(
        r"(^|\.)(attn2?|attn1)\."
        r"(q|k|v|out|o|to_q|to_k|to_v|to_out|"
        r"add_q_proj|add_k_proj|add_v_proj|to_add_out)$"
        r"|(^|\.)mlp(_context)?\.(proj|lin|in|out|fc1|fc2)$"
        r"|(^|\.)(proj_in|proj_out|proj_mlp)$"
    ),
}


def lora_target_paths(
    tree,
    targets: str = "attn",
    predicate: Optional[Callable[[str], bool]] = None,
) -> List[Path]:
    """Paths of the linear leaves a given preset (or custom predicate)
    selects. Fused projections (``qkv``/``add_qkv``, load-time merges)
    are never targeted — train on unfused params."""
    if predicate is None:
        rx = _PRESETS[targets]
        predicate = lambda s: rx.search(s) is not None  # noqa: E731
    out = []
    for path, leaf in iter_linear_paths(tree):
        s = path_str(path)
        if s.endswith(".qkv") or s.endswith(".add_qkv"):
            continue
        if predicate(s):
            out.append(path)
    return out


# ---------------------------------------------------------------------------
# init / functional insertion
# ---------------------------------------------------------------------------


def init_lora(
    tree,
    rank: int,
    key,
    targets: str = "attn",
    predicate: Optional[Callable[[str], bool]] = None,
    dtype=jnp.float32,
) -> Dict[str, jnp.ndarray]:
    """Fresh LoRA factors for every targeted linear in ``tree``.

    Returns the flat trainable dict {path+".lora_down"/".lora_up": arr}.
    down ~ N(0, 1/rank), up = 0 (the injected model starts bit-identical
    to the base — asserted in tests/test_train_lora.py)."""
    paths = lora_target_paths(tree, targets, predicate)
    if not paths:
        raise ValueError(f"no LoRA targets matched preset {targets!r}")
    flat: Dict[str, jnp.ndarray] = {}
    keys = jax.random.split(key, len(paths))
    for k, path in zip(keys, paths):
        leaf = lora_io._tree_leaf(tree, path)
        d_in, d_out = _linear_dims(leaf)
        s = path_str(path)
        flat[s + ".lora_down"] = (
            jax.random.normal(k, (d_in, rank), dtype) / rank
        )
        flat[s + ".lora_up"] = jnp.zeros((rank, d_out), dtype)
    return flat


def set_leaves(tree, flat: Dict[str, jnp.ndarray]):
    """Functionally insert flat {dotted-path: value} entries into a copy
    of the tree (shallow-copying only the containers along each path).
    Missing final keys are created; intermediate containers must exist."""
    root = _shallow(tree)
    touched = {(): root}
    for s, val in flat.items():
        path = parse_path(s)
        node = root
        for i, p in enumerate(path[:-1]):
            prefix = path[: i + 1]
            if prefix in touched:
                node = touched[prefix]
                continue
            child = _shallow(node[p])
            node[p] = child
            touched[prefix] = child
            node = child
        node[path[-1]] = val
    return root


def _shallow(node):
    if isinstance(node, dict):
        return dict(node)
    if isinstance(node, list):
        return list(node)
    if isinstance(node, tuple):
        return list(node)
    raise TypeError(f"cannot set into leaf of type {type(node)}")


def strip_lora(tree):
    """Copy of the tree with every lora_down/lora_up leaf removed."""

    def rec(node):
        if isinstance(node, dict):
            return {
                k: rec(v)
                for k, v in node.items()
                if k not in ("lora_down", "lora_up")
            }
        if isinstance(node, (list, tuple)):
            return [rec(v) for v in node]
        return node

    return rec(tree)


# ---------------------------------------------------------------------------
# export: pytree path -> ecosystem module name (inverse of io/lora.py)
# ---------------------------------------------------------------------------


def _invert_names(
    tree, candidates: Iterable[str], resolve: Callable[[str], Optional[Path]]
) -> Dict[Path, str]:
    """{path: module_name} for every candidate name that resolves onto a
    linear leaf present in the tree — the loader itself verifies the map."""
    out: Dict[Path, str] = {}
    for name in candidates:
        path = resolve(name)
        if path is None or isinstance(path, list):
            continue
        leaf = lora_io._tree_leaf(tree, path)
        if leaf is not None and _is_linear_leaf(leaf):
            out.setdefault(tuple(path), name)
    return out


_T_SUFFIXES = ("attn1_to_q", "attn1_to_k", "attn1_to_v", "attn1_to_out_0",
               "attn2_to_q", "attn2_to_k", "attn2_to_v", "attn2_to_out_0",
               "ff_net_0_proj", "ff_net_2")


def _unet_candidates() -> Iterator[str]:
    for loc in (
        [f"down_blocks_{L}_attentions_{j}" for L in range(4) for j in range(3)]
        + ["mid_block_attentions_0"]
        + [f"up_blocks_{L}_attentions_{j}" for L in range(4) for j in range(3)]
    ):
        yield f"{loc}_proj_in"
        yield f"{loc}_proj_out"
        for k in range(12):
            for sfx in _T_SUFFIXES:
                yield f"{loc}_transformer_blocks_{k}_{sfx}"
    for loc in (
        [f"down_blocks_{L}_resnets_{j}" for L in range(4) for j in range(3)]
        + ["mid_block_resnets_0", "mid_block_resnets_1"]
        + [f"up_blocks_{L}_resnets_{j}" for L in range(4) for j in range(4)]
    ):
        yield f"{loc}_time_emb_proj"


def _te_candidates() -> Iterator[str]:
    for i in range(48):
        for sfx in ("self_attn_q_proj", "self_attn_k_proj",
                    "self_attn_v_proj", "self_attn_out_proj",
                    "mlp_fc1", "mlp_fc2"):
            yield f"text_model_encoder_layers_{i}_{sfx}"


def _transformer_candidates() -> Iterator[str]:
    for i in range(64):
        for a in ("", "2"):
            for sfx in ("to_q", "to_k", "to_v", "to_out_0", "add_q_proj",
                        "add_k_proj", "add_v_proj", "to_add_out"):
                yield f"transformer_blocks_{i}_attn{a}_{sfx}"
        for ctx in ("", "_context"):
            yield f"transformer_blocks_{i}_ff{ctx}_net_0_proj"
            yield f"transformer_blocks_{i}_ff{ctx}_net_2"
    for i in range(64):
        for sfx in ("attn_to_q", "attn_to_k", "attn_to_v",
                    "proj_mlp", "proj_out"):
            yield f"single_transformer_blocks_{i}_{sfx}"


def _name_map(tower: str, tree) -> Dict[Path, str]:
    if tower == "unet":
        return _invert_names(tree, _unet_candidates(), lora_io._resolve_unet)
    if tower in ("te1", "te2"):
        return _invert_names(tree, _te_candidates(), lora_io._resolve_te)
    if tower == "transformer":
        return _invert_names(
            tree, _transformer_candidates(), lora_io._resolve_transformer
        )
    raise ValueError(tower)


def lora_state_dict(
    flat: Dict[str, jnp.ndarray],
    trees: Dict[str, object],
    fmt: str = "kohya",
) -> Dict[str, np.ndarray]:
    """Flat trained factors -> ecosystem-format tensors.

    ``trees`` maps tower prefix ('unet' | 'te1' | 'te2' | 'transformer')
    to its param pytree (used for name inversion). fmt 'kohya' emits
    ``lora_unet_<module>.lora_down.weight`` (+.alpha == rank, so the
    merge scale alpha/r == 1 matches our scale-free runtime); 'peft'
    emits ``unet.<module dotted>.lora_A.weight``."""
    maps = {tower: _name_map(tower, tree) for tower, tree in trees.items()}
    pairs: Dict[Tuple[str, Path], Dict[str, jnp.ndarray]] = {}
    for s, val in flat.items():
        path = parse_path(s)
        base, slot = path[:-1], path[-1]
        for tower in trees:
            if tuple(base) in maps[tower]:
                pairs.setdefault((tower, tuple(base)), {})[slot] = val
                break
        else:
            raise KeyError(
                f"no exportable ecosystem name for LoRA site {path_str(base)}"
            )
    out: Dict[str, np.ndarray] = {}
    peft_prefix = {"unet": "unet", "te1": "text_encoder",
                   "te2": "text_encoder_2", "transformer": "transformer"}
    for (tower, base), slots in sorted(pairs.items()):
        module = maps[tower][base]
        # ascontiguousarray: safetensors' numpy save_file serializes the
        # raw underlying buffer, so a transposed view would be written in
        # the WRONG element order silently.
        down = np.ascontiguousarray(
            np.asarray(slots["lora_down"], np.float32).T  # [r, d_in]
        )
        up = np.ascontiguousarray(
            np.asarray(slots["lora_up"], np.float32).T    # [d_out, r]
        )
        if fmt == "kohya":
            # transformer towers keep the lora_transformer_ prefix (parsed
            # by io/lora._canonical_module); lora_unet_ would collide with
            # the kohya BFL-Flux fused naming, which uses different
            # module spellings (double_blocks_*)
            key = f"lora_{tower}_{module}"
            out[key + ".lora_down.weight"] = down
            out[key + ".lora_up.weight"] = up
            out[key + ".alpha"] = np.asarray(down.shape[0], np.float32)
        elif fmt == "peft":
            # module names contain real underscores (to_q, ff_net_0_proj);
            # peft keys are dotted module paths — rebuild from the
            # underscored form via the known atom spellings
            key = _peft_dotted(peft_prefix[tower], module)
            out[key + ".lora_A.weight"] = down
            out[key + ".lora_B.weight"] = up
        else:
            raise ValueError(fmt)
    return out


_PEFT_ATOMS = (
    "down_blocks", "mid_block", "up_blocks", "attentions", "resnets",
    "transformer_blocks", "single_transformer_blocks", "proj_in",
    "proj_out", "proj_mlp", "to_q", "to_k", "to_v", "to_out",
    "add_q_proj", "add_k_proj", "add_v_proj", "to_add_out", "ff_context",
    "ff", "net", "time_emb_proj", "text_model", "encoder", "layers",
    "self_attn", "q_proj", "k_proj", "v_proj", "out_proj", "mlp", "fc1",
    "fc2", "attn2", "attn1", "attn",
)


def _peft_dotted(prefix: str, module: str) -> str:
    """Underscored module name -> dotted peft key (greedy longest-atom
    segmentation; pure digits stay as indices)."""
    parts: List[str] = []
    rest = module
    while rest:
        for atom in _PEFT_ATOMS:
            if rest == atom or rest.startswith(atom + "_"):
                parts.append(atom)
                rest = rest[len(atom) + 1:]
                break
        else:
            m = re.match(r"^(\d+)(?:_|$)", rest)
            if not m:
                raise ValueError(f"cannot segment peft module name: {module}")
            parts.append(m.group(1))
            rest = rest[m.end():]
    return ".".join([prefix] + parts)


def export_lora(
    path: str,
    flat: Dict[str, jnp.ndarray],
    trees: Dict[str, object],
    fmt: str = "kohya",
    metadata: Optional[Dict[str, str]] = None,
) -> None:
    """Write the trained factors as a .safetensors adapter the inference
    `--lora` path (io/lora.py) loads back exactly."""
    from safetensors.numpy import save_file

    tensors = lora_state_dict(flat, trees, fmt=fmt)
    save_file(tensors, path, metadata=metadata or {"format": "pt"})
