"""LoRA checkpoint loading and load-time weight merging.

Capability extension over the reference (which has no adapter support;
its only weight path is the npy dump + convert, SURVEY.md §2): standard
SDXL/SD LoRA files merge into the parameter pytrees at load time.
Merging (W += scale * alpha/r * up @ down) is the TPU-friendly approach —
zero runtime cost, no extra HBM traffic per step — and is exact for
inference (adapters only matter as separate factors during training).

Supported key formats (auto-detected per key):
  - kohya-ss / sd-scripts (the civitai-dominant format):
      lora_unet_<module>_{lora_down,lora_up}.weight + .alpha
      lora_te_/lora_te1_/lora_te2_<module>... for the text encoder(s)
    where <module> is the underscored module path in either diffusers
    naming (down_blocks_0_attentions_0_...) or sgm/ldm naming
    (input_blocks_4_1_...) — kohya's SDXL trainer emits the latter.
  - diffusers / PEFT:
      unet.<module>.lora_A.weight / lora_B.weight  (A=down, B=up)
      text_encoder. / text_encoder_2. prefixes for the towers
    and the older ".lora.down.weight/.lora.up.weight" spelling.

Targets covered: every linear the standard trainers touch (attention
q/k/v/out, GEGLU ff, proj_in/out, time_emb_proj) plus LoCon-style 1x1 and
3x3 convolution adapters on the res blocks.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..utils import log


@dataclass
class LoRAEntry:
    down: np.ndarray  # [r, in] linear | [r, in, kh, kw] conv
    up: np.ndarray    # [out, r]      | [out, r, 1, 1]
    alpha: Optional[float]  # None -> alpha = r (kohya default)

    @property
    def rank(self) -> int:
        return self.down.shape[0]

    def delta(self, scale: float) -> np.ndarray:
        """Merged weight delta in torch orientation ([out, in] linear or
        OIHW conv), f32."""
        a = self.rank if self.alpha is None else self.alpha
        s = scale * (a / self.rank)
        up = self.up.astype(np.float32)
        down = self.down.astype(np.float32)
        if down.ndim == 2:
            return s * (up @ down)
        # conv adapter: up [out, r, 1, 1], down [r, in, kh, kw]
        return s * np.einsum("or,rihw->oihw", up[:, :, 0, 0], down)


# ---------------------------------------------------------------------------
# file parsing -> {canonical underscored module: LoRAEntry}
# ---------------------------------------------------------------------------

# suffix spellings: (down, up, alpha) per convention
_SUFFIXES = [
    (".lora_down.weight", ".lora_up.weight", ".alpha"),   # kohya
    (".lora_A.weight", ".lora_B.weight", ".alpha"),       # peft
    (".lora.down.weight", ".lora.up.weight", ".alpha"),   # old diffusers
]


def parse_lora_tensors(
    tensors: Dict[str, np.ndarray],
) -> Tuple[Dict[str, LoRAEntry], List[str]]:
    """Group raw file tensors into canonical entries.

    Canonical module key = tower prefix ('unet'|'te1'|'te2') + '%' +
    the module path with every separator as '_'. Returns (entries,
    unrecognized_keys).
    """
    raw: Dict[str, dict] = {}
    bad: List[str] = []
    for key, val in tensors.items():
        matched = False
        for down_sfx, up_sfx, alpha_sfx in _SUFFIXES:
            for sfx, slot in ((down_sfx, "down"), (up_sfx, "up"),
                              (alpha_sfx, "alpha")):
                if key.endswith(sfx):
                    base = key[: -len(sfx)]
                    raw.setdefault(base, {})[slot] = val
                    matched = True
                    break
            if matched:
                break
        if not matched:
            bad.append(key)

    entries: Dict[str, LoRAEntry] = {}
    for base, slots in raw.items():
        if "down" not in slots or "up" not in slots:
            bad.append(base)
            continue
        canon = _canonical_module(base)
        if canon is None:
            bad.append(base)
            continue
        alpha = slots.get("alpha")
        entries[canon] = LoRAEntry(
            down=np.asarray(slots["down"]),
            up=np.asarray(slots["up"]),
            alpha=float(np.asarray(alpha)) if alpha is not None else None,
        )
    return entries, bad


def _canonical_module(base: str) -> Optional[str]:
    """Normalize a base key to 'tower%underscored_module'."""
    b = base.replace(".", "_")
    for prefix, tower in (
        ("lora_unet_", "unet"),
        ("lora_te1_", "te1"),
        ("lora_te2_", "te2"),
        ("lora_te_", "te1"),
        ("lora_transformer_", "transformer"),
        ("transformer_", "transformer"),
        ("unet_", "unet"),
        ("text_encoder_2_", "te2"),
        ("text_encoder_", "te1"),
    ):
        if b.startswith(prefix):
            return f"{tower}%{b[len(prefix):]}"
    return None


# ---------------------------------------------------------------------------
# module path resolution into the parameter pytrees
# ---------------------------------------------------------------------------

# within a SpatialTransformer: underscored module suffix -> tree path
_T_REST = [
    (re.compile(r"^transformer_blocks_(\d+)_attn([12])_to_q$"),
     lambda m: ("blocks", int(m.group(1)), f"attn{m.group(2)}", "q")),
    (re.compile(r"^transformer_blocks_(\d+)_attn([12])_to_k$"),
     lambda m: ("blocks", int(m.group(1)), f"attn{m.group(2)}", "k")),
    (re.compile(r"^transformer_blocks_(\d+)_attn([12])_to_v$"),
     lambda m: ("blocks", int(m.group(1)), f"attn{m.group(2)}", "v")),
    (re.compile(r"^transformer_blocks_(\d+)_attn([12])_to_out_0$"),
     lambda m: ("blocks", int(m.group(1)), f"attn{m.group(2)}", "out")),
    (re.compile(r"^transformer_blocks_(\d+)_ff_net_0_proj$"),
     lambda m: ("blocks", int(m.group(1)), "mlp", "proj")),
    (re.compile(r"^transformer_blocks_(\d+)_ff_net_2$"),
     lambda m: ("blocks", int(m.group(1)), "mlp", "lin")),
    (re.compile(r"^proj_in$"), lambda m: ("proj_in",)),
    (re.compile(r"^proj_out$"), lambda m: ("proj_out",)),
]

# within a ResBlock: both diffusers and sgm/ldm member names
_R_REST = [
    (re.compile(r"^(conv1|in_layers_2)$"), lambda m: ("conv_in",)),
    (re.compile(r"^(conv2|out_layers_3)$"), lambda m: ("conv_out",)),
    (re.compile(r"^(time_emb_proj|emb_layers_1)$"), lambda m: ("lin_embed",)),
    (re.compile(r"^(conv_shortcut|skip_connection)$"), lambda m: ("skip",)),
]


def _match_rest(rest: str, table) -> Optional[tuple]:
    for rx, fn in table:
        m = rx.match(rest)
        if m:
            return fn(m)
    return None


def _resolve_unet(module: str) -> Optional[tuple]:
    """Underscored UNet module -> path tuple into the unet param tree.

    Block indices: diffusers down_blocks.L pairs attentions.j/resnets.j
    with input_blocks[1 + 3L + j] (conv_in plus, per earlier level, two
    res blocks and a downsampler — every level below L has one);
    up_blocks.i maps 3 resnets per level onto output_blocks[3i + j]
    (io/diffusers_sdxl.py:13-16 documents the same correspondence).
    """
    for rx, fn in (
        # --- diffusers naming ---
        (re.compile(r"^down_blocks_(\d+)_attentions_(\d+)_(.+)$"),
         lambda m: _t(("input_blocks", 1 + 3 * int(m.group(1)) + int(m.group(2))),
                      m.group(3))),
        (re.compile(r"^mid_block_attentions_0_(.+)$"),
         lambda m: _t(("middle_block",), m.group(1))),
        (re.compile(r"^up_blocks_(\d+)_attentions_(\d+)_(.+)$"),
         lambda m: _t(("output_blocks", 3 * int(m.group(1)) + int(m.group(2))),
                      m.group(3))),
        (re.compile(r"^down_blocks_(\d+)_resnets_(\d+)_(.+)$"),
         lambda m: _r(("input_blocks", 1 + 3 * int(m.group(1)) + int(m.group(2))),
                      m.group(3))),
        (re.compile(r"^mid_block_resnets_([01])_(.+)$"),
         lambda m: _r_mid(int(m.group(1)), m.group(2))),
        (re.compile(r"^up_blocks_(\d+)_resnets_(\d+)_(.+)$"),
         lambda m: _r(("output_blocks", 3 * int(m.group(1)) + int(m.group(2))),
                      m.group(3))),
        # --- sgm/ldm naming (kohya SDXL trainer) ---
        (re.compile(r"^input_blocks_(\d+)_1_(.+)$"),
         lambda m: _t(("input_blocks", int(m.group(1))), m.group(2))),
        (re.compile(r"^middle_block_1_(.+)$"),
         lambda m: _t(("middle_block",), m.group(1))),
        (re.compile(r"^output_blocks_(\d+)_1_(.+)$"),
         lambda m: _t(("output_blocks", int(m.group(1))), m.group(2))),
        (re.compile(r"^input_blocks_(\d+)_0_(.+)$"),
         lambda m: _r(("input_blocks", int(m.group(1))), m.group(2))),
        (re.compile(r"^middle_block_([02])_(.+)$"),
         lambda m: _r_mid(int(m.group(1)) // 2, m.group(2))),
        (re.compile(r"^output_blocks_(\d+)_0_(.+)$"),
         lambda m: _r(("output_blocks", int(m.group(1))), m.group(2))),
    ):
        m = rx.match(module)
        if m:
            return fn(m)
    return None


def _t(block_path: tuple, rest: str) -> Optional[tuple]:
    sub = _match_rest(rest, _T_REST)
    return None if sub is None else block_path + ("transformer",) + sub


def _r(block_path: tuple, rest: str) -> Optional[tuple]:
    sub = _match_rest(rest, _R_REST)
    return None if sub is None else block_path + ("res",) + sub


def _r_mid(idx: int, rest: str) -> Optional[tuple]:
    sub = _match_rest(rest, _R_REST)
    return None if sub is None else ("middle_block", f"res{idx + 1}") + sub


_TE_RX = [
    (re.compile(r"^text_model_encoder_layers_(\d+)_self_attn_(q|k|v)_proj$"),
     lambda m: ("blocks", int(m.group(1)), "attn", m.group(2))),
    (re.compile(r"^text_model_encoder_layers_(\d+)_self_attn_out_proj$"),
     lambda m: ("blocks", int(m.group(1)), "attn", "out")),
    (re.compile(r"^text_model_encoder_layers_(\d+)_mlp_fc([12])$"),
     lambda m: ("blocks", int(m.group(1)), "mlp", f"fc{m.group(2)}")),
]


def _resolve_te(module: str) -> Optional[tuple]:
    return _match_rest(module, _TE_RX)


# --- SD3 (MMDiT) / Flux transformer towers -------------------------------
# diffusers/peft naming: transformer.transformer_blocks.{i}.attn.to_q etc.
# Our pytree keys mirror the diffusers module names, so resolution is a
# near-identity walk (models/mmdit.py, models/flux.py).
_TR_RX = [
    (re.compile(r"^transformer_blocks_(\d+)_attn(2?)_"
                r"(to_q|to_k|to_v|add_q_proj|add_k_proj|add_v_proj"
                r"|to_add_out)$"),
     lambda m: ("blocks", int(m.group(1)), f"attn{m.group(2)}", m.group(3))),
    (re.compile(r"^transformer_blocks_(\d+)_attn(2?)_to_out_0$"),
     lambda m: ("blocks", int(m.group(1)), f"attn{m.group(2)}", "to_out")),
    (re.compile(r"^transformer_blocks_(\d+)_ff(_context)?_net_0_proj$"),
     lambda m: ("blocks", int(m.group(1)),
                f"mlp{m.group(2) or ''}", "in")),
    (re.compile(r"^transformer_blocks_(\d+)_ff(_context)?_net_2$"),
     lambda m: ("blocks", int(m.group(1)),
                f"mlp{m.group(2) or ''}", "out")),
    (re.compile(r"^transformer_blocks_(\d+)_norm1(_context)?_linear$"),
     lambda m: ("blocks", int(m.group(1)),
                f"norm1{m.group(2) or ''}", "mod")),
    # Flux single-stream blocks
    (re.compile(r"^single_transformer_blocks_(\d+)_attn_(to_q|to_k|to_v)$"),
     lambda m: ("single_blocks", int(m.group(1)), "attn", m.group(2))),
    (re.compile(r"^single_transformer_blocks_(\d+)_(proj_mlp|proj_out)$"),
     lambda m: ("single_blocks", int(m.group(1)), m.group(2))),
    (re.compile(r"^single_transformer_blocks_(\d+)_norm_linear$"),
     lambda m: ("single_blocks", int(m.group(1)), "norm", "mod")),
    # top-level projections (some trainers include them)
    (re.compile(r"^proj_out$"), lambda m: ("proj_out",)),
    (re.compile(r"^x_embedder$"), lambda m: ("x_embedder",)),
    (re.compile(r"^context_embedder$"), lambda m: ("context_embedder",)),
    (re.compile(r"^norm_out_linear$"), lambda m: ("norm_out", "mod")),
]


def _resolve_transformer(module: str):
    return _match_rest(module, _TR_RX)


# kohya/sd-scripts Flux naming uses the ORIGINAL BFL module layout, whose
# qkv (double) and qkv+mlp (single linear1) are FUSED single linears; the
# LoRA delta rows split exactly onto our separate projections
# (delta = up@down — row slices of a matmul are independent). The
# modulation linears map directly (the diffusers conversion applies no
# reorder to the block modulations, only to the final norm — which no
# trainer targets).
def _resolve_bfl_flux(module: str, hidden: int):
    def split3(paths):
        return [(p, (i * hidden, (i + 1) * hidden))
                for i, p in enumerate(paths)]

    m = re.match(r"^double_blocks_(\d+)_(img|txt)_(.+)$", module)
    if m:
        i, stream, rest = int(m.group(1)), m.group(2), m.group(3)
        if rest == "attn_qkv":
            names = (("to_q", "to_k", "to_v") if stream == "img"
                     else ("add_q_proj", "add_k_proj", "add_v_proj"))
            return split3([("blocks", i, "attn", n) for n in names])
        table = {
            "attn_proj": ("attn", "to_out" if stream == "img"
                          else "to_add_out"),
            "mlp_0": ("mlp" if stream == "img" else "mlp_context", "in"),
            "mlp_2": ("mlp" if stream == "img" else "mlp_context", "out"),
            "mod_lin": ("norm1" if stream == "img" else "norm1_context",
                        "mod"),
        }
        if rest in table:
            return ("blocks", i) + table[rest]
        return None
    m = re.match(r"^single_blocks_(\d+)_(.+)$", module)
    if m:
        i, rest = int(m.group(1)), m.group(2)
        if rest == "linear1":  # fused [q | k | v | mlp] rows
            return (split3([("single_blocks", i, "attn", n)
                            for n in ("to_q", "to_k", "to_v")])
                    + [(("single_blocks", i, "proj_mlp"),
                        (3 * hidden, None))])
        if rest == "linear2":
            return ("single_blocks", i, "proj_out")
        if rest == "modulation_lin":
            return ("single_blocks", i, "norm", "mod")
    return None


def _tree_leaf(tree, path: tuple):
    node = tree
    for p in path:
        if isinstance(p, int):
            if not isinstance(node, (list, tuple)) or p >= len(node):
                return None
            node = node[p]
        else:
            if not isinstance(node, dict) or p not in node:
                return None
            node = node[p]
    return node


# ---------------------------------------------------------------------------
# merging
# ---------------------------------------------------------------------------

def _merge_into(leaf: dict, entry: LoRAEntry, scale: float, canon: str,
                rows: Optional[tuple] = None) -> None:
    """Add the LoRA delta into a {'w': ...} leaf in place (f32 math).

    rows = (start, end) slices the delta's OUTPUT rows first — the
    fused-projection formats (BFL Flux qkv / linear1) train one linear
    whose row blocks land on our separate projections."""
    w = leaf["w"]
    delta = entry.delta(scale)  # [out, in] or OIHW
    if rows is not None:
        delta = delta[rows[0]:rows[1]]
    if delta.ndim == 2:
        if w.ndim == 4:  # 1x1-conv-stored linear (VAE-style HWIO)
            delta = delta.T[None, None]
        else:
            delta = delta.T  # our linears store [in, out]
    else:
        delta = np.transpose(delta, (2, 3, 1, 0))  # OIHW -> HWIO
    if delta.shape != w.shape:
        raise ValueError(
            f"LoRA shape mismatch at {canon}: delta {delta.shape} vs "
            f"weight {tuple(w.shape)} — adapter trained for a different "
            f"architecture?"
        )
    leaf["w"] = (w.astype(jnp.float32) + jnp.asarray(delta)).astype(w.dtype)


def apply_lora(
    entries: Dict[str, LoRAEntry],
    unet=None,
    te1=None,
    te2=None,
    transformer=None,
    scale: float = 1.0,
) -> Dict[str, list]:
    """Merge parsed LoRA entries into parameter trees in place.

    unet/te1/te2 are the framework pytrees (te1 = CLIP ViT-L tree, te2 =
    OpenCLIP bigG tree); transformer is the MMDiT (SD3) or Flux tree —
    diffusers 'transformer.*' keys resolve into it, and kohya BFL-named
    Flux keys (which arrive under the 'unet' prefix) fall through to it
    when no UNet is loaded. Returns {'applied': [...], 'skipped': [...]}.
    """
    hidden = 0
    if transformer is not None:
        hidden = int(np.shape(
            transformer["blocks"][0]["attn"]["to_q"]["w"])[-1])
    applied, skipped = [], []
    for canon, entry in sorted(entries.items()):
        tower, module = canon.split("%", 1)
        if tower == "transformer":
            tree, path = transformer, _resolve_transformer(module)
        elif tower == "unet":
            if unet is None and transformer is not None:
                tree, path = transformer, _resolve_bfl_flux(module, hidden)
            else:
                tree, path = unet, _resolve_unet(module)
        elif tower == "te1":
            tree, path = te1, _resolve_te(module)
        else:
            tree, path = te2, _resolve_te(module)
        if tree is None or path is None:
            skipped.append(canon)
            continue
        # fused-projection formats resolve to [(path, (row0, row1)), ...]
        targets = path if isinstance(path, list) else [(path, None)]
        leaves = [(_tree_leaf(tree, p), rows) for p, rows in targets]
        if any(lf is None or not isinstance(lf, dict) or "w" not in lf
               for lf, _ in leaves):
            skipped.append(canon)
            continue
        for leaf, rows in leaves:
            _merge_into(leaf, entry, scale, canon, rows=rows)
        applied.append(canon)
    return {"applied": applied, "skipped": skipped}


def load_lora_file(path: str) -> Dict[str, LoRAEntry]:
    """Read a .safetensors LoRA file into parsed entries."""
    from safetensors.numpy import load_file

    entries, bad = parse_lora_tensors(load_file(path))
    if not entries:
        raise ValueError(
            f"{path}: no LoRA tensors recognized "
            f"({len(bad)} unrecognized keys, e.g. {bad[:3]})"
        )
    if bad:
        log(f"lora {path}: {len(bad)} unrecognized keys ignored (e.g. {bad[:3]})")
    return entries


def parse_lora_specs(specs) -> List[Tuple[str, float]]:
    """CLI 'PATH[:SCALE]' specs -> (path, scale) pairs.

    A spec that names an existing file verbatim is NEVER split: a filename
    containing a colon followed by digits (style:2.safetensors) loads as a
    path rather than misparsing as PATH:SCALE. Shared by the sample and
    serve CLIs."""
    import os

    out = []
    for spec in specs:
        path, sep, scale = spec.rpartition(":")
        if sep and path and not os.path.exists(spec):
            try:
                out.append((path, float(scale)))
                continue
            except ValueError:
                pass
        out.append((spec, 1.0))
    return out


def apply_lora_files(
    loras: List[Tuple[str, float]],
    unet=None,
    te1=None,
    te2=None,
    transformer=None,
) -> None:
    """Load and merge a list of (path, scale) LoRA files, logging a summary."""
    for path, scale in loras:
        entries = load_lora_file(path)
        stats = apply_lora(entries, unet=unet, te1=te1, te2=te2,
                           transformer=transformer, scale=scale)
        log(
            f"lora {path} (scale {scale}): merged {len(stats['applied'])} "
            f"modules, skipped {len(stats['skipped'])}"
        )
        if stats["skipped"]:
            log(f"  skipped e.g.: {stats['skipped'][:5]}")
        if not stats["applied"]:
            raise ValueError(
                f"{path}: no LoRA modules matched the loaded model "
                f"(first skipped: {stats['skipped'][:3]})"
            )
