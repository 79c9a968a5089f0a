"""Reader for burn NamedMpkFileRecorder checkpoints (.mpk).

The reference stores converted weights as MessagePack named records at half
precision (NamedMpkFileRecorder<HalfPrecisionSettings>, convert/main.rs:65-70;
read back at sample/main.rs:28-51). The record tree mirrors the Rust module
field names; Vec fields are msgpack arrays; the UNet's block enum serializes
externally tagged ({"Conv": {...}}, {"Res": {...}}, ...).

burn 0.13's serde layout has several degrees of freedom (rmp_serde "named"
mode + the burn record item types), all of which this reader tolerates and
all of which are pinned by the fuzz matrix in tests/test_io.py:

  wrapper     BurnRecord {item, metadata} in either key order, or a bare item
  param       ParamSerde {id, param} wrappers, or bare tensor nodes
  tensor      DataSerialize {value, shape}; an extra single-key {data: ...}
              nesting (FloatTensorSerde); raw little-endian "bytes"/"data"
              buffers with an optional "dtype" tag
  f16 bits    HalfPrecisionSettings stores half::f16 as u16 bit patterns
              (integer lists) or as 2-byte raw buffers; BF16 as high-half bits
  enums       externally tagged {"Variant": inner} (rmp_serde named mode)
  Option      None -> msgpack nil; Some -> the value
  constants   ConstantRecord -> nil or empty map (skipped by the builders)

Every parse failure names the exact record path that failed plus the keys
present at that node, so a layout drift in a future burn version produces an
actionable error instead of a downstream shape mismatch.
"""

from __future__ import annotations

from typing import List, Optional

import msgpack
import numpy as np

from .record_source import RecordSource

_ENUM_TO_TYPE = {
    "Conv": "conv",
    "Res": "resnet",
    "Down": "downsample",
    "ResT": "resnet_transformer",
    "ResTU": "resnet_transformer_upsample",
    "ResU": "resnet_upsample",
}

_DTYPES = {
    "F16": np.float16, "f16": np.float16,
    "F32": np.float32, "f32": np.float32,
    "F64": np.float64, "f64": np.float64,
    "BF16": None, "bf16": None,  # handled specially (numpy has no native bf16)
}


class MpkParseError(ValueError):
    """A burn .mpk record did not match the expected layout.

    Carries the full record path so the failing node is identifiable."""


def _keys_of(node) -> str:
    if isinstance(node, dict):
        return f"map keys {sorted(str(k) for k in node)[:8]}"
    if isinstance(node, (list, tuple)):
        return f"array of {len(node)}"
    return f"{type(node).__name__} value"


def _unwrap(node):
    """Strip BurnRecord/ParamSerde wrappers (order-insensitive keys)."""
    while isinstance(node, dict):
        if "item" in node and set(node.keys()) <= {"item", "metadata"}:
            node = node["item"]
            continue
        if "param" in node and set(node.keys()) <= {"id", "param"}:
            node = node["param"]
            continue
        break
    return node


def _is_tensor_leaf(node) -> bool:
    return isinstance(node, dict) and "shape" in node and (
        "value" in node or "bytes" in node or "data" in node
    )


def _unwrap_tensor(node):
    """Unwrap down to a DataSerialize-shaped leaf, tolerating an extra
    single-key {"data": {...}} nesting (FloatTensorSerde's field)."""
    node = _unwrap(node)
    while (
        isinstance(node, dict)
        and not _is_tensor_leaf(node)
        and len(node) == 1
        and next(iter(node)) in ("data", "tensor", "value")
        and isinstance(next(iter(node.values())), dict)
    ):
        node = _unwrap(next(iter(node.values())))
    return node


def _decode_tensor(node, path: str) -> np.ndarray:
    shape = [int(s) for s in node["shape"]]
    n = int(np.prod(shape)) if shape else 1
    dtype_tag = node.get("dtype")

    raw = node.get("bytes", node.get("data"))
    if isinstance(raw, (bytes, bytearray, memoryview)):
        raw = bytes(raw)
        if dtype_tag in ("BF16", "bf16"):
            u16 = np.frombuffer(raw, dtype="<u2")
            arr = (u16.astype(np.uint32) << 16).view(np.float32)
        elif dtype_tag in _DTYPES and _DTYPES[dtype_tag] is not None:
            arr = np.frombuffer(raw, dtype=_DTYPES[dtype_tag]).astype(np.float32)
        else:
            itemsize = len(raw) // max(n, 1)
            if itemsize not in (2, 4, 8) or len(raw) != itemsize * n:
                raise MpkParseError(
                    f"{path}: raw tensor buffer of {len(raw)} bytes does not "
                    f"match shape {shape} at any of f16/f32/f64"
                )
            dt = {2: np.float16, 4: np.float32, 8: np.float64}[itemsize]
            arr = np.frombuffer(raw, dtype=dt).astype(np.float32)
    else:
        value = node.get("value")
        if value is None:
            raise MpkParseError(
                f"{path}: tensor leaf has neither value nor bytes ({_keys_of(node)})"
            )
        arr = np.asarray(value)
        if arr.dtype.kind in "iu":
            if dtype_tag in ("BF16", "bf16"):
                arr = (arr.astype(np.uint32) << 16).view(np.float32)
            else:
                # HalfPrecisionSettings: half::f16 serializes as u16 bits
                arr = arr.astype(np.uint16).view(np.float16).astype(np.float32)
        else:
            arr = arr.astype(np.float32)
        arr = arr.reshape(-1)

    if arr.size != n:
        raise MpkParseError(
            f"{path}: tensor payload has {arr.size} elements but shape "
            f"{shape} implies {n}"
        )
    return arr.reshape(shape)


class MpkSource(RecordSource):
    def __init__(self, node, path: str = "$"):
        self.node = _unwrap(node)
        self.path = path

    # -- enum handling (UNet block Vec entries) -------------------------------
    def enum_variant(self) -> Optional[str]:
        if isinstance(self.node, dict) and len(self.node) == 1:
            k = next(iter(self.node))
            if k in _ENUM_TO_TYPE:
                return k
        return None

    def block_type(self) -> str:
        v = self.enum_variant()
        if v is None:
            raise MpkParseError(
                f"{self.path}: expected an externally-tagged block enum "
                f"({'|'.join(_ENUM_TO_TYPE)}), found {_keys_of(self.node)}"
            )
        return _ENUM_TO_TYPE[v]

    def enum_inner(self) -> "MpkSource":
        v = self.enum_variant()
        if v is None:
            raise MpkParseError(
                f"{self.path}: expected an externally-tagged block enum, "
                f"found {_keys_of(self.node)}"
            )
        return MpkSource(self.node[v], f"{self.path}.{v}")

    # -- RecordSource ----------------------------------------------------------
    def child(self, name: str) -> "MpkSource":
        if not isinstance(self.node, dict) or name not in self.node:
            raise KeyError(
                f"{self.path}.{name}: missing record field ({_keys_of(self.node)})"
            )
        return MpkSource(self.node[name], f"{self.path}.{name}")

    def opt_child(self, name: str) -> Optional["MpkSource"]:
        if isinstance(self.node, dict):
            v = self.node.get(name)
            if v is not None:  # Option::None serializes as msgpack nil
                return MpkSource(v, f"{self.path}.{name}")
        return None

    def tensor(self, name: str, ndim: int) -> np.ndarray:
        if not isinstance(self.node, dict) or self.node.get(name) is None:
            raise KeyError(
                f"{self.path}.{name}: missing tensor field ({_keys_of(self.node)})"
            )
        path = f"{self.path}.{name}"
        leaf = _unwrap_tensor(self.node[name])
        if not _is_tensor_leaf(leaf):
            raise MpkParseError(
                f"{path}: not a tensor leaf (need shape + value/bytes, "
                f"found {_keys_of(leaf)})"
            )
        arr = _decode_tensor(leaf, path)
        if arr.ndim != ndim:
            raise MpkParseError(
                f"{path}: expected a {ndim}-d tensor, record shape is "
                f"{list(arr.shape)}"
            )
        return arr

    def seq(self, name: str, alias: Optional[str] = None) -> List["MpkSource"]:
        v = self.node.get(name) if isinstance(self.node, dict) else None
        if not isinstance(v, (list, tuple)):
            raise KeyError(
                f"{self.path}.{name}: missing sequence field ({_keys_of(self.node)})"
            )
        return [
            MpkSource(x, f"{self.path}.{name}[{i}]") for i, x in enumerate(v)
        ]


def parse_mpk_file(path: str) -> MpkSource:
    with open(path, "rb") as f:
        node = msgpack.unpack(f, raw=False, strict_map_key=False)
    return MpkSource(node)


def _leaf_summary(leaf) -> str:
    """One-line description of a DataSerialize tensor leaf: shape, payload
    encoding and dtype tag, without materializing the array."""
    shape = [int(s) for s in leaf.get("shape", [])]
    tag = leaf.get("dtype")
    raw = leaf.get("bytes", leaf.get("data"))
    if isinstance(raw, (bytes, bytearray, memoryview)):
        enc = f"raw {len(bytes(raw))}B"
    elif "value" in leaf:
        v = leaf["value"]
        if isinstance(v, (list, tuple)) and v and isinstance(v[0], int):
            enc = "u16-bit list" if tag in (None, "F16", "f16") else "int list"
        else:
            enc = "float list"
    else:
        enc = "?"
    return f"tensor{shape} [{tag or 'untagged'}, {enc}]"


def inspect_mpk_lines(node, path: str = "$", max_depth: int = 64):
    """Yield one line per record node: keys, wrapper variants detected,
    tensor leaves (shape + dtype tag + payload encoding), block-enum
    variants. Diagnosis tool for first contact with a real burn artifact
    (the reader/writer pair was reverse-engineered from burn 0.13's serde;
    convert/main.rs:65-70): a field-name or layout drift shows up here as
    a readable tree instead of a deep parse error."""
    if max_depth < 0:
        yield f"{path}: ... (depth limit)"
        return
    wrappers = []
    while isinstance(node, dict):
        if "item" in node and set(node.keys()) <= {"item", "metadata"}:
            meta = node.get("metadata")
            wrappers.append(
                "BurnRecord" + (f"(metadata={meta})" if meta else "")
            )
            node = node["item"]
            continue
        if "param" in node and set(node.keys()) <= {"id", "param"}:
            wrappers.append("Param" + (f"(id={node.get('id')})" if node.get("id") else ""))
            node = node["param"]
            continue
        break
    w = (" <" + "+".join(wrappers) + ">") if wrappers else ""

    leaf = _unwrap_tensor(node)
    if _is_tensor_leaf(leaf):
        yield f"{path}{w}: {_leaf_summary(leaf)}"
        return
    if isinstance(node, dict):
        if len(node) == 1 and next(iter(node)) in _ENUM_TO_TYPE:
            variant = next(iter(node))
            yield (f"{path}{w}: block enum {variant} "
                   f"(type.txt '{_ENUM_TO_TYPE[variant]}')")
            yield from inspect_mpk_lines(
                node[variant], f"{path}.{variant}", max_depth - 1
            )
            return
        if not node:
            yield f"{path}{w}: {{}} (ConstantRecord)"
            return
        yield f"{path}{w}: record with {len(node)} fields"
        for k, v in node.items():
            yield from inspect_mpk_lines(v, f"{path}.{k}", max_depth - 1)
        return
    if isinstance(node, (list, tuple)):
        yield f"{path}{w}: sequence of {len(node)}"
        for i, v in enumerate(node):
            yield from inspect_mpk_lines(v, f"{path}[{i}]", max_depth - 1)
        return
    if node is None:
        yield f"{path}{w}: nil (Option::None / ConstantRecord)"
        return
    yield f"{path}{w}: {type(node).__name__} = {node!r}"


def inspect_mpk(path: str) -> str:
    """Full record-tree dump of a .mpk file (see inspect_mpk_lines)."""
    with open(path, "rb") as f:
        node = msgpack.unpack(f, raw=False, strict_map_key=False)
    return "\n".join(inspect_mpk_lines(node))
