"""Reader for burn NamedMpkFileRecorder checkpoints (.mpk).

The reference stores converted weights as MessagePack named records at half
precision (NamedMpkFileRecorder<HalfPrecisionSettings>, convert/main.rs:65-70;
read back at sample/main.rs:28-51). The record tree mirrors the Rust module
field names; Vec fields are msgpack arrays; the UNet's block enum serializes
externally tagged ({"Conv": {...}}, {"Res": {...}}, ...).

burn's serde layout varies slightly across versions, so this reader is
structure-tolerant:
  - an optional {"item": ..., "metadata": ...} wrapper is unwrapped
  - Param wrappers {"id": ..., "param": ...} are unwrapped
  - tensor leaves are recognized as maps carrying "shape" plus one of
    "value" (number list), "bytes"/"data" (raw little-endian buffer)
  - half-precision payloads are detected via an explicit "dtype" field,
    byte-length arithmetic, or integer-valued u16 lists (f16 bits)
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
    "BF16": None,  # handled specially (numpy has no native bf16)
}


def _unwrap(node):
    while isinstance(node, dict):
        if set(node.keys()) <= {"item", "metadata"} and "item" in node:
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


def _decode_tensor(node) -> np.ndarray:
    shape = [int(s) for s in node["shape"]]
    n = int(np.prod(shape)) if shape else 1
    dtype_tag = node.get("dtype")

    raw = node.get("bytes", node.get("data"))
    if isinstance(raw, (bytes, bytearray, memoryview)):
        raw = bytes(raw)
        if dtype_tag == "BF16":
            u16 = np.frombuffer(raw, dtype="<u2")
            return (
                (u16.astype(np.uint32) << 16).view(np.float32).reshape(shape)
            )
        if dtype_tag in _DTYPES and _DTYPES[dtype_tag] is not None:
            return np.frombuffer(raw, dtype=_DTYPES[dtype_tag]).reshape(shape).astype(np.float32)
        itemsize = len(raw) // max(n, 1)
        dt = {2: np.float16, 4: np.float32, 8: np.float64}[itemsize]
        return np.frombuffer(raw, dtype=dt).reshape(shape).astype(np.float32)

    value = node["value"]
    arr = np.asarray(value)
    if arr.dtype.kind in "iu":
        # HalfPrecisionSettings: half::f16 serializes as its u16 bit pattern
        return arr.astype(np.uint16).view(np.float16).astype(np.float32).reshape(shape)
    return arr.astype(np.float32).reshape(shape)


class MpkSource(RecordSource):
    def __init__(self, node):
        self.node = _unwrap(node)

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
            raise KeyError(f"not an enum block node: {list(self.node)[:4]}")
        return _ENUM_TO_TYPE[v]

    def enum_inner(self) -> "MpkSource":
        return MpkSource(self.node[self.enum_variant()])

    # -- RecordSource ----------------------------------------------------------
    def child(self, name: str) -> "MpkSource":
        if not isinstance(self.node, dict) or name not in self.node:
            raise KeyError(name)
        return MpkSource(self.node[name])

    def opt_child(self, name: str) -> Optional["MpkSource"]:
        if isinstance(self.node, dict):
            v = self.node.get(name)
            if v is not None:
                return MpkSource(v)
        return None

    def tensor(self, name: str, ndim: int) -> np.ndarray:
        if not isinstance(self.node, dict) or self.node.get(name) is None:
            raise KeyError(name)
        leaf = _unwrap(self.node[name])
        if not _is_tensor_leaf(leaf):
            raise KeyError(f"{name} is not a tensor leaf")
        arr = _decode_tensor(leaf)
        if arr.ndim != ndim:
            arr = arr.reshape(arr.shape)  # shapes come from the record
        return arr

    def seq(self, name: str, alias: Optional[str] = None) -> List["MpkSource"]:
        v = self.node.get(name) if isinstance(self.node, dict) else None
        if not isinstance(v, (list, tuple)):
            raise KeyError(name)
        return [MpkSource(x) for x in v]


def parse_mpk_file(path: str) -> MpkSource:
    with open(path, "rb") as f:
        node = msgpack.unpack(f, raw=False, strict_map_key=False)
    return MpkSource(node)
