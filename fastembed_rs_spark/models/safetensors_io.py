"""Minimal safetensors reader (no dependency on the `safetensors` package).

The reference embeds the BGE-M3 sparse linear layer as a ~4 KB safetensors
blob and loads it at session build
(src/sparse_text_embedding/bgem3_weights.rs:16-43). The format is public and
simple: an 8-byte little-endian header length, a JSON header mapping tensor
name → {dtype, shape, data_offsets}, then the raw little-endian tensor bytes.

On Spark the weights travel to executors the same way the reference embeds
them in the binary: as package data (or a broadcast variable) — a few KB,
loaded once per worker by models.runtime.
"""

from __future__ import annotations

import json
import struct

import numpy as np

_DTYPES = {
    "F64": np.dtype("<f8"),
    "F32": np.dtype("<f4"),
    "F16": np.dtype("<f2"),
    "I64": np.dtype("<i8"),
    "I32": np.dtype("<i4"),
    "I16": np.dtype("<i2"),
    "I8": np.dtype("i1"),
    "U8": np.dtype("u1"),
    "BOOL": np.dtype("?"),
}


def load_safetensors(data: bytes) -> dict[str, np.ndarray]:
    """Parse a safetensors blob into {name: ndarray}."""
    if len(data) < 8:
        raise ValueError("not a safetensors blob: shorter than the 8-byte header")
    (hlen,) = struct.unpack("<Q", data[:8])
    if 8 + hlen > len(data):
        raise ValueError("corrupt safetensors: header length exceeds blob size")
    header = json.loads(data[8 : 8 + hlen].decode("utf-8"))
    payload = data[8 + hlen :]
    out: dict[str, np.ndarray] = {}
    for name, meta in header.items():
        if name == "__metadata__":
            continue
        dt = _DTYPES.get(meta["dtype"])
        if dt is None:
            raise ValueError(f"unsupported safetensors dtype {meta['dtype']!r}")
        start, end = meta["data_offsets"]
        arr = np.frombuffer(payload[start:end], dtype=dt).reshape(meta["shape"])
        out[name] = arr
    return out


def save_safetensors(tensors: dict[str, np.ndarray]) -> bytes:
    """Serialize {name: ndarray} to a safetensors blob (tests / fixtures)."""
    rev = {v: k for k, v in _DTYPES.items()}
    header: dict[str, dict] = {}
    chunks: list[bytes] = []
    offset = 0
    for name, arr in tensors.items():
        le = arr.astype(arr.dtype.newbyteorder("<"), copy=False)
        raw = le.tobytes()
        header[name] = {
            "dtype": rev[np.dtype(arr.dtype.str.replace(">", "<"))],
            "shape": list(arr.shape),
            "data_offsets": [offset, offset + len(raw)],
        }
        chunks.append(raw)
        offset += len(raw)
    hjson = json.dumps(header).encode("utf-8")
    return struct.pack("<Q", len(hjson)) + hjson + b"".join(chunks)


def bgem3_sparse_linear(blob: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Extract the sparse-head linear layer (weight, bias) from a safetensors
    blob — the shape the reference's loader returns
    (bgem3_weights.rs:16-43): weight (H,) or (1,H), bias scalar or (1,).
    Token weight_i = relu(hidden_i · weight + bias)
    (src/sparse_text_embedding/impl.rs:256-304)."""
    t = load_safetensors(blob)
    try:
        w = t["sparse_linear.weight"]
        b = t["sparse_linear.bias"]
    except KeyError as e:
        raise KeyError(f"missing tensor {e} among {sorted(t)}") from None
    return np.asarray(w, dtype=np.float32).reshape(-1), np.float32(np.asarray(b).reshape(-1)[0])
