"""Minimal GGUF writer (F32/F16 tensors + metadata).

Used by tests to fabricate models and by conversion tooling (reference
analog: the export side of kt-kernel/scripts/convert_cpu_weights.py /
merge_cpu_weights.py). Quantized writing is out of scope — our runtime
formats are the QTensor packs, not ggml blocks.
"""

from __future__ import annotations

import struct

import numpy as np

from ktransformers_tpu.loader.gguf import GGML_NAMES


def _w_str(s: str) -> bytes:
    b = s.encode()
    return struct.pack("<Q", len(b)) + b


def _w_value(v) -> bytes:
    if isinstance(v, bool):
        return struct.pack("<I", 7) + struct.pack("<?", v)
    if isinstance(v, int):
        return struct.pack("<I", 5) + struct.pack("<i", v)
    if isinstance(v, float):
        return struct.pack("<I", 6) + struct.pack("<f", v)
    if isinstance(v, str):
        return struct.pack("<I", 8) + _w_str(v)
    if isinstance(v, (list, tuple)):
        if all(isinstance(x, str) for x in v):
            out = struct.pack("<I", 9) + struct.pack("<IQ", 8, len(v))
            for x in v:
                out += _w_str(x)
            return out
        if all(isinstance(x, int) for x in v):
            out = struct.pack("<I", 9) + struct.pack("<IQ", 5, len(v))
            for x in v:
                out += struct.pack("<i", x)
            return out
        if all(isinstance(x, float) for x in v):
            out = struct.pack("<I", 9) + struct.pack("<IQ", 6, len(v))
            for x in v:
                out += struct.pack("<f", x)
            return out
    raise TypeError(f"unsupported gguf metadata value {v!r}")


def write_gguf(path: str, metadata: dict, tensors: dict):
    """tensors: name -> np.ndarray (float32/float16) written in numpy
    (row-major) shape, or (raw_uint8_bytes, ggml_type_name, logical_shape)
    for pre-packed quantized blocks; dims are reversed into ggml order."""
    align = int(metadata.get("general.alignment", 32))
    header = struct.pack("<IIQQ", 0x46554747, 3, len(tensors), len(metadata))
    kv = b""
    for k, v in metadata.items():
        kv += _w_str(k) + _w_value(v)

    infos = b""
    blobs = []
    offset = 0
    for name, arr in tensors.items():
        if isinstance(arr, tuple):
            raw, tname, shape = arr
            blob = np.ascontiguousarray(np.asarray(raw, np.uint8)).tobytes()
            dims = tuple(reversed(shape))
        else:
            arr = np.ascontiguousarray(arr)
            tname = {"float32": "F32", "float16": "F16"}[str(arr.dtype)]
            dims = tuple(reversed(arr.shape))
            blob = arr.tobytes()
        infos += _w_str(name)
        infos += struct.pack("<I", len(dims))
        infos += struct.pack(f"<{len(dims)}Q", *dims)
        infos += struct.pack("<IQ", GGML_NAMES[tname], offset)
        pad = (-len(blob)) % align
        blobs.append(blob + b"\x00" * pad)
        offset += len(blob) + pad

    body = header + kv + infos
    pad = (-len(body)) % align
    with open(path, "wb") as f:
        f.write(body + b"\x00" * pad)
        for blob in blobs:
            f.write(blob)
