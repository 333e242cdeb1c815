"""GGUF container + ggml block decoder tests.

Packers here are written directly from the ggml block-format spec (scalar,
per-element) and act as independent twins of the vectorized decoders in
loader/gguf.py.
"""

import struct

import numpy as np
import pytest

from ktransformers_tpu.loader.gguf import (
    GGML_NAMES,
    GGUFFile,
    decode_ggml,
)


# --- scalar packers (independent reference implementations) ---------------


def _pack_f16(x):
    return np.float16(x).tobytes()


def pack_q8_0(values):  # [n*32]
    out = b""
    for blk in values.reshape(-1, 32):
        d = np.abs(blk).max() / 127.0 or 1e-8
        q = np.round(blk / d).astype(np.int8)
        out += _pack_f16(d) + q.tobytes()
    return np.frombuffer(out, np.uint8)


def pack_q4_0(values):
    out = b""
    for blk in values.reshape(-1, 32):
        d = np.abs(blk).max() / -8.0
        d = d if d != 0 else 1e-8
        q = np.clip(np.round(blk / d) + 8, 0, 15).astype(np.uint8)
        bytes_ = (q[:16] | (q[16:] << 4)).astype(np.uint8)
        out += _pack_f16(d) + bytes_.tobytes()
    return np.frombuffer(out, np.uint8)


def pack_q4_k(rng, n_blocks):
    """Random Q4_K blocks; returns (raw bytes, expected values [n, 256])."""
    raw = b""
    expected = []
    for _ in range(n_blocks):
        d = rng.uniform(0.01, 0.1)
        dmin = rng.uniform(0.0, 0.05)
        sc = rng.integers(0, 64, 8)
        mn = rng.integers(0, 64, 8)
        q = rng.integers(0, 16, 256)
        # pack 6-bit scales into 12 bytes (ggml layout)
        sb = np.zeros(12, np.uint8)
        for j in range(4):
            sb[j] = (sc[j] & 63) | ((sc[j + 4] >> 4) << 6)
            sb[j + 4] = (mn[j] & 63) | ((mn[j + 4] >> 4) << 6)
            sb[j + 8] = (sc[j + 4] & 0xF) | ((mn[j + 4] & 0xF) << 4)
        qs = np.zeros(128, np.uint8)
        for c in range(4):
            lo = q[64 * c : 64 * c + 32]
            hi = q[64 * c + 32 : 64 * c + 64]
            qs[32 * c : 32 * (c + 1)] = lo | (hi << 4)
        raw += _pack_f16(d) + _pack_f16(dmin) + sb.tobytes() + qs.tobytes()
        dd = np.float32(np.float16(d))
        dm = np.float32(np.float16(dmin))
        vals = np.empty(256, np.float32)
        for sub in range(8):
            vals[32 * sub : 32 * (sub + 1)] = (
                dd * sc[sub] * q[32 * sub : 32 * (sub + 1)] - dm * mn[sub]
            )
        expected.append(vals)
    return np.frombuffer(raw, np.uint8), np.stack(expected)


def pack_q6_k(rng, n_blocks):
    raw = b""
    expected = []
    for _ in range(n_blocks):
        d = rng.uniform(0.01, 0.1)
        scales = rng.integers(-50, 50, 16).astype(np.int8)
        q = rng.integers(-32, 32, 256)  # stored as q+32 in 6 bits
        qstore = (q + 32).astype(np.uint8)
        ql = np.zeros(128, np.uint8)
        qh = np.zeros(64, np.uint8)
        for half in range(2):
            base = 128 * half
            for l in range(32):
                q1, q2 = qstore[base + l], qstore[base + 32 + l]
                q3, q4 = qstore[base + 64 + l], qstore[base + 96 + l]
                ql[64 * half + l] = (q1 & 0xF) | ((q3 & 0xF) << 4)
                ql[64 * half + 32 + l] = (q2 & 0xF) | ((q4 & 0xF) << 4)
                qh[32 * half + l] = (
                    (q1 >> 4) | ((q2 >> 4) << 2) | ((q3 >> 4) << 4) | ((q4 >> 4) << 6)
                )
        raw += ql.tobytes() + qh.tobytes() + scales.tobytes() + _pack_f16(d)
        dd = np.float32(np.float16(d))
        vals = dd * scales.astype(np.float32)[np.arange(256) // 16] * q
        expected.append(vals.astype(np.float32))
    return np.frombuffer(raw, np.uint8), np.stack(expected)


def pack_q2_k(rng, n_blocks):
    raw = b""
    expected = []
    for _ in range(n_blocks):
        d = rng.uniform(0.01, 0.1)
        dmin = rng.uniform(0.0, 0.05)
        sc = rng.integers(0, 16, 16)
        mn = rng.integers(0, 16, 16)
        q = rng.integers(0, 4, 256)
        scales = (sc | (mn << 4)).astype(np.uint8)
        qs = np.zeros(64, np.uint8)
        for half in range(2):
            for j in range(4):
                for l in range(32):
                    qs[32 * half + l] |= q[128 * half + 32 * j + l] << (2 * j)
        raw += scales.tobytes() + qs.tobytes() + _pack_f16(d) + _pack_f16(dmin)
        dd = np.float32(np.float16(d))
        dm = np.float32(np.float16(dmin))
        idx = np.arange(256) // 16
        vals = dd * sc[idx] * q - dm * mn[idx]
        expected.append(vals.astype(np.float32))
    return np.frombuffer(raw, np.uint8), np.stack(expected)


def pack_q5_k(rng, n_blocks):
    raw = b""
    expected = []
    for _ in range(n_blocks):
        d = rng.uniform(0.01, 0.1)
        dmin = rng.uniform(0.0, 0.05)
        sc = rng.integers(0, 64, 8)
        mn = rng.integers(0, 64, 8)
        q = rng.integers(0, 32, 256)
        sb = np.zeros(12, np.uint8)
        for j in range(4):
            sb[j] = (sc[j] & 63) | ((sc[j + 4] >> 4) << 6)
            sb[j + 4] = (mn[j] & 63) | ((mn[j + 4] >> 4) << 6)
            sb[j + 8] = (sc[j + 4] & 0xF) | ((mn[j + 4] & 0xF) << 4)
        qs = np.zeros(128, np.uint8)
        qh = np.zeros(32, np.uint8)
        for c in range(4):
            lo = q[64 * c : 64 * c + 32]
            hi = q[64 * c + 32 : 64 * c + 64]
            qs[32 * c : 32 * (c + 1)] = (lo & 0xF) | ((hi & 0xF) << 4)
            qh |= ((lo >> 4) << (2 * c)).astype(np.uint8)
            qh |= ((hi >> 4) << (2 * c + 1)).astype(np.uint8)
        raw += (
            _pack_f16(d) + _pack_f16(dmin) + sb.tobytes() + qh.tobytes()
            + qs.tobytes()
        )
        dd = np.float32(np.float16(d))
        dm = np.float32(np.float16(dmin))
        vals = np.empty(256, np.float32)
        for sub in range(8):
            vals[32 * sub : 32 * (sub + 1)] = (
                dd * sc[sub] * q[32 * sub : 32 * (sub + 1)] - dm * mn[sub]
            )
        expected.append(vals)
    return np.frombuffer(raw, np.uint8), np.stack(expected)


def pack_q3_k(rng, n_blocks):
    raw = b""
    expected = []
    for _ in range(n_blocks):
        d = rng.uniform(0.01, 0.1)
        sc = rng.integers(-32, 32, 16)  # stored +32 as 6-bit
        scu = (sc + 32).astype(np.uint8)
        q = rng.integers(-4, 4, 256)
        hbit = (q >= 0).astype(np.uint8)  # q stored as low2 + (hm ? 0 : -4)
        low2 = np.where(q >= 0, q, q + 4).astype(np.uint8)
        sb = np.zeros(12, np.uint8)
        for j in range(8):
            sb[j] = (scu[j] & 0xF) | ((scu[j + 8] & 0xF) << 4)
        for j in range(16):
            sb[8 + (j % 4)] |= (scu[j] >> 4) << (2 * (j // 4))
        qs = np.zeros(64, np.uint8)
        hm = np.zeros(32, np.uint8)
        for half in range(2):
            for j in range(4):
                for l in range(32):
                    e = 128 * half + 32 * j + l
                    qs[32 * half + l] |= low2[e] << (2 * j)
                    hm[l] |= hbit[e] << (4 * half + j)
        raw += hm.tobytes() + qs.tobytes() + sb.tobytes() + _pack_f16(d)
        dd = np.float32(np.float16(d))
        vals = dd * sc.astype(np.float32)[np.arange(256) // 16] * q
        expected.append(vals.astype(np.float32))
    return np.frombuffer(raw, np.uint8), np.stack(expected)


# --- decoder tests ---------------------------------------------------------


def test_q8_0(rng):
    vals = rng.standard_normal(64).astype(np.float32)
    raw = pack_q8_0(vals)
    out = decode_ggml(raw, GGML_NAMES["Q8_0"])
    np.testing.assert_allclose(out, vals, atol=0.02)


def test_q4_0(rng):
    vals = rng.standard_normal(64).astype(np.float32)
    raw = pack_q4_0(vals)
    out = decode_ggml(raw, GGML_NAMES["Q4_0"])
    np.testing.assert_allclose(out, vals, atol=0.3)


@pytest.mark.parametrize(
    "packer,tname",
    [
        (pack_q2_k, "Q2_K"),
        (pack_q3_k, "Q3_K"),
        (pack_q4_k, "Q4_K"),
        (pack_q5_k, "Q5_K"),
        (pack_q6_k, "Q6_K"),
    ],
)
def test_k_quants_bit_exact(rng, packer, tname):
    raw, expected = packer(rng, 4)
    out = decode_ggml(raw, GGML_NAMES[tname]).reshape(4, 256)
    np.testing.assert_allclose(out, expected, rtol=1e-6, atol=1e-6)


def test_f16_bf16(rng):
    vals = rng.standard_normal(32).astype(np.float16)
    out = decode_ggml(np.frombuffer(vals.tobytes(), np.uint8), GGML_NAMES["F16"])
    np.testing.assert_array_equal(out, vals.astype(np.float32))

    vb = rng.standard_normal(32).astype(np.float32)
    bf = (vb.view(np.uint32) >> 16).astype(np.uint16)
    out = decode_ggml(np.frombuffer(bf.tobytes(), np.uint8), GGML_NAMES["BF16"])
    expected = (bf.astype(np.uint32) << 16).view(np.float32)
    np.testing.assert_array_equal(out, expected)


# --- container test --------------------------------------------------------


def _w_str(s):
    b = s.encode()
    return struct.pack("<Q", len(b)) + b


def test_container_roundtrip(tmp_path, rng):
    vals = rng.standard_normal((8, 64)).astype(np.float32)
    q8 = pack_q8_0(rng.standard_normal(256).astype(np.float32))

    header = struct.pack("<IIQQ", 0x46554747, 3, 2, 3)
    kv = b""
    kv += _w_str("general.architecture") + struct.pack("<I", 8) + _w_str("llama")
    kv += _w_str("llama.block_count") + struct.pack("<II", 4, 27)
    kv += (
        _w_str("tokenizer.ggml.tokens")
        + struct.pack("<I", 9)
        + struct.pack("<IQ", 8, 2)
        + _w_str("<s>")
        + _w_str("</s>")
    )
    t_info = b""
    t_info += _w_str("tensor.f32") + struct.pack("<I", 2) + struct.pack(
        "<QQ", 64, 8
    ) + struct.pack("<IQ", 0, 0)
    t_info += _w_str("tensor.q8") + struct.pack("<I", 1) + struct.pack(
        "<Q", 256
    ) + struct.pack("<IQ", 8, 2048)

    body = header + kv + t_info
    align = 32
    pad = (-len(body)) % align
    data = vals.tobytes() + b"\x00" * (2048 - vals.nbytes) + q8.tobytes()
    path = tmp_path / "test.gguf"
    path.write_bytes(body + b"\x00" * pad + data)

    gf = GGUFFile(str(path))
    assert gf.architecture == "llama"
    assert gf.fields["llama.block_count"] == 27
    assert gf.fields["tokenizer.ggml.tokens"] == ["<s>", "</s>"]
    assert gf.tensors["tensor.f32"].shape == (8, 64)
    np.testing.assert_array_equal(gf.load("tensor.f32"), vals)
    assert gf.tensors["tensor.q8"].type_name == "Q8_0"
    out = gf.load("tensor.q8")
    assert out.shape == (256,)
    gf.close()
