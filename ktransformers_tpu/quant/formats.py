"""Quantized tensor container + reference quantize/dequantize transforms.

Formats (the TPU re-design of the reference's kernel dtype matrix,
kt-kernel/python/experts.py:34-67):

| kind          | reference analog       | storage                 | scales              |
|---------------|------------------------|-------------------------|---------------------|
| ``bf16``      | BF16 native            | bf16                    | —                   |
| ``int8``      | AMXINT8                | int8                    | per-out-channel f32 |
| ``int4``      | AMXINT4 / RAWINT4      | uint8 (2 nibbles per b) | per-out-channel f32 |
| ``int4_g``    | K2 group-128 INT4      | uint8 packed            | per-group f32       |
| ``int4_gz``   | AWQ/GPTQ INT4 (asym)   | uint8 packed            | per-group f32+zero  |
| ``fp8``       | FP8 per-channel        | float8_e4m3fn           | per-out-channel f32 |
| ``mxfp4``     | MXFP4 (e2m1+ue8m0)     | uint8 e2m1 nibble codes | per-group-32 ue8m0  |

int4 values are nibble-packed along K with the *group-split* convention
(see pack_int4: within each scale group, low nibbles = first half rows,
high nibbles = second half) because the axon TPU runtime cannot take native
``jnp.int4`` arrays as jit arguments, and this layout lets the Pallas fused
dequant-matmul kernels unpack a block into two contiguous MXU dots.

Weight convention everywhere: weights are stored **[..., in_features,
out_features]** ("K, N") so they feed `x @ w` / `ragged_dot` directly; the
"out channel" scale axis is the last one. Symmetric int quantization matches
the reference scheme: per-column scale = absmax / qmax
(kt-kernel/operators/amx/la/amx_quantization.hpp semantics).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

INT_QMAX = {"int8": 127.0, "int4": 7.0, "int4_g": 7.0}

INT4_KINDS = ("int4", "int4_g", "int4_gz", "mxfp4")

# OCP MX block size (both mxfp4 and mxfp8 use 32-scalar blocks with a
# shared ue8m0 power-of-two scale; reference: fp4-moe.hpp / mxfp8-moe.hpp)
MX_GROUP = 32

# E2M1 representable magnitudes, indexed by the 3 magnitude bits
E2M1_VALUES = (0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0)
# decision midpoints between consecutive magnitudes (nearest-value encode)
_E2M1_MIDPOINTS = (0.25, 0.75, 1.25, 1.75, 2.5, 3.5, 5.0)


def pack_int4(q: jnp.ndarray, group_size: int = 0) -> jnp.ndarray:
    """Pack int values in [-8, 7] along axis -2 (K): [..., K, N] -> uint8
    [..., K/2, N] using the *group-split* convention: within each scale
    group of ``group_size`` rows (0 = the whole K axis is one group), the
    low nibble holds the first half of the group's rows and the high nibble
    the second half.

    This layout is chosen for the Pallas fused dequant-matmul kernels: a
    K-tile of one group unpacks into two contiguous row blocks, so the
    kernel computes y = x_lo @ lo + x_hi @ hi with no interleaving shuffle.
    """
    *lead, k, n = q.shape
    gs = group_size or k
    assert k % gs == 0 and gs % 2 == 0, (k, gs)
    q = q.astype(jnp.int32) & 0xF
    qg = q.reshape(*lead, k // gs, gs, n)
    lo = qg[..., : gs // 2, :]
    hi = qg[..., gs // 2 :, :]
    packed = (lo | (hi << 4)).astype(jnp.uint8)
    return packed.reshape(*lead, k // 2, n)


def unpack_int4(packed: jnp.ndarray, group_size: int = 0) -> jnp.ndarray:
    """Inverse of pack_int4 (same group-split convention): uint8
    [..., K/2, N] -> int8 [..., K, N], sign-extended."""
    *lead, k2, n = packed.shape
    k = k2 * 2
    gs = group_size or k
    b = packed.astype(jnp.int32).reshape(*lead, k // gs, gs // 2, n)
    lo = ((b & 0xF) ^ 8) - 8
    hi = (((b >> 4) & 0xF) ^ 8) - 8
    out = jnp.concatenate([lo, hi], axis=-2)  # [..., K/gs, gs, N]
    return out.reshape(*lead, k, n).astype(jnp.int8)


def unpack_uint4(packed: jnp.ndarray, group_size: int = 0) -> jnp.ndarray:
    """Like unpack_int4 but WITHOUT sign extension: uint8 [..., K/2, N] ->
    uint8 codes in [0, 15] [..., K, N] (mxfp4 e2m1 codes are a sign bit +
    magnitude, not two's complement)."""
    *lead, k2, n = packed.shape
    k = k2 * 2
    gs = group_size or k
    b = packed.astype(jnp.int32).reshape(*lead, k // gs, gs // 2, n)
    lo = b & 0xF
    hi = (b >> 4) & 0xF
    out = jnp.concatenate([lo, hi], axis=-2)
    return out.reshape(*lead, k, n).astype(jnp.uint8)


def e2m1_decode(codes: jnp.ndarray) -> jnp.ndarray:
    """uint8 e2m1 codes [0, 15] -> float32 values (code 8+m = -value(m))."""
    table = jnp.asarray(E2M1_VALUES + tuple(-v for v in E2M1_VALUES),
                        jnp.float32)
    return table[codes.astype(jnp.int32)]


def e2m1_encode(v: jnp.ndarray) -> jnp.ndarray:
    """float -> nearest e2m1 code (uint8 in [0, 15]); |v| > 6 saturates."""
    mag = jnp.abs(v)
    code = jnp.zeros(v.shape, jnp.int32)
    for m in _E2M1_MIDPOINTS:
        code = code + (mag >= m).astype(jnp.int32)
    return (code + jnp.where(v < 0, 8, 0)).astype(jnp.uint8)


def ue8m0_scale_exponent(absmax: jnp.ndarray, elem_max: float) -> jnp.ndarray:
    """Shared power-of-two block scale for MX formats: the largest 2^E with
    absmax / 2^E <= ~elem_max uses E = floor(log2(absmax)) -
    floor(log2(elem_max)), saturating encode (OCP MX convention)."""
    safe = jnp.maximum(absmax, 1e-30)
    e = jnp.floor(jnp.log2(safe)) - jnp.floor(jnp.log2(elem_max))
    return jnp.clip(e + 127.0, 0.0, 254.0).astype(jnp.uint8)


def split_x_for_int4(x: jnp.ndarray, k: int, group_size: int = 0):
    """Split activation columns to match the group-split nibble packing:
    returns (x_lo, x_hi) each [..., K/2] where x_lo aligns with low-nibble
    rows and x_hi with high-nibble rows."""
    *lead, xk = x.shape
    assert xk == k
    gs = group_size or k
    xg = x.reshape(*lead, k // gs, gs)
    x_lo = xg[..., : gs // 2].reshape(*lead, k // 2)
    x_hi = xg[..., gs // 2 :].reshape(*lead, k // 2)
    return x_lo, x_hi


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class QTensor:
    """A (possibly) quantized tensor pytree.

    data:   packed storage, shape [..., K, N] (int4/int8/fp8/bf16).
    scales: None (bf16) | [..., 1, N] per-channel | [..., K/G, N] per-group.
    zeros:  None | per-group zero points (same shape as scales), in quantized
            units (asymmetric formats only).
    kind:   static format tag.
    group_size: static; 0 = per-channel.
    """

    data: jnp.ndarray
    scales: jnp.ndarray | None
    zeros: jnp.ndarray | None
    kind: str = dataclasses.field(metadata=dict(static=True), default="bf16")
    group_size: int = dataclasses.field(metadata=dict(static=True), default=0)
    # int4 kinds only: data is stored with the low nibble OFFSET by +8
    # (lo_stored = lo_signed + 8, i.e. original packed byte ^ 0x08) so the
    # w4a8 Pallas kernels can bitcast a packed byte straight to
    # int8 = 16*hi_signed + lo_offset and recover both nibbles with one
    # VPU op + a dot identity (quant/w4a8.py). Set by w4a8.repack_offset_lo.
    act_quant: bool = dataclasses.field(metadata=dict(static=True), default=False)

    @property
    def shape(self):
        return self.data.shape

    @property
    def out_features(self) -> int:
        return self.data.shape[-1]

    @property
    def in_features(self) -> int:
        k = self.data.shape[-2]
        return k * 2 if self.kind in INT4_KINDS else k

    def astype_kind(self, dtype: Any) -> "QTensor":
        return dequantize(self, dtype)

    def nbytes(self) -> int:
        n = self.data.size * jnp.dtype(self.data.dtype).itemsize
        for t in (self.scales, self.zeros):
            if t is not None:
                n += t.size * jnp.dtype(t.dtype).itemsize
        return n


def _group_reshape(w: jnp.ndarray, group_size: int) -> jnp.ndarray:
    """[..., K, N] -> [..., K/G, G, N]"""
    *lead, k, n = w.shape
    assert k % group_size == 0, (k, group_size)
    return w.reshape(*lead, k // group_size, group_size, n)


def effective_group_size(k: int, group_size: int) -> int:
    """Largest even divisor of K that is <= the requested group size (small
    layers in tests / tiny models get clamped groups). Prefers divisors
    that are multiples of 16 so the group-split half (g/2) stays
    sublane-aligned for the Pallas kernels (e.g. K=10944 -> 96, not 114)."""
    g0 = min(group_size, k)
    g = g0
    while g >= 16 and (k % g != 0 or g % 16 != 0):
        g -= 1
    if g >= 16:
        return g
    g = g0
    while g > 2 and (k % g != 0 or g % 2 != 0):
        g -= 1
    return max(g, 2)


def quantize(
    w: jnp.ndarray, kind: str, group_size: int = 128, scale_dtype=jnp.float32
) -> QTensor:
    """Quantize a float weight [..., K, N] into the given format."""
    if kind in ("bf16", "fp16", "f32"):
        dt = {"bf16": jnp.bfloat16, "fp16": jnp.float16, "f32": jnp.float32}[kind]
        return QTensor(w.astype(dt), None, None, kind="bf16", group_size=0)
    if kind in ("int4_g", "int4_gz", "int8_g"):
        group_size = effective_group_size(w.shape[-2], group_size)

    wf = w.astype(jnp.float32)
    if kind in ("int8", "int4"):
        qmax = INT_QMAX[kind]
        absmax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)
        scales = jnp.maximum(absmax, 1e-10) / qmax
        q = jnp.clip(jnp.round(wf / scales), -qmax, qmax)
        data = q.astype(jnp.int8) if kind == "int8" else pack_int4(q)
        return QTensor(data, scales.astype(scale_dtype), None, kind=kind, group_size=0)

    if kind == "int4_g":
        g = _group_reshape(wf, group_size)
        absmax = jnp.max(jnp.abs(g), axis=-2, keepdims=True)
        scales = jnp.maximum(absmax, 1e-10) / 7.0
        q = jnp.clip(jnp.round(g / scales), -7, 7)
        *lead, kg, _, n = q.shape
        data = pack_int4(q.reshape(*lead, kg * group_size, n), group_size)
        return QTensor(
            data,
            scales.squeeze(-2).astype(scale_dtype),
            None,
            kind=kind,
            group_size=group_size,
        )

    if kind == "int8_g":
        g = _group_reshape(wf, group_size)
        absmax = jnp.max(jnp.abs(g), axis=-2, keepdims=True)
        scales = jnp.maximum(absmax, 1e-10) / 127.0
        q = jnp.clip(jnp.round(g / scales), -127, 127).astype(jnp.int8)
        *lead, kg, _, n = q.shape
        return QTensor(
            q.reshape(*lead, kg * group_size, n),
            scales.squeeze(-2).astype(scale_dtype),
            None,
            kind=kind,
            group_size=group_size,
        )

    if kind == "int4_gz":
        # Asymmetric: q = round(w/s) + z, q in [0, 15]; stored as q - 8.
        g = _group_reshape(wf, group_size)
        wmin = jnp.min(g, axis=-2, keepdims=True)
        wmax = jnp.max(g, axis=-2, keepdims=True)
        scales = jnp.maximum(wmax - wmin, 1e-10) / 15.0
        zeros = jnp.round(-wmin / scales)  # in [0, 15]
        q = jnp.clip(jnp.round(g / scales) + zeros, 0, 15) - 8
        *lead, kg, _, n = q.shape
        data = pack_int4(q.reshape(*lead, kg * group_size, n), group_size)
        return QTensor(
            data,
            scales.squeeze(-2).astype(scale_dtype),
            (zeros - 8).squeeze(-2).astype(scale_dtype),
            kind=kind,
            group_size=group_size,
        )

    if kind == "fp8":
        # float8_e4m3fn with per-out-channel scale (reference
        # fp8-perchannel-moe.hpp); max representable 448.
        absmax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)
        scales = jnp.maximum(absmax, 1e-10) / 448.0
        data = (wf / scales).astype(jnp.float8_e4m3fn)
        return QTensor(data, scales.astype(scale_dtype), None, kind=kind, group_size=0)

    if kind == "mxfp4":
        # OCP MXFP4: e2m1 nibble codes + shared ue8m0 (power-of-two) scale
        # per 32-scalar block along K (reference fp4-moe.hpp, used by
        # DeepSeek-V4-Flash routed experts).
        group_size = effective_group_size(wf.shape[-2], MX_GROUP)
        g = _group_reshape(wf, group_size)
        absmax = jnp.max(jnp.abs(g), axis=-2, keepdims=True)
        exp_u8 = ue8m0_scale_exponent(absmax, 6.0)
        scale = jnp.exp2(exp_u8.astype(jnp.float32) - 127.0)
        codes = e2m1_encode(g / scale)
        *lead, kg, _, n = codes.shape
        data = pack_int4(codes.reshape(*lead, kg * group_size, n), group_size)
        return QTensor(
            data, exp_u8.squeeze(-2), None, kind=kind, group_size=group_size
        )

    if kind == "mxfp8":
        # OCP MXFP8: e4m3fn elements + ue8m0 scale per 32-scalar block
        # (reference mxfp8-moe.hpp, MiniMax-M2-class models).
        group_size = effective_group_size(wf.shape[-2], MX_GROUP)
        g = _group_reshape(wf, group_size)
        absmax = jnp.max(jnp.abs(g), axis=-2, keepdims=True)
        exp_u8 = ue8m0_scale_exponent(absmax, 448.0)
        scale = jnp.exp2(exp_u8.astype(jnp.float32) - 127.0)
        # saturating encode: e4m3fn has no inf, values past 448 become NaN
        q = jnp.clip(g / scale, -448.0, 448.0).astype(jnp.float8_e4m3fn)
        *lead, kg, _, n = q.shape
        return QTensor(
            q.reshape(*lead, kg * group_size, n),
            exp_u8.squeeze(-2),
            None,
            kind=kind,
            group_size=group_size,
        )

    raise ValueError(f"unknown quant kind: {kind}")


def raw_int4_data(qt: QTensor) -> jnp.ndarray:
    """Packed int4 data in the canonical uint8 nibble encoding (undoes the
    w4a8 offset-lo int8 repack when qt.act_quant is set)."""
    if qt.act_quant:
        return jax.lax.bitcast_convert_type(qt.data, jnp.uint8) ^ jnp.uint8(8)
    return qt.data


GROUP_KINDS = ("int4_g", "int4_gz", "int8_g", "int8_gz", "mxfp4", "mxfp8")


def pad_scale_sublanes(qt: QTensor, multiple: int = 8) -> QTensor:
    """Pad the group axis of group-kind scales/zeros ([..., ng, N]) to a
    sublane multiple with zero rows.

    Why: on TPU, XLA lays out f32 [E, ng, N] with ng % 8 != 0 in a
    transposed (padding-free) layout, and then re-copies the WHOLE scale
    tensor to the row-major layout the Pallas kernels constrain — inside
    every decode step (measured: 26 x 9.1 us/step on the bench model,
    scripts/profile_decode3.py round 3). With ng padded to 8 the default
    layout already matches and the per-step copy disappears. The kernels
    and dequantize() slice back to the true ng; padded rows are never read.
    """
    if qt.kind not in GROUP_KINDS or qt.scales is None or qt.scales.ndim < 2:
        return qt
    ng = qt.scales.shape[-2]
    if ng % multiple == 0:
        return qt
    pad = multiple - ng % multiple
    widths = [(0, 0)] * (qt.scales.ndim - 2) + [(0, pad), (0, 0)]
    import dataclasses

    return dataclasses.replace(
        qt,
        scales=jnp.pad(qt.scales, widths),
        zeros=None if qt.zeros is None else jnp.pad(qt.zeros, widths),
    )


def true_group_count(qt: QTensor) -> int:
    """Number of REAL scale groups along K (scales may be sublane-padded)."""
    k = qt.in_features
    return k // (qt.group_size or k)


def dequantize(qt: QTensor, dtype=jnp.bfloat16) -> jnp.ndarray:
    """Reconstruct a dense float tensor [..., K, N]."""
    if qt.kind == "bf16" or qt.scales is None:
        return qt.data.astype(dtype)
    if qt.kind in ("int8", "fp8"):
        return (qt.data.astype(jnp.float32) * qt.scales).astype(dtype)
    if qt.kind == "int4":
        q = unpack_int4(raw_int4_data(qt), qt.group_size).astype(jnp.float32)
        return (q * qt.scales).astype(dtype)
    if qt.kind in ("int4_g", "int4_gz", "int8_g", "int8_gz"):
        if qt.kind.startswith("int4"):
            q = unpack_int4(raw_int4_data(qt), qt.group_size).astype(jnp.float32)
        else:
            q = qt.data.astype(jnp.float32)
        g = _group_reshape(q, qt.group_size)
        kg = g.shape[-3]  # scales may be sublane-padded past the true ng
        scales = qt.scales[..., :kg, :][..., :, None, :]
        if qt.kind.endswith("_gz"):
            g = g - qt.zeros[..., :kg, :][..., :, None, :]
        out = g * scales
        *lead, kg, gs, n = out.shape
        return out.reshape(*lead, kg * gs, n).astype(dtype)
    if qt.kind in ("mxfp4", "mxfp8"):
        if qt.kind == "mxfp4":
            q = e2m1_decode(unpack_uint4(qt.data, qt.group_size))
        else:
            q = qt.data.astype(jnp.float32)
        g = _group_reshape(q, qt.group_size)
        kg = g.shape[-3]  # scales may be sublane-padded past the true ng
        scale = jnp.exp2(
            qt.scales[..., :kg, :][..., :, None, :].astype(jnp.float32)
            - 127.0
        )
        out = g * scale
        *lead, kg, gs, n = out.shape
        return out.reshape(*lead, kg * gs, n).astype(dtype)
    raise ValueError(qt.kind)
