"""GPTQ / AWQ checkpoint import: real quantized safetensors -> int4_gz.

The reference reads AutoGPTQ/AWQ checkpoints directly into its INT4
kernels (kt-kernel/python/utils/loader.py:515-1227). Here the packed
codes and per-group (scale, zero) pairs are carried LOSSLESSLY into the
framework's ``int4_gz`` format (codes stored q-8, zeros stored z-8, so
dequant = (q - z) * s — quant/formats.py:245-261); compute then runs on
the original checkpoint's integers.

Layouts handled (AutoGPTQ / AutoAWQ conventions):

GPTQ (per linear, logical weight [N out, K in]):
  qweight  int32 [K/8, N]   8 consecutive k per int32, LSB-first
  qzeros   int32 [G, N/8]   8 consecutive n per int32, LSB-first
  scales   f16   [G, N]
  g_idx    int32 [K]        k -> group map; only the trivial (monotonic
                            k // gs) order is supported — desc_act
                            checkpoints must be repacked upstream
  checkpoint_format "gptq" stores z-1 (the AutoGPTQ v1 off-by-one);
  "gptq_v2" stores z directly.

AWQ:
  qweight  int32 [K, N/8]   8 n per int32 in the interleave order
                            (0, 2, 4, 6, 1, 3, 5, 7) <- AWQ_ORDER
  qzeros   int32 [G, N/8]   same interleave
  scales   f16   [G, N]
"""

from __future__ import annotations

import json
import os

import numpy as np

# AWQ packs nibble i of an int32 with logical column offset AWQ_ORDER[i]
# (AutoAWQ's order_map; argsort of this is the [0,4,1,5,2,6,3,7] reverse
# map other loaders hardcode)
AWQ_ORDER = (0, 2, 4, 6, 1, 3, 5, 7)


def _unpack_int32_nibbles(a: np.ndarray, axis: int) -> np.ndarray:
    """int32 array -> uint8 nibbles [0,15], expanding `axis` by 8x
    (LSB-first)."""
    a = a.astype(np.uint32)
    shifts = np.arange(8, dtype=np.uint32) * 4
    moved = np.moveaxis(a, axis, -1)[..., None]  # [..., P, 1]
    nib = (moved >> shifts) & 0xF  # [..., P, 8]
    out = nib.reshape(*moved.shape[:-2], -1)  # [..., P*8]
    return np.moveaxis(out, -1, axis).astype(np.uint8)


def _to_qtensor(q: np.ndarray, scales: np.ndarray, zeros: np.ndarray,
                group_size: int):
    """q [K, N] uint8 in [0,15], scales/zeros [G, N] -> int4_gz QTensor."""
    import jax.numpy as jnp

    from ktransformers_tpu.quant.formats import QTensor, pack_int4

    codes = q.astype(np.int32) - 8  # stored convention
    data = pack_int4(jnp.asarray(codes), group_size)
    return QTensor(
        data,
        jnp.asarray(scales, np.float32),
        jnp.asarray(zeros.astype(np.float32) - 8.0),
        kind="int4_gz",
        group_size=group_size,
    )


def gptq_to_qtensor(qweight, qzeros, scales, g_idx=None, v2: bool = False):
    """AutoGPTQ tensors -> int4_gz QTensor in [K, N] layout."""
    k8, n = qweight.shape
    k = k8 * 8
    g = scales.shape[0]
    gs = k // g
    if g_idx is not None:
        expect = np.arange(k, dtype=np.int64) // gs
        if not np.array_equal(np.asarray(g_idx, np.int64), expect):
            raise NotImplementedError(
                "GPTQ desc_act (non-monotonic g_idx) requires an upstream "
                "repack; reference loader.py:560 does the same reorder"
            )
    q = _unpack_int32_nibbles(np.asarray(qweight), axis=0)  # [K, N]
    z = _unpack_int32_nibbles(np.asarray(qzeros), axis=1)  # [G, N]
    if not v2:
        z = (z + 1) & 0xF  # AutoGPTQ v1 stores z-1
    return _to_qtensor(q, np.asarray(scales, np.float32), z, gs)


def awq_to_qtensor(qweight, qzeros, scales):
    """AutoAWQ tensors -> int4_gz QTensor in [K, N] layout."""
    k, n8 = qweight.shape
    n = n8 * 8
    g = scales.shape[0]
    gs = k // g
    inv = np.argsort(AWQ_ORDER)

    def unpack_awq(a, axis):
        nib = _unpack_int32_nibbles(np.asarray(a), axis=axis)
        # undo the interleave: nibble i holds column 8*j + AWQ_ORDER[i]
        moved = np.moveaxis(nib, axis, -1)
        moved = moved.reshape(*moved.shape[:-1], -1, 8)[..., inv]
        moved = moved.reshape(*moved.shape[:-2], -1)
        return np.moveaxis(moved, -1, axis)

    q = unpack_awq(qweight, 1)  # [K, N]
    z = unpack_awq(qzeros, 1)  # [G, N]
    return _to_qtensor(q, np.asarray(scales, np.float32), z, gs)


def detect_quant_method(path: str):
    """Returns 'gptq', 'awq' or None for a checkpoint directory, from
    config.json's quantization_config (or quantize_config.json)."""
    for fname in ("config.json", "quantize_config.json"):
        fp = os.path.join(path, fname)
        if not os.path.exists(fp):
            continue
        with open(fp) as f:
            cfg = json.load(f)
        qc = cfg.get("quantization_config", cfg)
        m = qc.get("quant_method")
        if m in ("gptq", "awq"):
            if qc.get("desc_act") and m == "gptq":
                # loadable only when g_idx is trivial; checked per-tensor
                pass
            return m
        if "bits" in qc and "group_size" in qc and fname == "quantize_config.json":
            return "gptq"
    return None


class QuantizedSafetensorsProvider:
    """Wraps SafetensorsProvider: serves `<module>.weight` requests from
    GPTQ/AWQ packed tensors as exact int4_gz QTensors via get_exact();
    plain tensors pass through. Mirrors the reference's quantized
    SafeTensorLoader (loader.py:515-1227)."""

    def __init__(self, base, method: str, v2: bool = False):
        self.base = base
        self.method = method
        self.v2 = v2
        self._names = set(base.keys())

    def keys(self):
        return self.base.keys()

    def maybe(self, name):
        return self.base.maybe(name)

    def get(self, name):
        """Float view (dequantized) for packed modules, passthrough else."""
        qt = self.get_exact(name)
        if qt is None:
            return self.base.get(name)
        import jax.numpy as jnp

        from ktransformers_tpu.quant.formats import dequantize

        return np.asarray(dequantize(qt, jnp.float32)).T  # back to [N, K]

    def _cat_n(self, a, b):
        import jax.numpy as jnp

        from ktransformers_tpu.quant.formats import QTensor

        assert a.kind == b.kind and a.group_size == b.group_size
        return QTensor(
            jnp.concatenate([a.data, b.data], -1),
            jnp.concatenate([a.scales, b.scales], -1),
            jnp.concatenate([a.zeros, b.zeros], -1),
            kind=a.kind, group_size=a.group_size,
        )

    def get_exact(self, name: str):
        if not name.endswith(".weight"):
            raise KeyError(name)
        stem = name[: -len(".weight")]
        if stem.endswith("gate_up_proj"):
            base = stem[: -len("gate_up_proj")]
            return self._cat_n(
                self.get_exact(f"{base}gate_proj.weight"),
                self.get_exact(f"{base}up_proj.weight"),
            )
        qw = f"{stem}.qweight"
        if qw not in self._names:
            raise KeyError(name)  # plain tensor: loader falls back
        raw = self.base._raw
        if self.method == "awq":
            return awq_to_qtensor(
                raw(qw), raw(f"{stem}.qzeros"), raw(f"{stem}.scales")
            )
        g_idx = (
            raw(f"{stem}.g_idx") if f"{stem}.g_idx" in self._names else None
        )
        return gptq_to_qtensor(
            raw(qw), raw(f"{stem}.qzeros"), raw(f"{stem}.scales"),
            g_idx, v2=self.v2,
        )
