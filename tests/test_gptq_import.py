"""GPTQ/AWQ import (loader/gptq.py): packed checkpoints must decode to
exactly the values the AutoGPTQ/AutoAWQ dequant convention defines —
verified against scalar reference packers written from those projects'
pack loops (q stored per nibble LSB-first; AWQ order_map 0,2,4,6,1,3,5,7;
AutoGPTQ v1 qzeros store z-1)."""

import numpy as np
import pytest

import jax.numpy as jnp

from ktransformers_tpu.loader.gptq import (
    AWQ_ORDER,
    awq_to_qtensor,
    gptq_to_qtensor,
)
from ktransformers_tpu.quant.formats import dequantize


def _rand_qzs(rng, k, n, gs):
    q = rng.integers(0, 16, (k, n)).astype(np.uint8)
    g = k // gs
    z = rng.integers(1, 15, (g, n)).astype(np.uint8)
    s = (rng.random((g, n)).astype(np.float32) + 0.1) * 0.01
    ref = np.empty((k, n), np.float32)
    for gi in range(g):
        rows = slice(gi * gs, (gi + 1) * gs)
        ref[rows] = (q[rows].astype(np.float32) - z[gi]) * s[gi]
    return q, z, s, ref


def _pack_rows_lsb(q, axis):
    """Scalar reference: pack 8 nibbles per int32 along `axis`, LSB-first."""
    q = np.moveaxis(q, axis, -1)
    out = np.zeros((*q.shape[:-1], q.shape[-1] // 8), np.uint32)
    for j in range(q.shape[-1]):
        out[..., j // 8] |= np.uint32(1) * q[..., j].astype(np.uint32) << (
            4 * (j % 8)
        )
    # safetensors writes the raw buffer: views must be materialized
    return np.ascontiguousarray(np.moveaxis(out.astype(np.int32), -1, axis))


def test_gptq_roundtrip(rng):
    k, n, gs = 64, 24, 16
    q, z, s, ref = _rand_qzs(rng, k, n, gs)
    qweight = _pack_rows_lsb(q, 0)  # [K/8, N]
    qzeros = _pack_rows_lsb((z - 1) & 0xF, 1)  # v1 stores z-1
    g_idx = np.arange(k, dtype=np.int32) // gs
    qt = gptq_to_qtensor(qweight, qzeros, s, g_idx, v2=False)
    assert qt.kind == "int4_gz" and qt.group_size == gs
    got = np.asarray(dequantize(qt, jnp.float32))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-7)


def test_gptq_v2_roundtrip(rng):
    k, n, gs = 32, 16, 8
    q, z, s, ref = _rand_qzs(rng, k, n, gs)
    qt = gptq_to_qtensor(
        _pack_rows_lsb(q, 0), _pack_rows_lsb(z, 1), s, None, v2=True
    )
    got = np.asarray(dequantize(qt, jnp.float32))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-7)


def test_gptq_desc_act_rejected(rng):
    k, n, gs = 32, 16, 8
    q, z, s, _ = _rand_qzs(rng, k, n, gs)
    g_idx = np.arange(k, dtype=np.int32)[::-1] // gs  # non-monotonic
    with pytest.raises(NotImplementedError):
        gptq_to_qtensor(_pack_rows_lsb(q, 0), _pack_rows_lsb(z, 1), s, g_idx)


def _pack_awq(vals, axis):
    """Scalar reference of AutoAWQ's pack loop: nibble i of each int32
    takes logical column 8*j + order_map[i]."""
    v = np.moveaxis(vals, axis, -1)
    out = np.zeros((*v.shape[:-1], v.shape[-1] // 8), np.uint32)
    for blk in range(out.shape[-1]):
        for i, col in enumerate(AWQ_ORDER):
            out[..., blk] |= v[..., 8 * blk + col].astype(np.uint32) << (4 * i)
    return np.moveaxis(out.astype(np.int32), -1, axis)


def test_awq_roundtrip(rng):
    k, n, gs = 64, 32, 16
    q, z, s, ref = _rand_qzs(rng, k, n, gs)
    qweight = _pack_awq(q, 1)  # [K, N/8]
    qzeros = _pack_awq(z, 1)  # [G, N/8]
    qt = awq_to_qtensor(qweight, qzeros, s)
    assert qt.kind == "int4_gz" and qt.group_size == gs
    got = np.asarray(dequantize(qt, jnp.float32))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-7)


def test_quantized_provider_end_to_end(rng, tmp_path):
    """A GPTQ safetensors file loads through QuantizedSafetensorsProvider
    and matmuls equal the float dequant reference."""
    from safetensors.numpy import save_file

    from ktransformers_tpu.loader.gptq import (
        QuantizedSafetensorsProvider,
        detect_quant_method,
    )
    from ktransformers_tpu.loader.providers import SafetensorsProvider
    from ktransformers_tpu.ops.linear import qmatmul

    k, n, gs = 64, 32, 16
    q, z, s, ref = _rand_qzs(rng, k, n, gs)
    stem = "model.layers.0.self_attn.q_proj"
    save_file(
        {
            f"{stem}.qweight": _pack_rows_lsb(q, 0),
            f"{stem}.qzeros": _pack_rows_lsb((z - 1) & 0xF, 1),
            f"{stem}.scales": s.astype(np.float16),
            f"{stem}.g_idx": np.arange(k, dtype=np.int32) // gs,
        },
        str(tmp_path / "model.safetensors"),
    )
    (tmp_path / "config.json").write_text(
        '{"quantization_config": {"quant_method": "gptq", "bits": 4}}'
    )
    assert detect_quant_method(str(tmp_path)) == "gptq"
    prov = QuantizedSafetensorsProvider(
        SafetensorsProvider(str(tmp_path)), "gptq"
    )
    qt = prov.get_exact(f"{stem}.weight")
    x = jnp.asarray(rng.standard_normal((4, k)), jnp.float32)
    y = qmatmul(x, qt)
    s16 = s.astype(np.float16).astype(np.float32)  # file stores f16 scales
    ref16 = ((q.astype(np.float32) - np.repeat(z, gs, 0)[:k])
             * np.repeat(s16, gs, 0)[:k])
    yref = np.asarray(x) @ ref16
    np.testing.assert_allclose(np.asarray(y), yref, rtol=2e-3, atol=2e-3)
