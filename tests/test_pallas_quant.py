"""Pallas fused dequant-matmul kernels vs the XLA reference paths.

Runs in interpreter mode on the CPU test mesh (real-TPU execution is covered
by bench.py and the verify drive); mirrors the reference's kernel accuracy
tests (kt-kernel/test/per_commit/test_moe_amx_accuracy_*.py).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ktransformers_tpu.ops.pallas.quant_matmul import (
    gathered_quant_matmul,
    quant_matmul,
)
from ktransformers_tpu.quant.formats import dequantize, quantize


@pytest.mark.parametrize("kind", ["int8", "int4", "int4_g", "int4_gz", "fp8"])
@pytest.mark.parametrize("m", [1, 7, 32])
def test_quant_matmul_kernel(rng, kind, m):
    k, n = 256, 384
    w = jnp.asarray(rng.standard_normal((k, n)).astype(np.float32) * 0.1)
    x = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    qt = quantize(w, kind, group_size=128)
    ref = np.asarray(
        x.astype(jnp.float32) @ dequantize(qt, jnp.float32), np.float32
    )
    out = np.asarray(quant_matmul(x, qt, interpret=True), np.float32)
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("kind", ["int8", "int4_g", "int4_gz"])
def test_gathered_quant_matmul_kernel(rng, kind):
    e, k, n, r = 8, 256, 384, 6
    w = jnp.asarray(rng.standard_normal((e, k, n)).astype(np.float32) * 0.1)
    qt = quantize(w, kind, group_size=128)
    x = jnp.asarray(rng.standard_normal((r, k)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    ids = jnp.asarray([3, 0, 5, 3, 7, 1], jnp.int32)

    wd = np.asarray(dequantize(qt, jnp.float32))
    ref = np.stack(
        [
            np.asarray(x[i].astype(jnp.float32)) @ wd[int(ids[i])]
            for i in range(r)
        ]
    )
    out = np.asarray(gathered_quant_matmul(x, qt, ids, interpret=True), np.float32)
    np.testing.assert_allclose(out, ref, rtol=2e-2, atol=2e-2)


def test_quant_matmul_odd_n(rng):
    """N not divisible by the tile size (e.g. 2816 = 5.5 * 512)."""
    k, n = 256, 320
    w = jnp.asarray(rng.standard_normal((k, n)).astype(np.float32) * 0.1)
    x = jnp.asarray(rng.standard_normal((4, k)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    qt = quantize(w, "int4_g", group_size=128)
    ref = np.asarray(x.astype(jnp.float32) @ dequantize(qt, jnp.float32))
    out = np.asarray(quant_matmul(x, qt, interpret=True), np.float32)
    np.testing.assert_allclose(out, ref, rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("kind", ["int8", "int4_g", "fp8"])
def test_grouped_quant_matmul_kernel(rng, kind):
    from ktransformers_tpu.ops.pallas.quant_matmul import grouped_quant_matmul

    e, k, n, m = 4, 256, 384, 40
    w = jnp.asarray(rng.standard_normal((e, k, n)).astype(np.float32) * 0.1)
    qt = quantize(w, kind, group_size=128)
    x = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    # groups: 10, 0, 25, 3 -> 38 valid rows, 2 masked tail rows
    gs = jnp.asarray([10, 0, 25, 3], jnp.int32)
    wd = np.asarray(dequantize(qt, jnp.float32))
    xs = np.asarray(x.astype(jnp.float32))
    bounds = [0, 10, 10, 35, 38]
    ref = np.zeros((m, n), np.float32)
    for g in range(e):
        ref[bounds[g]:bounds[g + 1]] = xs[bounds[g]:bounds[g + 1]] @ wd[g]
    out = np.asarray(grouped_quant_matmul(x, qt, gs, interpret=True), np.float32)
    np.testing.assert_allclose(out, ref, rtol=2e-2, atol=2e-2)
    # masked tail rows must be exactly zero
    assert np.all(out[38:] == 0)


def test_mla_decode_kernel(rng):
    from ktransformers_tpu.ops.attention import mla_absorbed
    from ktransformers_tpu.ops.pallas.mla_decode import mla_decode_attention

    b, h, r, dr, smax = 3, 4, 128, 32, 640
    qn = jnp.asarray(rng.standard_normal((b, h, r)).astype(np.float32))
    qp = jnp.asarray(rng.standard_normal((b, h, dr)).astype(np.float32))
    ckv = jnp.asarray(rng.standard_normal((b, smax, r)).astype(np.float32))
    kpe = jnp.asarray(rng.standard_normal((b, smax, dr)).astype(np.float32))
    lengths = jnp.asarray([17, 500, 640], jnp.int32)

    # dense reference with length mask
    kpos = np.arange(smax)[None, None, :]
    mask = jnp.asarray(
        np.where(kpos < np.asarray(lengths)[:, None, None], 0.0, -1e30),
        jnp.float32,
    )
    ref = mla_absorbed(
        qn[:, :, None], qp[:, :, None], ckv, kpe, scale=0.09, mask=mask
    )[:, :, 0]
    out = mla_decode_attention(
        qn, qp, ckv, kpe, lengths, 0.09, block_s=256, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


def test_padded_scales_parity(rng):
    """Sublane-padded scales (quant/formats.pad_scale_sublanes) must give
    bit-identical results through every consumer: dequantize, the XLA
    linear path, the Pallas dense/gathered kernels, and the w4a8 kernels.
    K=384 / group 128 -> ng=3, padded to 8."""
    from ktransformers_tpu.ops.linear import qmatmul
    from ktransformers_tpu.ops.pallas.w4a8_matmul import (
        dense_w4a8_matmul,
        gathered_w4a8_ffn,
        gathered_w4a8_matmul,
    )
    from ktransformers_tpu.quant.formats import pad_scale_sublanes
    from ktransformers_tpu.quant.w4a8 import repack_offset_lo

    e, k, n, r = 4, 384, 256, 5
    w = jnp.asarray(rng.standard_normal((e, k, n)).astype(np.float32) * 0.1)
    x = jnp.asarray(rng.standard_normal((r, k)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    ids = jnp.asarray([1, 3, 0, 2, 1], jnp.int32)

    for kind in ("int4_g", "int4_gz", "int8_g"):
        qt = quantize(w, kind, group_size=128)
        qp = pad_scale_sublanes(qt)
        assert qp.scales.shape[-2] == 8 and qt.scales.shape[-2] == 3
        np.testing.assert_array_equal(
            np.asarray(dequantize(qt, jnp.float32)),
            np.asarray(dequantize(qp, jnp.float32)),
        )
        # XLA linear path (per-expert slice)
        np.testing.assert_array_equal(
            np.asarray(qmatmul(x, _slice_expert(qt, 1), impl="xla")),
            np.asarray(qmatmul(x, _slice_expert(qp, 1), impl="xla")),
        )
        if kind.startswith("int4"):
            np.testing.assert_array_equal(
                np.asarray(gathered_quant_matmul(x, qt, ids, interpret=True)),
                np.asarray(gathered_quant_matmul(x, qp, ids, interpret=True)),
            )
            # w4a8 kernels
            qa = repack_offset_lo(qt)
            qap = pad_scale_sublanes(qa)
            np.testing.assert_array_equal(
                np.asarray(gathered_w4a8_matmul(x, qa, ids, interpret=True)),
                np.asarray(gathered_w4a8_matmul(x, qap, ids, interpret=True)),
            )
            np.testing.assert_array_equal(
                np.asarray(
                    dense_w4a8_matmul(x, _slice_expert(qa, 2), interpret=True)
                ),
                np.asarray(
                    dense_w4a8_matmul(x, _slice_expert(qap, 2), interpret=True)
                ),
            )

    # fused FFN kernel with padded scales on both mats (down: K=n -> ng=2->8)
    gu = repack_offset_lo(quantize(w, "int4_g", group_size=128))
    dn_w = jnp.asarray(
        rng.standard_normal((e, n // 2, k)).astype(np.float32) * 0.1
    )
    dn = repack_offset_lo(quantize(dn_w, "int4_g", group_size=64))
    out_ref = gathered_w4a8_ffn(x, gu, dn, ids, act="silu", interpret=True)
    out_pad = gathered_w4a8_ffn(
        x, pad_scale_sublanes(gu), pad_scale_sublanes(dn), ids,
        act="silu", interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(out_ref), np.asarray(out_pad))


def _slice_expert(qt, i):
    import dataclasses

    return dataclasses.replace(
        qt,
        data=qt.data[i],
        scales=None if qt.scales is None else qt.scales[i],
        zeros=None if qt.zeros is None else qt.zeros[i],
    )


def test_mla_decode_fused_parity(rng):
    """mla_decode_fused (norm + rope-rotation + absorb + flash + current
    token, one launch) must match the unfused op chain."""
    import jax
    import jax.numpy as jnp

    from ktransformers_tpu.ops.attention import mla_absorbed
    from ktransformers_tpu.ops.norm import rms_norm
    from ktransformers_tpu.ops.pallas.mla_decode import mla_decode_fused
    from ktransformers_tpu.ops.rope import apply_rope, rope_rotation_matrix

    b, h, nope, dr, r, v = 2, 4, 32, 16, 64, 32
    smax, length = 64, 37
    eps, scale = 1e-6, (nope + dr) ** -0.5
    f = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)

    q_raw = f(b, h, nope + dr)
    ckv_kpe = f(b, 1, r + dr)
    gamma = f(r) * 0.1 + 1.0
    cos = f(b, dr // 2)
    sin = f(b, dr // 2)
    ckv_buf = f(b, smax, r)
    kpe_buf = f(b, smax, dr)
    w_uk = f(h, nope, r) * 0.1
    w_uv = f(h, r, v) * 0.1
    lengths = jnp.asarray([length, 11], jnp.int32)

    for interleaved in (True, False):
        rot = rope_rotation_matrix(cos, sin, interleaved)
        qn_eff_in = jnp.einsum("bhn,hnr->bhr", q_raw[..., :nope], w_uk)
        ctx_out, ckv_new, kpe_new = mla_decode_fused(
            qn_eff_in, q_raw[..., nope:], ckv_kpe, gamma, rot,
            ckv_buf, kpe_buf, lengths,
            scale=scale, eps=eps, block_s=32, interpret=True,
        )
        out = jnp.einsum("bhr,hrv->bhv", ctx_out, w_uv)

        # unfused reference chain
        qn = q_raw[..., :nope]
        qp = apply_rope(
            q_raw[..., None, nope:], cos[:, None, None], sin[:, None, None],
            interleaved=interleaved,
        )[..., 0, :]  # [b, h, dr]
        ckv_ref = rms_norm(ckv_kpe[..., :r], gamma, eps)
        kpe_ref = apply_rope(
            ckv_kpe[..., r:], cos[:, None], sin[:, None],
            interleaved=interleaved,
        )
        np.testing.assert_allclose(
            np.asarray(ckv_new[:, 0]), np.asarray(ckv_ref[:, 0]),
            rtol=1e-4, atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(kpe_new[:, 0]), np.asarray(kpe_ref[:, 0]),
            rtol=1e-4, atol=1e-4,
        )

        # write into the buffers, attend with length+1 (current included)
        bufs_a, bufs_b = [], []
        for bi in range(b):
            li = int(lengths[bi])
            bufs_a.append(ckv_buf[bi].at[li].set(ckv_ref[bi, 0]))
            bufs_b.append(kpe_buf[bi].at[li].set(kpe_ref[bi, 0]))
        ckv_w = jnp.stack(bufs_a)
        kpe_w = jnp.stack(bufs_b)
        qn_eff = jnp.einsum("bhn,hnr->bhr", qn, w_uk)[:, :, None]  # [b,h,1,r]
        kpos = jnp.arange(smax)[None, None, :]
        mask = jnp.where(kpos < (lengths + 1)[:, None, None], 0.0, -1e30)
        ctx = mla_absorbed(
            qn_eff, qp[:, :, None], ckv_w, kpe_w, scale=scale, mask=mask
        )  # [b,h,1,r]
        ref_out = jnp.einsum("bhr,hrv->bhv", ctx[:, :, 0], w_uv)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref_out), rtol=2e-3, atol=2e-3,
        )


@pytest.mark.parametrize("kind", ["mxfp4", "mxfp8"])
@pytest.mark.parametrize("m", [1, 9])
def test_mx_dense_kernel(rng, kind, m):
    """OCP MX kinds computed INSIDE the matmul block (e2m1 arithmetic
    decode / e4m3 + ue8m0 exp2 scales) vs the XLA dequant reference
    (reference: fp4-moe.hpp / mxfp8-moe.hpp; DeepSeek-V4-Flash routed
    experts are MXFP4)."""
    k, n = 256, 384
    w = jnp.asarray(rng.standard_normal((k, n)).astype(np.float32) * 0.1)
    qt = quantize(w, kind)
    assert qt.group_size == 32
    x = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    ref = np.asarray(
        x.astype(jnp.float32) @ dequantize(qt, jnp.float32), np.float32
    )
    out = np.asarray(quant_matmul(x, qt, interpret=True), np.float32)
    np.testing.assert_allclose(out, ref, rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("kind", ["mxfp4", "mxfp8"])
def test_mx_gathered_and_grouped_kernels(rng, kind):
    from ktransformers_tpu.ops.pallas.quant_matmul import (
        grouped_quant_matmul,
    )
    from ktransformers_tpu.quant.formats import pad_scale_sublanes

    e, k, n, r = 4, 128, 256, 6
    w = jnp.asarray(rng.standard_normal((e, k, n)).astype(np.float32) * 0.1)
    qt = pad_scale_sublanes(quantize(w, kind))  # ng=4 -> padded to 8
    x = jnp.asarray(rng.standard_normal((r, k)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    ids = jnp.asarray([3, 0, 2, 3, 1, 1], jnp.int32)
    wd = np.asarray(dequantize(qt, jnp.float32))
    ref = np.stack(
        [np.asarray(x[i], np.float32) @ wd[int(ids[i])] for i in range(r)]
    )
    out = np.asarray(
        gathered_quant_matmul(x, qt, ids, interpret=True), np.float32
    )
    np.testing.assert_allclose(out, ref, rtol=2e-2, atol=2e-2)

    sizes = jnp.asarray([2, 0, 3, 1], jnp.int32)
    xs = jnp.asarray(rng.standard_normal((r, k)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    row_expert = np.repeat(np.arange(e), np.asarray(sizes))
    ref2 = np.stack(
        [np.asarray(xs[i], np.float32) @ wd[row_expert[i]] for i in range(r)]
    )
    out2 = np.asarray(
        grouped_quant_matmul(xs, qt, sizes, interpret=True), np.float32
    )
    np.testing.assert_allclose(out2, ref2, rtol=2e-2, atol=2e-2)
