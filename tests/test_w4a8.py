"""W4A8 path: offset-lo repack + int8-MXU kernels (quant/w4a8.py,
ops/pallas/w4a8_matmul.py).

Interpret-mode kernel accuracy vs float references (the TPU analog of the
reference's AMX int8 activation-quant accuracy tests,
kt-kernel/test/per_commit/test_moe_amx_accuracy_int8.py), plus the
invariant that the repack is exactly lossless through every XLA fallback
path (transformed params must give bit-identical results off-TPU).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from ktransformers_tpu.ops.moe import (
    MoEConfig,
    MoEWeights,
    gathered_matmul,
    moe_forward,
)
from ktransformers_tpu.ops.linear import qmatmul
from ktransformers_tpu.ops.pallas.quant_matmul import (
    gathered_quant_matmul,
    grouped_quant_matmul,
    quant_matmul,
)
from ktransformers_tpu.ops.pallas.w4a8_matmul import (
    dense_w4a8_matmul,
    gathered_w4a8_matmul,
)
from ktransformers_tpu.quant.formats import dequantize, quantize
from ktransformers_tpu.quant.w4a8 import enable_w4a8, repack_offset_lo

KINDS = ["int4", "int4_g", "int4_gz"]


@pytest.mark.parametrize("kind", KINDS)
def test_repack_lossless(rng, kind):
    w = jnp.asarray(rng.standard_normal((256, 128)).astype(np.float32) * 0.1)
    qt = quantize(w, kind, group_size=64)
    qt2 = repack_offset_lo(qt)
    assert qt2.act_quant and qt2.kind == kind
    np.testing.assert_array_equal(
        np.asarray(dequantize(qt, jnp.float32)),
        np.asarray(dequantize(qt2, jnp.float32)),
    )
    # idempotent
    assert repack_offset_lo(qt2) is qt2


@pytest.mark.parametrize("kind", KINDS)
@pytest.mark.parametrize("m", [1, 8])
def test_dense_w4a8_kernel(rng, kind, m):
    k, n = 256, 384
    w = jnp.asarray(rng.standard_normal((k, n)).astype(np.float32) * 0.1)
    qt = repack_offset_lo(quantize(w, kind, group_size=128))
    x = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    ref = np.asarray(
        x.astype(jnp.float32) @ dequantize(qt, jnp.float32), np.float32
    )
    out = np.asarray(dense_w4a8_matmul(x, qt, interpret=True), np.float32)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(out / scale, ref / scale, atol=3e-2)


@pytest.mark.parametrize("kind", KINDS)
def test_gathered_w4a8_kernel(rng, kind):
    e, k, n, r = 8, 256, 384, 6
    w = jnp.asarray(rng.standard_normal((e, k, n)).astype(np.float32) * 0.1)
    qt = repack_offset_lo(quantize(w, kind, group_size=128))
    x = jnp.asarray(rng.standard_normal((r, k)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    ids = jnp.asarray([3, 0, 5, 3, 7, 1], jnp.int32)
    wd = np.asarray(dequantize(qt, jnp.float32))
    ref = np.stack(
        [np.asarray(x[i].astype(jnp.float32)) @ wd[int(ids[i])] for i in range(r)]
    )
    out = np.asarray(gathered_w4a8_matmul(x, qt, ids, interpret=True), np.float32)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(out / scale, ref / scale, atol=3e-2)


@pytest.mark.parametrize("kind", KINDS)
@pytest.mark.parametrize("act", ["silu", "relu", "gelu"])
def test_fused_ffn_kernel(rng, kind, act):
    """Fused gate_up -> GLU -> in-kernel re-quant -> down kernel vs the
    two-call float reference (the whole expert FFN in one launch)."""
    from ktransformers_tpu.ops.activations import ActivationConfig, glu_activate
    from ktransformers_tpu.ops.pallas.w4a8_matmul import (
        ffn_fits,
        gathered_w4a8_ffn,
    )

    e, k, inter, r = 8, 256, 128, 6
    gu = jnp.asarray(
        rng.standard_normal((e, k, 2 * inter)).astype(np.float32) * 0.1
    )
    dn = jnp.asarray(
        rng.standard_normal((e, inter, k)).astype(np.float32) * 0.1
    )
    qgu = repack_offset_lo(quantize(gu, kind, group_size=64))
    qdn = repack_offset_lo(quantize(dn, kind, group_size=64))
    assert ffn_fits(qgu, qdn, act, None)
    x = jnp.asarray(rng.standard_normal((r, k)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    ids = jnp.asarray([3, 0, 5, 3, 7, 1], jnp.int32)

    gud = np.asarray(dequantize(qgu, jnp.float32))
    dnd = np.asarray(dequantize(qdn, jnp.float32))
    cfg = ActivationConfig(kind=act)
    ref = []
    for i in range(r):
        h = np.asarray(x[i].astype(jnp.float32)) @ gud[int(ids[i])]
        a = np.asarray(glu_activate(
            jnp.asarray(h[:inter]), jnp.asarray(h[inter:]), cfg
        ))
        ref.append(a @ dnd[int(ids[i])])
    ref = np.stack(ref)

    out = np.asarray(
        gathered_w4a8_ffn(x, qgu, qdn, ids, act=act, interpret=True),
        np.float32,
    )
    # two int8 activation-quant stages (x and h) vs the gathered kernel's
    # one -> slightly wider tolerance
    scale = np.abs(ref).max()
    np.testing.assert_allclose(out / scale, ref / scale, atol=6e-2)


def test_quant_matmul_dispatches_w4a8(rng):
    """quant_matmul / gathered_quant_matmul route act_quant weights to the
    w4a8 kernels (small M) and stay correct through the bf16 body at
    large M (offset-aware unpack)."""
    k, n = 256, 384
    w = jnp.asarray(rng.standard_normal((k, n)).astype(np.float32) * 0.1)
    qt = repack_offset_lo(quantize(w, "int4_g", group_size=128))
    for m in (4, 64, 128):  # w4a8 decode / w4a8 boundary / bf16dq prefill
        x = jnp.asarray(
            rng.standard_normal((m, k)).astype(np.float32)
        ).astype(jnp.bfloat16)
        ref = np.asarray(
            x.astype(jnp.float32) @ dequantize(qt, jnp.float32), np.float32
        )
        out = np.asarray(quant_matmul(x, qt, interpret=True), np.float32)
        scale = np.abs(ref).max()
        np.testing.assert_allclose(out / scale, ref / scale, atol=3e-2)


def test_grouped_kernel_offset_aware(rng):
    """Repacked (act_quant) weights route the grouped matmul through the
    int8-MXU W4A8 kernel (r4 prefill path): activations are quantized per
    (row, group), so compare against the float reference at W4A8 accuracy
    rather than bit-matching the bf16 kernel."""
    e, k, n = 4, 256, 128
    w = jnp.asarray(rng.standard_normal((e, k, n)).astype(np.float32) * 0.1)
    qt = quantize(w, "int4_g", group_size=128)
    qt2 = repack_offset_lo(qt)
    m = 32
    x = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    sizes = jnp.asarray([10, 0, 14, 8], jnp.int32)
    a = np.asarray(grouped_quant_matmul(x, qt, sizes, interpret=True), np.float32)
    b = np.asarray(grouped_quant_matmul(x, qt2, sizes, interpret=True), np.float32)
    scale = max(np.abs(a).max(), 1e-6)
    np.testing.assert_allclose(b / scale, a / scale, atol=3e-2)
    # masked tail rows (beyond sum(sizes)) must come back zero
    np.testing.assert_array_equal(b[32:], np.zeros_like(b[32:]))


def test_grouped_w4a8_zeros_kind(rng):
    """int4_gz (zero-point) through the grouped W4A8 kernel."""
    from ktransformers_tpu.ops.moe import moe_dispatch

    e, k, n, t, topk = 4, 256, 128, 24, 2
    w = jnp.asarray(
        rng.standard_normal((e, k, n)).astype(np.float32) * 0.1 + 0.05
    )
    qt = repack_offset_lo(quantize(w, "int4_gz", group_size=128))
    ids = jnp.asarray(rng.integers(0, e, (t, topk)), jnp.int32)
    x = jnp.asarray(rng.standard_normal((t, k)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    order, token_of_row, sizes, _ = moe_dispatch(ids, e)
    xs = x[token_of_row]
    out = np.asarray(
        grouped_quant_matmul(xs, qt, sizes, interpret=True), np.float32
    )
    wd = np.asarray(dequantize(qt, jnp.float32))
    row_expert = np.repeat(np.arange(e), np.asarray(sizes))
    ref = np.einsum(
        "mk,mkn->mn", np.asarray(xs, np.float32), wd[row_expert]
    )
    scale = max(np.abs(ref).max(), 1e-6)
    np.testing.assert_allclose(out / scale, ref / scale, atol=3e-2)


def test_xla_fallbacks_exact_after_repack(rng):
    """Off-TPU (no Pallas), transformed params must be bit-identical to the
    originals through qmatmul and the MoE gather path."""
    e, k, n, t = 8, 128, 96, 3
    w = jnp.asarray(rng.standard_normal((e, k, n)).astype(np.float32) * 0.1)
    for kind in KINDS:
        qt = quantize(w, kind, group_size=64)
        qt2 = repack_offset_lo(qt)
        x = jnp.asarray(
            rng.standard_normal((t, k)).astype(np.float32)
        ).astype(jnp.bfloat16)
        ids = jnp.asarray([[1, 3], [0, 7], [5, 5]], jnp.int32)
        np.testing.assert_array_equal(
            np.asarray(gathered_matmul(x, qt, ids)),
            np.asarray(gathered_matmul(x, qt2, ids)),
        )
        def first_expert(q):
            return dataclasses.replace(
                q, data=q.data[0], scales=q.scales[0],
                zeros=None if q.zeros is None else q.zeros[0],
            )

        np.testing.assert_array_equal(
            np.asarray(qmatmul(x, first_expert(qt), impl="ref")),
            np.asarray(qmatmul(x, first_expert(qt2), impl="ref")),
        )


def test_moe_forward_exact_after_enable(rng):
    """moe_forward (gather and grouped decode paths) is unchanged by
    enable_w4a8 when the Pallas kernels are not active (CPU)."""
    e, k, inter, t = 8, 128, 64, 4
    gu = jnp.asarray(rng.standard_normal((e, k, 2 * inter)) * 0.1, jnp.float32)
    dn = jnp.asarray(rng.standard_normal((e, inter, k)) * 0.1, jnp.float32)
    weights = MoEWeights(
        gate_up=quantize(gu, "int4_g", group_size=64),
        down=quantize(dn, "int4_g", group_size=32),
    )
    weights2 = enable_w4a8(weights)
    assert weights2.gate_up.act_quant and weights2.down.act_quant
    x = jnp.asarray(rng.standard_normal((t, k)), jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, e, (t, 2)), jnp.int32)
    tw = jnp.full((t, 2), 0.5, jnp.float32)
    for impl in ("gather", "ragged"):
        cfg = MoEConfig(impl=impl)
        np.testing.assert_array_equal(
            np.asarray(moe_forward(x, weights, idx, tw, cfg)),
            np.asarray(moe_forward(x, weights2, idx, tw, cfg)),
        )


@pytest.mark.parametrize("kind", KINDS)
@pytest.mark.parametrize("m", [1, 8, 33])
def test_dense_ffn_kernel(rng, kind, m):
    """Inter-chunked dense FFN kernel (gate_up -> GLU -> down, one launch,
    grid over inter chunks) vs the float two-matmul reference — the
    shared-expert / dense-MLP shapes the whole-expert kernel can't hold."""
    from ktransformers_tpu.ops.pallas.w4a8_matmul import (
        dense_ffn_plan,
        dense_w4a8_ffn,
    )

    k, inter = 256, 512
    gu = jnp.asarray(
        rng.standard_normal((k, 2 * inter)).astype(np.float32) * 0.1
    )
    dn = jnp.asarray(rng.standard_normal((inter, k)).astype(np.float32) * 0.1)
    qgu = repack_offset_lo(quantize(gu, kind, group_size=128))
    qdn = repack_offset_lo(quantize(dn, kind, group_size=128))
    bc = dense_ffn_plan(qgu, qdn, "silu", None)
    assert bc is not None and inter % bc == 0
    x = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32)).astype(
        jnp.bfloat16
    )

    xf = np.asarray(x.astype(jnp.float32))
    h = xf @ np.asarray(dequantize(qgu, jnp.float32))
    g, u = h[:, :inter], h[:, inter:]
    a = g * (1.0 / (1.0 + np.exp(-g))) * u
    ref = a @ np.asarray(dequantize(qdn, jnp.float32))

    scale = np.abs(ref).max()
    gs_dn = qdn.group_size or inter
    widths = [bc] + ([128] if (inter % 128 == 0 and 128 % gs_dn == 0) else [])
    for bc_try in widths:  # planned width + forced multi-chunk when legal
        out = np.asarray(
            dense_w4a8_ffn(x, qgu, qdn, act="silu", bc=bc_try,
                           interpret=True),
            np.float32,
        )
        np.testing.assert_allclose(out / scale, ref / scale, atol=6e-2)


def test_dense_ffn_plan_rejects():
    from ktransformers_tpu.ops.pallas.w4a8_matmul import dense_ffn_plan

    k, inter = 256, 512
    gu = quantize(jnp.ones((k, 2 * inter), jnp.float32), "int4_g", 128)
    dn = quantize(jnp.ones((inter, k), jnp.float32), "int4_g", 128)
    gu8, dn8 = repack_offset_lo(gu), repack_offset_lo(dn)
    assert dense_ffn_plan(gu8, dn8, "silu", None) is not None
    # not act_quant-repacked, clamp variants, odd activations -> None
    assert dense_ffn_plan(gu, dn, "silu", None) is None
    assert dense_ffn_plan(gu8, dn8, "silu", 7.0) is None
    assert dense_ffn_plan(gu8, dn8, "silu2", None) is None


@pytest.mark.parametrize("kind", ["int4_g", "int4_gz"])
def test_grouped_ffn_fused(rng, kind):
    """grouped_w4a8_ffn (prefill fused expert FFN: gate_up -> GLU ->
    in-kernel re-quant -> down, one launch per expert tile) matches the
    float reference FFN at W4A8 accuracy, including empty experts, rows
    past sum(group_sizes), and the trailing dead-tile zero path."""
    from ktransformers_tpu.ops.moe import moe_dispatch
    from ktransformers_tpu.ops.pallas.w4a8_matmul import (
        grouped_ffn_fits,
        grouped_w4a8_ffn,
    )

    e, k, inter, t, topk = 4, 256, 256, 24, 2
    gu = jnp.asarray(
        rng.standard_normal((e, k, 2 * inter)).astype(np.float32) * 0.1
    )
    dn = jnp.asarray(
        rng.standard_normal((e, inter, k)).astype(np.float32) * 0.1
    )
    qgu = repack_offset_lo(quantize(gu, kind, group_size=128))
    qdn = repack_offset_lo(quantize(dn, kind, group_size=128))
    assert grouped_ffn_fits(qgu, qdn, "silu", None, bm=64)

    ids = jnp.asarray(rng.integers(0, e - 1, (t, topk)), jnp.int32)  # e-1 empty
    x = jnp.asarray(rng.standard_normal((t, k)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    order, token_of_row, sizes, _ = moe_dispatch(ids, e)
    xs = x[token_of_row]
    out = np.asarray(
        grouped_w4a8_ffn(xs, qgu, qdn, sizes, act="silu", interpret=True),
        np.float32,
    )

    gud = np.asarray(dequantize(qgu, jnp.float32))
    dnd = np.asarray(dequantize(qdn, jnp.float32))
    row_expert = np.repeat(np.arange(e), np.asarray(sizes))
    xf = np.asarray(xs, np.float32)
    h = np.einsum("mk,mkn->mn", xf, gud[row_expert])
    g, u = h[:, :inter], h[:, inter:]
    a = g / (1.0 + np.exp(-g)) * u
    ref = np.einsum("mi,mik->mk", a, dnd[row_expert])
    scale = max(np.abs(ref).max(), 1e-6)
    np.testing.assert_allclose(out / scale, ref / scale, atol=4e-2)
    # masked tail rows (beyond sum(sizes)) must come back zero
    m = t * topk
    assert out.shape[0] == m
    np.testing.assert_array_equal(
        out[int(np.asarray(sizes).sum()):],
        np.zeros_like(out[int(np.asarray(sizes).sum()):]),
    )


def test_moe_forward_grouped_ffn_hook(rng):
    """moe_forward routes the sorted grouped path through the fused FFN
    hook when registered, matching the unhooked path at W4A8 accuracy."""
    from ktransformers_tpu.ops import moe as moe_mod
    from ktransformers_tpu.ops.pallas.w4a8_matmul import grouped_w4a8_ffn

    e, k, inter, t, topk = 4, 256, 256, 24, 2
    gu = jnp.asarray(
        rng.standard_normal((e, k, 2 * inter)).astype(np.float32) * 0.1
    )
    dn = jnp.asarray(
        rng.standard_normal((e, inter, k)).astype(np.float32) * 0.1
    )
    w = MoEWeights(
        gate_up=repack_offset_lo(quantize(gu, "int4_g", group_size=128)),
        down=repack_offset_lo(quantize(dn, "int4_g", group_size=128)),
    )
    ids = jnp.asarray(rng.integers(0, e, (t, topk)), jnp.int32)
    tw = jnp.asarray(
        rng.random((t, topk)).astype(np.float32)
    )
    x = jnp.asarray(rng.standard_normal((t, k)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    cfg = MoEConfig(impl="ragged")
    ref = np.asarray(moe_forward(x, w, ids, tw, cfg), np.float32)

    calls = []

    def hook(xs, qgu, qdn, sizes, act_cfg):
        calls.append(1)
        return grouped_w4a8_ffn(xs, qgu, qdn, sizes, act=act_cfg.kind,
                                interpret=True)

    old = moe_mod._PALLAS_GROUPED_FFN
    moe_mod.set_pallas_grouped_ffn(hook)
    try:
        out = np.asarray(
            moe_forward(x, w, ids, tw, MoEConfig(impl="pallas")), np.float32
        )
    finally:
        moe_mod.set_pallas_grouped_ffn(old)
    assert calls, "fused grouped FFN hook was not used"
    scale = max(np.abs(ref).max(), 1e-6)
    np.testing.assert_allclose(out / scale, ref / scale, atol=4e-2)
