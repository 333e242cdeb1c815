"""Pallas TPU kernels and their registration into the op dispatchers.

Call `enable()` (idempotent) to route quantized matmuls through the fused
kernels; `maybe_enable()` does so only when a non-CPU backend is attached.
The XLA fallback paths remain available via impl="ref"/"ragged".
"""

from __future__ import annotations

import jax

_ENABLED = False

PALLAS_KINDS = (
    "int8", "int4", "int4_g", "int4_gz", "fp8", "mxfp4", "mxfp8",
)


def enable() -> None:
    global _ENABLED
    if _ENABLED:
        return
    from ktransformers_tpu.ops import linear, moe
    from ktransformers_tpu.ops.pallas.vjp import (
        gathered_quant_matmul_diff,
        grouped_quant_matmul_diff,
        quant_matmul_diff,
    )

    # the _diff wrappers are the same kernels with custom_vjp input-grad
    # rules attached (transposed fused kernels, ops/pallas/quant_matmul_t)
    # so on-chip LoRA SFT differentiates straight through the Pallas path
    def _qmatmul(x, w):
        if w.kind not in PALLAS_KINDS:
            return None
        return quant_matmul_diff(x, w)

    def _gather(x_rows, w, ids):
        if w.kind not in PALLAS_KINDS:
            return None
        return gathered_quant_matmul_diff(x_rows, w, ids)

    def _gmm(x_sorted, w, group_sizes):
        if w.kind not in PALLAS_KINDS:
            return None
        return grouped_quant_matmul_diff(x_sorted, w, group_sizes)

    from ktransformers_tpu.ops import attention
    from ktransformers_tpu.ops.pallas.mla_decode import (
        mla_decode_attention,
        mla_decode_fused,
    )

    def _mla_decode(qn, qp, ckv, kpe, lengths, scale):
        return mla_decode_attention(qn, qp, ckv, kpe, lengths, scale)

    def _mla_fused(qn_eff, qp_raw, ckv_kpe, gamma, rot, ckv, kpe,
                   lengths, scale, eps):
        return mla_decode_fused(
            qn_eff, qp_raw, ckv_kpe, gamma, rot, ckv, kpe, lengths,
            scale=scale, eps=eps,
        )

    from ktransformers_tpu.ops.pallas.w4a8_matmul import (
        dense_ffn_plan,
        dense_w4a8_ffn,
        ffn_fits,
        gathered_w4a8_ffn,
        grouped_ffn_fits,
        grouped_w4a8_ffn,
    )

    def _ffn(x_rows, gate_up, down, ids, act_cfg):
        if gate_up.kind not in PALLAS_KINDS or down.kind not in PALLAS_KINDS:
            return None
        if x_rows.shape[0] > 128:
            # decode-size kernel: its whole-expert blocks re-fetch per row;
            # big batches belong to the sorted grouped path
            return None
        if not ffn_fits(gate_up, down, act_cfg.kind, act_cfg.swiglu_limit,
                        rows=x_rows.shape[0]):
            return None
        return gathered_w4a8_ffn(x_rows, gate_up, down, ids,
                                 act=act_cfg.kind)

    def _grouped_ffn(x_sorted, gate_up, down, group_sizes, act_cfg):
        if gate_up.kind not in PALLAS_KINDS or down.kind not in PALLAS_KINDS:
            return None
        if _os.environ.get("KT_GROUPED_FFN", "1") == "0":
            return None
        from ktransformers_tpu.ops.pallas.quant_matmul import GROUP_BM

        if not grouped_ffn_fits(gate_up, down, act_cfg.kind,
                                act_cfg.swiglu_limit, bm=GROUP_BM):
            return None
        from ktransformers_tpu.ops.pallas.vjp import grouped_w4a8_ffn_diff

        return grouped_w4a8_ffn_diff(x_sorted, gate_up, down, group_sizes,
                                     act_cfg.kind)

    def _dense_ffn(rows, gate_up, down, act_cfg):
        if (gate_up.kind not in PALLAS_KINDS
                or down.kind not in PALLAS_KINDS):
            return None
        # r5: the old rows>128 gate (r3 bm=512 VMEM bust) is stale —
        # dense_w4a8_ffn self-fits bm by halving (lands at bm=64 for the
        # shared-expert shape) and at prefill M the fused launch measured
        # 0.176 vs 0.699 ms/layer unfused (scripts/probe_dense_ffn.py)
        if rows.shape[0] > int(_os.environ.get("KT_DENSE_FFN_MAX_M", "4096")):
            return None
        bc = dense_ffn_plan(gate_up, down, act_cfg.kind,
                            act_cfg.swiglu_limit)
        if bc is None:
            return None
        from ktransformers_tpu.ops.pallas.vjp import dense_w4a8_ffn_diff

        return dense_w4a8_ffn_diff(rows, gate_up, down, act_cfg.kind, bc)

    linear.set_pallas_qmatmul(_qmatmul)
    moe.set_pallas_gather(_gather)
    moe.set_pallas_gmm(_gmm)
    moe.set_pallas_ffn(_ffn)
    moe.set_pallas_grouped_ffn(_grouped_ffn)
    moe.set_pallas_dense_ffn(_dense_ffn)
    attention.set_pallas_mla_decode(_mla_decode)
    import os as _os

    if _os.environ.get("KT_MLA_FUSED", "1") != "0":
        attention.set_pallas_mla_fused(_mla_fused)

    from ktransformers_tpu.models import paged as paged_model
    from ktransformers_tpu.ops.pallas.paged_attention import (
        gqa_paged_decode,
        gqa_paged_prefill,
        mla_paged_decode,
        mla_paged_prefill,
    )

    paged_model.set_pallas_paged_decode(
        lambda qn, qp, ckv, kpe, pt, lens, scale: mla_paged_decode(
            qn, qp, ckv, kpe, pt, lens, scale
        ),
        lambda q, k, v, pt, lens, scale, window=0: gqa_paged_decode(
            q, k, v, pt, lens, scale, window=window
        ),
    )
    if _os.environ.get("KT_PAGED_PREFILL", "1") != "0":
        paged_model.set_pallas_paged_prefill(
            lambda qn, qp, ckv, kpe, pt, lens, valid, scale:
                mla_paged_prefill(qn, qp, ckv, kpe, pt, lens, valid, scale),
            lambda q, k, v, pt, lens, valid, scale, window:
                gqa_paged_prefill(q, k, v, pt, lens, valid, scale,
                                  window=window),
        )
    _ENABLED = True


def maybe_enable() -> bool:
    """Enable the kernels when running on a real accelerator."""
    if any(d.platform != "cpu" for d in jax.devices()):
        enable()
        return True
    return False
