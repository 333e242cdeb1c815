"""Prefill ablation: time each component of the 512-token prefill step at
its real shape, chained through data dependencies (single-shot timings lie
under async dispatch + the tunnel; CLAUDE.md).

Pieces (16B bench model, S=512):
  - dense W4A8 matmuls per layer: fused qkv_a [2048->3648], o_proj
    [2048->2048], shared FFN (gate_up 2048->5632, down 2816->2048)
  - dense-layer FFN (layer 0): 2048->21888, 10944->2048
  - grouped MoE per layer: gate_up [64 experts, 2048->2816] over 3072 rows,
    down [1408->2048]
  - routing + dispatch glue (argsort/bincount/scatter)
  - MLA attention blockwise at S=512
  - lm_head [2048->102400]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache",
        ),
    )

    from ktransformers_tpu.ops import pallas as pallas_ops

    pallas_ops.enable()
    from ktransformers_tpu.ops.moe import moe_dispatch
    from ktransformers_tpu.ops.pallas.quant_matmul import quant_matmul
    from ktransformers_tpu.ops.pallas.w4a8_matmul import grouped_w4a8_matmul
    from ktransformers_tpu.quant.formats import quantize
    from ktransformers_tpu.quant.w4a8 import repack_offset_lo

    rng = np.random.default_rng(0)
    S = 512
    H = 2048

    def qt_of(k, n, gs=128):
        w = jnp.asarray(rng.standard_normal((k, n)).astype(np.float32) * 0.02)
        return repack_offset_lo(quantize(w, "int4_g", group_size=gs))

    def eqt_of(e, k, n, gs=128):
        w = jnp.asarray(
            rng.standard_normal((e, k, n)).astype(np.float32) * 0.02
        )
        return repack_offset_lo(quantize(w, "int4_g", group_size=gs))

    x = jnp.asarray(rng.standard_normal((S, H)).astype(np.float32)).astype(
        jnp.bfloat16
    )

    R_HI, R_LO = 48, 8

    def _timed(fn, x0, *rest, reps, iters=4):
        @jax.jit
        def f(x, *rest):
            # weights ride as jit ARGUMENTS: closed-over arrays ship in
            # the HLO body (HTTP 413 / re-uploaded per dispatch)
            y = fn(x, *rest)
            for _ in range(reps - 1):
                ysc = y.reshape(-1)[0]
                gate = jnp.where(jnp.isfinite(ysc), 1.0, 0.0)
                y = fn(x * gate.astype(x.dtype), *rest)
            return y.reshape(-1)[0]

        float(f(x0, *rest))  # warm
        t0 = time.perf_counter()
        for _ in range(iters):
            # scalar readback = the only real barrier on axon
            # (block_until_ready returns early; CLAUDE.md r4 note)
            float(f(x0, *rest))
        return (time.perf_counter() - t0) / iters

    def timeit(name, fn, x0, *rest, iters=4):
        """Marginal per-rep cost (T(12)-T(4))/8 of fn chained inside one
        jitted program — dispatch overhead and the tunnel RTT cancel."""
        hi = _timed(fn, x0, *rest, reps=R_HI, iters=iters)
        lo = _timed(fn, x0, *rest, reps=R_LO, iters=iters)
        dt = (hi - lo) / (R_HI - R_LO) * 1e3
        print(f"{name:34s}: {dt:8.3f} ms", flush=True)
        return dt

    total = 0.0

    # fused qkv_a: q 16*(128+64)=3072 + ckv_kpe 576 -> 3648
    qkv = qt_of(H, 3648)
    total += 26 * timeit("qkv_a (x26)", quant_matmul, x, qkv)
    oproj = qt_of(H, H)
    total += 26 * timeit("o_proj (x26)", quant_matmul, x, oproj)

    # shared experts FFN (26 MoE layers)
    sh_gu = qt_of(H, 5632)
    sh_dn = qt_of(2816, H)

    def shared_ffn(x, gu, dn):
        h = quant_matmul(x, gu)
        a = (h[:, :2816] * jax.nn.sigmoid(h[:, :2816]) * h[:, 2816:]).astype(
            x.dtype
        )
        return quant_matmul(a, dn)

    total += 26 * timeit("shared FFN (x26)", shared_ffn, x, sh_gu, sh_dn)

    # dense layer 0 FFN
    d_gu = qt_of(H, 21888)
    d_dn = qt_of(10944, H)

    def dense_ffn(x, gu, dn):
        h = quant_matmul(x, gu)
        a = (
            h[:, :10944] * jax.nn.sigmoid(h[:, :10944]) * h[:, 10944:]
        ).astype(x.dtype)
        return quant_matmul(a, dn)

    total += timeit("dense-layer FFN (x1)", dense_ffn, x, d_gu, d_dn)

    # grouped MoE: 512 tokens x 6 experts
    E, K = 64, 6
    gu = eqt_of(E, H, 2816)
    dn = eqt_of(E, 1408, H)
    ids = jnp.asarray(rng.integers(0, E, (S, K)), jnp.int32)

    def moe(x, gu, dn, ids):
        order, token_of_row, sizes, keep = moe_dispatch(ids, E)
        xs = x[token_of_row]
        h = grouped_w4a8_matmul(xs, gu, sizes)
        a = (h[:, :1408] * jax.nn.sigmoid(h[:, :1408]) * h[:, 1408:]).astype(
            x.dtype
        )
        y = grouped_w4a8_matmul(a, dn, sizes)
        inv = jnp.argsort(order)
        return jnp.sum(y[inv].reshape(S, K, H), axis=1)

    total += 26 * timeit("grouped MoE (x26)", moe, x, gu, dn, ids)

    def dispatch_only(x, ids):
        order, token_of_row, sizes, keep = moe_dispatch(ids, E)
        xs = x[token_of_row]
        inv = jnp.argsort(order)
        return xs[inv].reshape(S, K, H).sum(1)

    timeit("  (dispatch glue only)", dispatch_only, x, ids)

    # MLA attention: absorbed blockwise at S=512, cache 1024
    from ktransformers_tpu.ops.attention import mla_absorbed_blockwise

    B, Hh, R, Dr = 1, 16, 512, 64
    qn = jnp.asarray(
        rng.standard_normal((B, Hh, S, R)).astype(np.float32)
    ).astype(jnp.bfloat16)
    qp = jnp.asarray(
        rng.standard_normal((B, Hh, S, Dr)).astype(np.float32)
    ).astype(jnp.bfloat16)
    ckv = jnp.asarray(
        rng.standard_normal((B, 1024, R)).astype(np.float32)
    ).astype(jnp.bfloat16)
    kpe = jnp.asarray(
        rng.standard_normal((B, 1024, Dr)).astype(np.float32)
    ).astype(jnp.bfloat16)
    qpos = jnp.arange(S, dtype=jnp.int32)[None]

    def attn(qn, qp, ckv, kpe, qpos):
        return mla_absorbed_blockwise(qn, qp, ckv, kpe, qpos, scale=0.1)

    total += 27 * timeit("MLA blockwise attn (x27)", attn, qn, qp, ckv,
                         kpe, qpos)

    lm = qt_of(H, 102400)
    total += timeit("lm_head (x1)", quant_matmul, x, lm)

    print(f"{'SUM of pieces':34s}: {total:8.3f} ms "
          f"(-> {512/total*1e3:.0f} tok/s ceiling)")


if __name__ == "__main__":
    main()
