"""Kernel lab 15 (r5): routed-MoE prefill split — lab14 put 1.94 of the
2.91 ms/layer in `routed` (S=512, T*k=3072 rows, 64 experts). Candidates:

  prep     : w4a8_prep activation quantization [7168, 2048]
  gmm_gu   : grouped_w4a8_matmul gate_up [3072,2048]x[64,1024,2816]
  gmm_dn   : grouped_w4a8_matmul down    [3072,1408]x[64,704,2048]
  dispatch : moe_dispatch + pad-scatter + unsort-gather + combine (no GEMM)
  router   : router matmul + route()

Roofline context: weights gate_up 189 MB + down 92 MB; kernel fetch with
the tile layout (112 tiles / 64 experts) is ~1.75x that. MXU int8 work
2x(7168*1024*2816 + 7168*704*2048) MACs ~= 0.3 ms at peak; the per-group
gs2=64 dots at bm=64 cap utilization at ~25%.

kernel_lab8 methodology: marginal in-program chained reps, scalar
readback, (T24-T4)/20.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RESULTS = {}


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from ktransformers_tpu.ops.gate import route
    from ktransformers_tpu.ops.moe import MoEConfig, moe_dispatch, moe_forward
    from ktransformers_tpu.ops.pallas.quant_matmul import grouped_tile_layout
    from ktransformers_tpu.ops.pallas.w4a8_matmul import (
        grouped_w4a8_matmul,
        w4a8_prep,
    )
    from ktransformers_tpu.models.init import init_params_synthetic
    from ktransformers_tpu.models.spec import spec_from_hf_config
    from scripts.profile_decode2 import BASE

    spec = spec_from_hf_config(
        dict(BASE, max_position_embeddings=2048, num_hidden_layers=2)
    )
    params = init_params_synthetic(spec, quant="int4_g", moe_quant="int4_g")
    jax.block_until_ready(params)
    from ktransformers_tpu.ops import pallas as pallas_ops
    from ktransformers_tpu.utils.device_prep import prepare_params

    params = prepare_params(params, pallas_ops.maybe_enable(), spec)
    moe_p = params["layers"][1]["moe"]
    gate_up, down = moe_p["experts"].gate_up, moe_p["experts"].down
    print("params ready", flush=True)

    T, k, e = 512, spec.moe.top_k, spec.moe.num_experts
    D = spec.hidden_size
    inter = spec.moe.moe_intermediate_size
    M = T * k

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(
        rng.standard_normal((T, D)).astype(np.float32) * 0.02
    ).astype(jnp.bfloat16)
    xs0 = jnp.asarray(
        rng.standard_normal((M, D)).astype(np.float32) * 0.02
    ).astype(jnp.bfloat16)
    a0 = jnp.asarray(
        rng.standard_normal((M, inter)).astype(np.float32) * 0.02
    ).astype(jnp.bfloat16)
    # balanced routing: 48 rows/expert
    gsz = jnp.full((e,), M // e, jnp.int32)
    topk0 = jnp.asarray(
        rng.integers(0, e, (T, k)).astype(np.int32)
    )
    topkw0 = jnp.ones((T, k), jnp.float32) / k

    R_HI, R_LO = 24, 4

    def timed(fn, x_init, extra, reps, iters=5):
        @jax.jit
        def f(x, *ex):
            for i in range(reps):
                if i:
                    ysc = x.reshape(-1)[0]
                    gate = jnp.where(jnp.isfinite(ysc), 1.0, 0.0)
                    x = x * gate.astype(x.dtype)
                x = fn(x, *ex)
            return x.reshape(-1)[0]

        float(f(x_init, *extra))
        best = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter()
            float(f(x_init, *extra))
            best = min(best, time.perf_counter() - t0)
        return best

    def marginal(name, fn, x_init, extra=()):
        hi = timed(fn, x_init, extra, R_HI)
        lo = timed(fn, x_init, extra, R_LO)
        dt = (hi - lo) / (R_HI - R_LO) * 1e3
        print(f"  {name:9s}: {dt:8.3f} ms/rep (T{R_HI}={hi*1e3:.0f} "
              f"T{R_LO}={lo*1e3:.0f})", flush=True)
        RESULTS[name] = round(dt, 3)

    # --- pieces ---
    def v_prep(x, *ex):
        qa, qb, sa, sb, t, xsum = w4a8_prep(x, D, gate_up.group_size)
        y = qa[:, :1].astype(jnp.bfloat16) * sa[:, :1] + x[:, :1]
        return x + y * 0 + sb[:, :1].astype(x.dtype) * 0

    def v_gmm_gu(x, gu, g):
        y = grouped_w4a8_matmul(x, gu, g)  # [M, 2*inter]
        return x + y[:, :D].astype(x.dtype) * jnp.bfloat16(0.001)

    def v_gmm_dn(x, dn, g):
        y = grouped_w4a8_matmul(x, dn, g)  # [M, D]
        return x + y[:, :inter].astype(x.dtype) * jnp.bfloat16(0.001)

    def v_dispatch(x, ti, tw):
        sort_order, token_of_row, group_sizes, keep = moe_dispatch(
            ti, e, logical_to_physical=None, expert_mask=None
        )
        xs = x[token_of_row]
        y = xs * jnp.bfloat16(1.001)  # stand-in for the GEMMs
        combine = (tw.reshape(-1) * keep)[sort_order]
        y = y * combine[:, None].astype(y.dtype)
        inv = jnp.argsort(sort_order)
        y = y[inv].reshape(T, k, D)
        return x + jnp.sum(y, axis=1).astype(x.dtype) * 0.001

    def v_router(x, rw):
        logits = x.astype(jnp.float32) @ rw.astype(jnp.float32).T
        idx, w = route(logits, spec.moe.gate, moe_p.get("router_bias_corr"))
        return x + (w[:, :1] + idx[:, :1].astype(jnp.float32)).astype(
            x.dtype
        ) * 0

    def v_full(x, ew, ti, tw):
        y = moe_forward(x, ew, ti, tw,
                        MoEConfig(activation=spec.activation))
        return x + y * jnp.bfloat16(0.001)

    marginal("full", v_full, x0, (moe_p["experts"], topk0, topkw0))
    marginal("gmm_gu", v_gmm_gu, xs0, (gate_up, gsz))
    marginal("gmm_dn", v_gmm_dn, a0, (down, gsz))
    marginal("prep", v_prep, jnp.pad(xs0, ((0, 7168 - M), (0, 0))))
    marginal("dispatch", v_dispatch, x0, (topk0, topkw0))
    marginal("router", v_router, x0, (moe_p["router_w"],))
    print(RESULTS, flush=True)


if __name__ == "__main__":
    main()
