"""Long-context decode benchmark: 64K context on one v5e chip, dense
paged decode vs Quest sparse top-K-page decode (VERDICT r1 item 8).

The KV is synthesized directly at full length (what matters for decode
cost is reading it, not how it was produced); page summaries are built
from the same KV so selection quality is realistic for random data.
Prints one JSON line and writes BENCH_LONGCTX.json for bench.py to fold
into the round metrics."""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ctx", type=int, default=65536)
    ap.add_argument("--page", type=int, default=64)
    ap.add_argument("--budget", type=int, default=64)
    ap.add_argument("--steps", type=int, default=64)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from ktransformers_tpu.cache.paged import PagedKVCache
    from ktransformers_tpu.models.init import init_params_synthetic
    from ktransformers_tpu.models.paged import forward_paged
    from ktransformers_tpu.models.spec import spec_from_hf_config
    from ktransformers_tpu.ops import pallas as kpallas
    from ktransformers_tpu.ops.sparse_attention import update_page_summaries

    kpallas.maybe_enable()

    cfg = dict(
        model_type="deepseek_v2", vocab_size=102400, hidden_size=2048,
        intermediate_size=10944, moe_intermediate_size=1408,
        num_hidden_layers=27, num_attention_heads=16,
        num_key_value_heads=16, n_shared_experts=2, n_routed_experts=64,
        num_experts_per_tok=6, first_k_dense_replace=1, moe_layer_freq=1,
        topk_method="greedy", norm_topk_prob=False,
        routed_scaling_factor=1.0, scoring_func="softmax", kv_lora_rank=512,
        q_lora_rank=None, qk_rope_head_dim=64, qk_nope_head_dim=128,
        v_head_dim=128, max_position_embeddings=131072, rms_norm_eps=1e-6,
        rope_theta=10000.0,
    )
    spec = spec_from_hf_config(cfg)
    params = init_params_synthetic(spec, quant="int8", moe_quant="int4_g")
    jax.block_until_ready(params)
    print("params ready", file=sys.stderr)

    npages = args.ctx // args.page + 2
    results = {}

    for mode, budget in (("dense", None), ("sparse", args.budget)):
        kv = PagedKVCache.create(
            spec, num_pages=npages, page_size=args.page,
            summaries=budget is not None,
        )
        # synthesize a full-length KV + summaries
        key = jax.random.PRNGKey(0)
        bufs_a, bufs_b, smin, smax = [], [], [], []
        pid = jnp.repeat(jnp.arange(npages), args.page)[None]
        for li in range(spec.num_layers):
            key, k1, k2 = jax.random.split(key, 3)
            a = jax.random.normal(k1, kv.bufs_a[li].shape, kv.bufs_a[li].dtype)
            b = jax.random.normal(k2, kv.bufs_b[li].shape, kv.bufs_b[li].dtype)
            bufs_a.append(a)
            bufs_b.append(b)
            if budget is not None:
                cat = jnp.concatenate([a, b], -1).reshape(
                    1, npages * args.page, -1
                )
                mn, mx = update_page_summaries(
                    kv.smin[li], kv.smax[li], cat, pid
                )
                smin.append(mn)
                smax.append(mx)
        kv = PagedKVCache(
            bufs_a=bufs_a, bufs_b=bufs_b,
            smin=smin or None, smax=smax or None, page_size=args.page,
        )
        pt = jnp.arange(1, npages, dtype=jnp.int32)[None]
        length = jnp.asarray([args.ctx - 1], jnp.int32)

        from functools import partial

        # params/pt/length are ARGUMENTS, not closures: closed-over arrays
        # ship inside the HLO to the remote compile service (CLAUDE.md) —
        # a 9.77 GB params closure made this compile hang at >50 GB RSS
        @partial(jax.jit, donate_argnums=(2,), static_argnames=("b",))
        def step(params, tok, kv, pt, length, b=budget):
            logits, kv = forward_paged(
                params, spec, tok, kv, pt, length, sparse_budget=b,
            )
            return jnp.argmax(logits[:, -1], -1).astype(jnp.int32), kv

        tok = jnp.zeros((1, 1), jnp.int32)
        t0 = time.perf_counter()
        tok, kv = step(params, tok, kv, pt, length)
        jax.block_until_ready(tok)
        print(f"{mode} compile {time.perf_counter()-t0:.1f}s", file=sys.stderr)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            tok, kv = step(params, tok.reshape(1, 1), kv, pt, length)
        jax.block_until_ready(tok)
        dt = (time.perf_counter() - t0) / args.steps
        results[mode] = round(1.0 / dt, 2)
        print(f"{mode}: {1.0/dt:.2f} tok/s", file=sys.stderr)

    out = {
        "metric": f"decode tok/s @ {args.ctx // 1024}K ctx (16B int4, 1 chip)",
        "dense_tok_s": results["dense"],
        "sparse_tok_s": results["sparse"],
        "sparse_budget_pages": args.budget,
        "page_size": args.page,
    }
    print(json.dumps(out))
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_LONGCTX.json")
    merged = {}
    try:
        with open(path) as f:
            prev = json.load(f)
        merged = prev if "dense_tok_s" not in prev else {
            prev["metric"].split(" @ ")[1].split(" ")[0]: prev
        }
    except Exception:
        pass
    merged[f"{args.ctx // 1024}K"] = out
    with open(path, "w") as f:
        json.dump(merged, f)


if __name__ == "__main__":
    main()
