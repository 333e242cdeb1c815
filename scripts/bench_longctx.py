"""Long-context decode benchmark (r4): anchor-type A/B + deep-context
rows, honest paced-readback timing (r1-r3 numbers used block_until_ready,
which does not block on this backend).

Rows:
- 64K ctx, 27-layer 16B model: dense vs sparse with each anchor kind
  (quest / block_max / block_mean / fixed) — the reference's AnchorType
  A/B (kvcache.h:52-99)
- 128K ctx, 27-layer: dense vs quest
- 256K and 512K ctx, 12-layer model slice (the 27-layer model's KV at
  256K is 8.2 GB and would not fit next to 9.3 GB of weights on one
  16 GB chip — the slice keeps layer math identical): quest decode +
  one 2048-token prefill chunk AT DEPTH (prefill rate with 250K+ cached)

Writes BENCH_LONGCTX.json.
"""

import argparse
import collections
import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--page", type=int, default=64)
    ap.add_argument("--budget", type=int, default=64)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--one", nargs=3, metavar=("LAYERS", "CTX", "MODE"),
                    help="run ONE measurement in this process (MODE may "
                    "be an anchor kind, 'dense', or 'prefill'); prints "
                    "one JSON line. The driver loop runs each "
                    "measurement in a fresh subprocess — compiled "
                    "programs + buffers from prior modes otherwise "
                    "accumulate in HBM and OOM by the 4th mode.")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from ktransformers_tpu.cache.paged import PagedKVCache
    from ktransformers_tpu.models.init import init_params_synthetic
    from ktransformers_tpu.models.paged import forward_paged
    from ktransformers_tpu.models.spec import spec_from_hf_config
    from ktransformers_tpu.ops import pallas as kpallas
    from ktransformers_tpu.ops.rope import precompute_rope_tables

    kpallas.maybe_enable()

    def model_cfg(layers):
        return dict(
            model_type="deepseek_v2", vocab_size=102400, hidden_size=2048,
            intermediate_size=10944, moe_intermediate_size=1408,
            num_hidden_layers=layers, num_attention_heads=16,
            num_key_value_heads=16, n_shared_experts=2, n_routed_experts=64,
            num_experts_per_tok=6, first_k_dense_replace=1, moe_layer_freq=1,
            topk_method="greedy", norm_topk_prob=False,
            routed_scaling_factor=1.0, scoring_func="softmax",
            kv_lora_rank=512, q_lora_rank=None, qk_rope_head_dim=64,
            qk_nope_head_dim=128, v_head_dim=128,
            max_position_embeddings=1 << 20, rms_norm_eps=1e-6,
            rope_theta=10000.0,
        )

    out = {"page_size": args.page, "sparse_budget_pages": args.budget}

    NEED_PLANES = {
        "dense": (), "quest": ("smin", "smax"),
        "block_max": ("smin", "smax"),
        "block_mean": ("smin", "smax", "ssum"),
        "fixed": ("smin", "smax", "sfix"),
    }

    def bench_ctx(spec, params, ctx, modes, do_prefill_at_depth=False):
        npages = ctx // args.page + 2
        need = set()
        for mode in modes:
            need |= set(NEED_PLANES.get(mode, ()))
        kv0 = PagedKVCache.create(
            spec, num_pages=npages, page_size=args.page,
            summaries=bool(need), anchor="block_mean",
        )
        # synthesize full-length KV + ONLY the planes these modes read;
        # block per layer — async dispatch otherwise allocates many
        # transient [P, page, R] normals ahead of frees and OOMs
        key = jax.random.PRNGKey(0)
        bufs_a, bufs_b = [], []
        planes = {n: [] for n in need}

        shape_a, dtype_a = kv0.bufs_a[0].shape, kv0.bufs_a[0].dtype
        shape_b, dtype_b = kv0.bufs_b[0].shape, kv0.bufs_b[0].dtype

        @jax.jit
        def synth(k1, k2):
            a = jax.random.normal(k1, shape_a, dtype_a)
            b = jax.random.normal(k2, shape_b, dtype_b)
            # pages are dense-filled here, so per-page reductions give
            # the summary planes directly (the per-step scatter form in
            # update_page_summaries_cfg materialized a [1, S, 576] f32
            # cat per layer — 1.2 GB at 512K, the OOM)
            cat_min = jnp.concatenate(
                [a.min(1).astype(jnp.float32),
                 b.min(1).astype(jnp.float32)], -1)
            cat_max = jnp.concatenate(
                [a.max(1).astype(jnp.float32),
                 b.max(1).astype(jnp.float32)], -1)
            cat_sum = jnp.concatenate(
                [a.sum(1).astype(jnp.float32),
                 b.sum(1).astype(jnp.float32)], -1)
            cat_fix = jnp.concatenate(
                [a[:, 0].astype(jnp.float32),
                 b[:, 0].astype(jnp.float32)], -1)
            return a, b, {"smin": cat_min, "smax": cat_max,
                          "ssum": cat_sum, "sfix": cat_fix}

        del kv0
        for li in range(spec.num_layers):
            key, k1, k2 = jax.random.split(key, 3)
            a, b, pl = synth(k1, k2)
            bufs_a.append(a)
            bufs_b.append(b)
            for n in need:
                planes[n].append(pl[n])
            jax.block_until_ready((a, b))
        pt = jnp.arange(1, npages, dtype=jnp.int32)[None]
        length = jnp.asarray([ctx - 1], jnp.int32)
        row = {}

        for mode in modes:
            budget = None if mode == "dense" else args.budget
            anchor = "quest" if mode == "dense" else mode
            keep = NEED_PLANES[mode]
            kv = PagedKVCache(
                bufs_a=bufs_a, bufs_b=bufs_b,
                **{n: list(planes[n]) if n in keep else None
                   for n in ("smin", "smax", "ssum", "sfix")},
                page_size=args.page,
            )

            @partial(jax.jit, donate_argnums=(2,),
                     static_argnames=("b", "anc"))
            def step(params, tok, kv, pt, length, rope, b=budget,
                     anc=anchor):
                # rope tables MUST be jit arguments: at 1M max positions
                # the trace-time-computed tables embed 536 MB of
                # constants and the compile request gets HTTP 413
                logits, kv = forward_paged(
                    params, spec, tok, kv, pt, length, rope_tables=rope,
                    sparse_budget=b, sparse_anchor=anc,
                )
                return (
                    jnp.argmax(logits[:, -1], -1).astype(jnp.int32), kv
                )

            rope = precompute_rope_tables(spec.rope)
            tok = jnp.zeros((1, 1), jnp.int32)
            t0 = time.perf_counter()
            tok, kv = step(params, tok, kv, pt, length, rope)
            _ = int(np.asarray(tok)[0])
            print(f"ctx {ctx//1024}K {mode}: compile "
                  f"{time.perf_counter()-t0:.1f}s", file=sys.stderr,
                  flush=True)
            pending = collections.deque()
            t0 = time.perf_counter()
            for _ in range(args.steps):
                tok, kv = step(params, tok.reshape(1, 1), kv, pt, length,
                               rope)
                try:
                    tok.copy_to_host_async()
                except Exception:
                    pass
                pending.append(tok)
                if len(pending) > 8:
                    _ = int(np.asarray(pending.popleft())[0])
            while pending:
                _ = int(np.asarray(pending.popleft())[0])
            dt = (time.perf_counter() - t0) / args.steps
            row[mode + "_tok_s"] = round(1.0 / dt, 2)
            print(f"ctx {ctx//1024}K {mode}: {1.0/dt:.2f} tok/s",
                  file=sys.stderr, flush=True)
            bufs_a, bufs_b = list(kv.bufs_a), list(kv.bufs_b)

        if do_prefill_at_depth:
            if not modes:  # --one prefill: no mode loop ran
                kv = PagedKVCache(
                    bufs_a=bufs_a, bufs_b=bufs_b, page_size=args.page,
                )
                rope = precompute_rope_tables(spec.rope)
            chunk = int(os.environ.get("KT_LONGCTX_CHUNK", "2048"))
            toks = jnp.zeros((1, chunk), jnp.int32)
            depth = jnp.asarray([ctx - chunk - 2], jnp.int32)

            @partial(jax.jit, donate_argnums=(2,))
            def pre_step(params, toks, kv, pt, depth, rope):
                # donate kv: without it the in+out page pools co-reside
                # (2x 7.2 GB at 1M/6-layer -> RESOURCE_EXHAUSTED)
                logits, kv = forward_paged(
                    params, spec, toks, kv, pt, depth, rope_tables=rope,
                    logits_last_only=True,
                )
                return (
                    jnp.argmax(logits[:, -1], -1).astype(jnp.int32), kv
                )

            rope = precompute_rope_tables(spec.rope)
            t0 = time.perf_counter()
            tok1, kv = pre_step(params, toks, kv, pt, depth, rope)
            _ = int(np.asarray(tok1)[0])
            print(f"ctx {ctx//1024}K prefill-at-depth compile "
                  f"{time.perf_counter()-t0:.1f}s", file=sys.stderr)
            n = 4
            prev = None
            t0 = time.perf_counter()
            for _ in range(n):
                tok1, kv = pre_step(params, toks, kv, pt, depth, rope)
                try:
                    tok1.copy_to_host_async()
                except Exception:
                    pass
                if prev is not None:
                    _ = int(np.asarray(prev)[0])
                prev = tok1
            _ = int(np.asarray(prev)[0])
            dt = (time.perf_counter() - t0) / n
            row["prefill_chunk_at_depth_tok_s"] = round(chunk / dt, 1)
            print(f"ctx {ctx//1024}K prefill-at-depth: "
                  f"{chunk/dt:.0f} tok/s", file=sys.stderr)
        del kv
        return row

    if args.one:
        layers, ctx, mode = int(args.one[0]), int(args.one[1]), args.one[2]
        spec = spec_from_hf_config(model_cfg(layers))
        params = init_params_synthetic(spec, quant="int4_g",
                                       moe_quant="int4_g")
        jax.block_until_ready(params)
        if mode == "prefill":
            row = bench_ctx(spec, params, ctx, [],
                            do_prefill_at_depth=True)
        else:
            row = bench_ctx(spec, params, ctx, [mode])
        print(json.dumps(row))
        return

    # driver: one subprocess per measurement (fresh HBM each)
    import subprocess

    MATRIX = [
        ("64K", 27, 65536,
         ["dense", "quest", "block_max", "block_mean", "fixed"]),
        ("128K", 27, 131072, ["dense", "quest"]),
        ("256K_12layer", 12, 262144, ["dense", "quest", "prefill"]),
        ("512K_12layer", 12, 524288, ["quest"]),
        # 1M row (VERDICT r4 item 7; reference: 1M ctx @ ~16 tok/s,
        # long_context_introduction.md:7). 6-layer slice: 12-layer KV at
        # 1M is 14.4 GB and cannot sit beside any weights; 6 layers =
        # 7.2 GB KV + 2.1 GB weights. Scale by 27/6 for the full model.
        # Needle-accuracy at 1M is recorded per anchor in
        # BENCH_NEEDLE.json (scripts/bench_needle.py).
        ("1M_6layer", 6, 1048576, ["quest", "block_max", "prefill"]),
    ]
    for name, layers, ctx, modes in MATRIX:
        row = {}
        for mode in modes:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--one", str(layers), str(ctx), mode,
                 "--steps", str(args.steps),
                 "--budget", str(args.budget),
                 "--page", str(args.page)],
                capture_output=True, text=True, timeout=2400,
            )
            sys.stderr.write(r.stderr[-2000:])
            try:
                row.update(json.loads(r.stdout.strip().splitlines()[-1]))
            except Exception:
                row[mode] = "FAILED"
        out[name] = row

    out["note"] = (
        "r4 paced-readback methodology (earlier rounds' numbers used the "
        "broken block_until_ready barrier). 256K/512K rows run a 12-layer "
        "slice of the same model (27-layer KV at 256K is 8.2 GB and the "
        "16B weights leave no room on one 16 GB chip); per-layer cost is "
        "identical, so scale by 27/12 (27/6 for the 1M row) for the "
        "full-model estimate. Retrieval accuracy per anchor/depth incl. "
        "1M: BENCH_NEEDLE.json."
    )
    print(json.dumps(out))
    with open("/root/repo/BENCH_LONGCTX.json", "w") as f:
        json.dump(out, f)


if __name__ == "__main__":
    main()
