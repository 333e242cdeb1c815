"""Benchmark: DeepSeek-V2-Lite (16B-A2.4B) shaped MoE, int4 experts, one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "tok/s", "vs_baseline": N}

Baseline anchor: the reference's best published *single-user decode* for its
CPU+GPU hetero stack, 13.69 tok/s (DeepSeek-V3 671B Q4_K_M, 2x Xeon 6454S +
RTX 4090D; doc/en/DeepseekR1_V3_tutorial.md:137-141, see BASELINE.md). This
round benches the PR1 config (DeepSeek-V2-Lite class, SURVEY.md §7 stage 2)
on one TPU v5e chip; multi-chip 671B comes in later rounds.
"""

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import os

    import jax

    # Persistent compilation cache: the remote compile service's latency
    # varies from ~60s to ~500s per program; cached runs skip it entirely.
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    import jax.numpy as jnp

    from ktransformers_tpu.engine.generate import Generator
    from ktransformers_tpu.models.init import init_params_synthetic
    from ktransformers_tpu.models.spec import spec_from_hf_config

    # DeepSeek-V2-Lite architecture (deepseek-ai/DeepSeek-V2-Lite config).
    cfg = dict(
        model_type="deepseek_v2",
        vocab_size=102400,
        hidden_size=2048,
        intermediate_size=10944,
        moe_intermediate_size=1408,
        num_hidden_layers=27,
        num_attention_heads=16,
        num_key_value_heads=16,
        n_shared_experts=2,
        n_routed_experts=64,
        num_experts_per_tok=6,
        first_k_dense_replace=1,
        moe_layer_freq=1,
        topk_method="greedy",
        norm_topk_prob=False,
        routed_scaling_factor=1.0,
        scoring_func="softmax",
        kv_lora_rank=512,
        q_lora_rank=None,
        qk_rope_head_dim=64,
        qk_nope_head_dim=128,
        v_head_dim=128,
        max_position_embeddings=2048,
        rms_norm_eps=1e-6,
        rope_theta=10000.0,
    )
    spec = spec_from_hf_config(cfg)
    log("devices:", jax.devices())

    t0 = time.perf_counter()
    # Round-3 config change: dense/attn/lm_head now default int4_g. The r2
    # negative result (int4_g dense 214 vs int8 270 tok/s) was the
    # bf16-dequant VPU kernel; the all-M W4A8 path (int8-MXU dots on packed
    # bytes, per-group decode temps) streams int4 at full rate: measured
    # 302-310 tok/s vs int8's 274, and the K=10944 VMEM bust is gone
    # (effective_group_size now picks 96 for the dense MLP).
    quant = os.environ.get("KT_BENCH_QUANT", "int4_g")
    moe_quant = os.environ.get("KT_BENCH_MOE_QUANT", "int4_g")
    params = init_params_synthetic(spec, quant=quant, moe_quant=moe_quant)
    # NOTE: ops/fuse_shared.fuse_shared_experts measured -4% here (the
    # gather re-reads shared blocks per row; the dense matmuls read them
    # once per batch) — kept as an opt-in transform, not used in bench.
    jax.block_until_ready(params)
    nbytes = sum(
        x.size * x.dtype.itemsize for x in jax.tree.leaves(params)
    )
    log(f"params ready in {time.perf_counter()-t0:.1f}s, {nbytes/1e9:.2f} GB")

    t_start = time.perf_counter()
    gen = Generator(params, spec, max_len=1024, batch=1)

    prompt_len = 512
    tokens = jnp.asarray(
        np.random.default_rng(0).integers(0, cfg["vocab_size"], (1, prompt_len)),
        jnp.int32,
    )

    # --- decode FIRST (the headline metric) over a synthetically-lengthed
    # cache, so remote-compile slowness on the prefill path can never
    # starve it ---
    import dataclasses as _dc

    from ktransformers_tpu.engine.sampler import SamplingConfig

    cache2 = gen.new_cache()
    cache2 = _dc.replace(
        cache2, lengths=jnp.full_like(cache2.lengths, prompt_len)
    )
    decode = gen._decode_step(SamplingConfig())
    key = jax.random.PRNGKey(0)
    tok = jnp.zeros((1,), jnp.int32)
    t0 = time.perf_counter()
    tok, cache2, key = decode(tok[:, None], cache2, key)
    jax.block_until_ready(tok)
    log(f"decode compile: {time.perf_counter()-t0:.1f}s")

    # Depth-paced pipeline with REAL per-token readbacks — every token is
    # read to host numpy, D steps late, so the number is tokens a user
    # actually receives per second. Methodology notes (r4):
    # - block_until_ready does NOT block on axon; the old chained loop +
    #   block measured host DISPATCH rate (~3 ms/step -> the r1-r3
    #   "decode 275-337 tok/s" numbers), not device execution.
    # - a single trailing readback after 128 queued steps trips tunnel
    #   backpressure (~8.4 ms/step measured); pacing at depth 8 keeps the
    #   queue short and the readbacks land async (engine/generate.py's
    #   pipeline — its measured plateau was ~185 tok/s incl. host loop).
    # Readback rule (r4, hard-won): np.asarray() of the WHOLE token array
    # consumes the copy_to_host_async bytes that landed while later steps
    # ran. Indexing (tok[0]) instead dispatches a NEW device op that
    # queues BEHIND every in-flight step — it serializes the pipeline and
    # pays queue + RTT per readback (measured 25.7 tok/s vs ~200 real).
    import collections

    n_steps = 192
    depth = 24  # r5: depth sweep shows 8 -> ~230-295, 16 -> ~319,
    # 24-64 -> ~350 plateau (scripts/ab_decode2.py); past ~24 the cap is
    # device content + ~1.3 ms/program tunnel-side work, not the pipeline
    pending = collections.deque()
    t0 = time.perf_counter()
    for _ in range(n_steps):
        tok, cache2, key = decode(tok[:, None], cache2, key)
        try:
            tok.copy_to_host_async()
        except Exception:  # pragma: no cover
            pass
        pending.append(tok)
        if len(pending) > depth:
            _ = int(np.asarray(pending.popleft())[0])
    while pending:
        _ = int(np.asarray(pending.popleft())[0])
    decode_s = time.perf_counter() - t0
    decode_tps = n_steps / decode_s
    log(f"decode: {decode_tps:.2f} tok/s (depth-{depth} paced, real "
        f"readbacks)")
    # NEGATIVE RESULT (measured r3, do not retry blindly): a k-step
    # lax.scan decode program (_decode_steps) amortizes dispatch on normal
    # runtimes but hits the axon program-size dispatch cliff here: k=2
    # unrolled = 387 ms/dispatch (vs 3.7 ms single-step); scan unroll=1
    # iterates host-side at ~36 ms/step. Keep single-step dispatches.

    # --- prefill (NON-OPTIONAL; VERDICT r3 item 1: BENCH_r03 shipped with
    # prefill null because a kernel VMEM bust was swallowed by a broad
    # except behind a 240 s budget). Methodology (r4): every iteration's
    # logits are READ BACK one iteration late (depth-1 pacing) — on axon
    # only a device->host read is a real barrier, and the old structure
    # (a separate argmax "chain" program alternating with the prefill
    # program) measured 77 s/prefill from program-alternation pathology
    # while the same prefill back-to-back runs at ~96 ms
    # (scripts/prefill_bisect.py). Iterations are independent prefills of
    # pre-created caches — exactly serving's workload shape.
    prefill_tps = None
    prefill_compile_s = None
    try:
        from ktransformers_tpu.models.model import forward as _fwd

        spec_, rope_, cdt_ = gen.spec, gen.rope_tables, gen.compute_dtype

        # bench-local step: prefill + in-program argmax, so the per-iter
        # readback is ONE int32 np.asarray of a landed async copy (a
        # [1, V] logits readback is 400 KB over the tunnel; an indexing
        # op would queue behind the pipeline — see the decode loop note)
        from functools import partial as _part

        @_part(jax.jit, donate_argnums=(2,))
        def pre_step(params, toks, cache):
            logits, cache = _fwd(
                params, spec_, toks, cache, rope_tables=rope_,
                compute_dtype=cdt_, logits_last_only=True,
            )
            return jnp.argmax(logits[:, -1], -1).astype(jnp.int32), cache

        t0 = time.perf_counter()
        tok1, _ = pre_step(gen.params, tokens, gen.new_cache())
        _ = int(np.asarray(tok1)[0])
        prefill_compile_s = time.perf_counter() - t0

        n_pre = 12
        # pre-create the caches OUTSIDE the timed loop: KVCache.create
        # is 54 zeros dispatches at ~1-2 ms of axon host time each
        caches = [gen.new_cache() for _ in range(n_pre)]
        jax.block_until_ready(caches)
        prev = None
        t0 = time.perf_counter()
        for i in range(n_pre):
            tok1, _ = pre_step(gen.params, tokens, caches[i])
            try:
                tok1.copy_to_host_async()
            except Exception:  # pragma: no cover
                pass
            if prev is not None:
                _ = int(np.asarray(prev)[0])
            prev = tok1
        _ = int(np.asarray(prev)[0])
        prefill_s = (time.perf_counter() - t0) / n_pre
        prefill_tps = prompt_len / prefill_s
        log(
            f"prefill: {prefill_tps:.1f} tok/s over {n_pre} paced "
            f"iterations (compile {prefill_compile_s:.1f}s)"
        )
    except Exception:  # pragma: no cover
        import traceback

        log("prefill bench FAILED:")
        traceback.print_exc(file=sys.stderr)

    baseline = 13.69  # reference single-user decode tok/s (BASELINE.md)
    # Bandwidth-normalized comparison (VERDICT r1 weak item 2: raw
    # vs_baseline flatters a 16B model against the reference's 671B run).
    # Normalize each side by its active bytes/token so the ratio compares
    # EFFICIENCY on its own hardware: ours ~1.2 GB active/token on a
    # 819 GB/s chip; the reference's 671B q4km ~20.5 GB/token (37B active
    # params + shared/attn) on ~700 GB/s combined (2x Xeon DDR5 + 4090).
    active_bytes = 1.2e9
    ref_active_bytes = 20.5e9
    norm_ratio = (decode_tps * active_bytes / 819e9) / (
        baseline * ref_active_bytes / 700e9
    )

    # --- the one stdout JSON line: COMPACT (VERDICT r4 weak 1: the r4
    # line outgrew the driver's 2,000-char capture tail and BENCH_r04
    # recorded neither headline; `parsed` was null). Headline numbers
    # only here; every sub-benchmark detail lives in the committed
    # BENCH_*.json files. Keep this line well under 1,800 chars.
    extra = {
        "prefill_tok_s": round(prefill_tps, 1) if prefill_tps else None,
        "prefill_compile_s": (
            round(prefill_compile_s, 1) if prefill_compile_s else None
        ),
        "params_gb": round(nbytes / 1e9, 2),
        "vs_baseline_bandwidth_normalized": round(norm_ratio, 3),
    }
    # fold in one headline number per sub-benchmark (details stay in the
    # committed BENCH_*.json files; do NOT inline them here)
    here = os.path.dirname(os.path.abspath(__file__))

    def _pick(fname, *paths):
        try:
            with open(os.path.join(here, fname)) as f:
                d = json.load(f)
            out = {}
            for p in paths:
                cur = d
                for k in p.split("."):
                    cur = cur[k]
                out[p.split(".")[-1] if "." not in p else p] = (
                    round(cur, 2) if isinstance(cur, float) else cur
                )
            return out
        except Exception:
            return None

    for key, fname, paths in (
        ("serving", "BENCH_SERVING.json",
         ("concurrency8.output_tok_s", "concurrency16.output_tok_s",
          "concurrency32.output_tok_s")),
        ("speculative", "BENCH_SPECULATIVE.json",
         ("speedup_measured", "acceptance_measured")),
        ("longctx", "BENCH_LONGCTX.json", ()),
        ("needle", "BENCH_NEEDLE.json",
         ("1048576.quest.outlier_acc", "65536.quest.dense_cosine")),
        ("offload", "BENCH_OFFLOAD.json", ("total_tok_s",)),
        ("sft", "BENCH_SFT.json", ("step_ms", "hbm_peak_gb")),
    ):
        picked = _pick(fname, *paths) if paths else None
        if key == "longctx":
            # best 1M + 512K rows if present
            picked = _pick(
                fname, "1M_6layer.quest_tok_s", "512K_12layer.quest_tok_s"
            ) or _pick(fname, "512K_12layer.quest_tok_s")
        if picked:
            extra[key] = picked

    line = json.dumps(
        {
            "metric": (
                "deepseek-v2-lite-16B-A2.4B int4 single-user decode, "
                "1x TPU v5e (details in BENCH_*.json)"
            ),
            "value": round(decode_tps, 2),
            "unit": "tok/s",
            "vs_baseline": round(decode_tps / baseline, 3),
            "extra": extra,
        }
    )
    if len(line) > 1700:  # hard guard: driver captures a 2,000-char tail
        line = json.dumps(
            {
                "metric": "decode tok/s, 1x TPU v5e",
                "value": round(decode_tps, 2),
                "unit": "tok/s",
                "vs_baseline": round(decode_tps / baseline, 3),
                "extra": {
                    "prefill_tok_s": extra.get("prefill_tok_s"),
                },
            }
        )
    print(line)


if __name__ == "__main__":
    main()
