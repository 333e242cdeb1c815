"""MTP self-speculation benchmark (reference: doc/en/DeepSeek-V4-Flash.md
MTP ~1.2x decode at 90% acceptance).

r4 overhaul — earlier rounds' conclusions ("12 MB re-upload per program
alternation", "program-size cliff") were artifacts of the broken
block_until_ready barrier; with paced np.asarray readbacks a draft+verify
round costs ~8 ms hot (scripts/spec_lab.py: single-program 7.93 ms,
alternating 8.42 ms, decode step 3.64 ms -> break-even acceptance 0.59).

The measured run uses the ON-CHIP-TRAINED dense MTP head
(scripts/train_mtp.py -> mtp_trained.npz) so acceptance is real; without
the file it falls back to a random head (acceptance ~0, still measured
honestly).

Prints one JSON line; writes BENCH_SPECULATIVE.json.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=2, help="draft tokens/round")
    ap.add_argument("--new", type=int, default=128)
    ap.add_argument("--prompt", type=int, default=32)
    ap.add_argument("--trained", default="/root/repo/mtp_trained.npz")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from ktransformers_tpu.engine.generate import GenerateConfig, Generator
    from ktransformers_tpu.engine.mtp import (
        init_mtp_synthetic,
        mtp_generate_single,
    )
    from ktransformers_tpu.models.init import init_params_synthetic
    from ktransformers_tpu.models.spec import spec_from_hf_config
    from scripts.profile_decode2 import BASE

    spec = spec_from_hf_config(dict(BASE, max_position_embeddings=2048))
    params = init_params_synthetic(spec, quant="int4_g", moe_quant="int4_g")
    jax.block_until_ready(params)
    gen = Generator(params, spec, max_len=1024, batch=1)

    trained = os.path.exists(args.trained)
    if trained:
        from scripts.train_mtp import load_head

        mtp = load_head(args.trained)
        print("using trained head", file=sys.stderr)
    else:
        mtp = init_mtp_synthetic(spec, quant="int4_g", dense_layer=True)
        print("using RANDOM head (train with scripts/train_mtp.py)",
              file=sys.stderr)

    # the eval stream must match training distribution: greedy from a
    # random prompt (train_mtp used seeds 0..nseq-1 prompts; use a FRESH
    # prompt so acceptance is held-out)
    rng = np.random.default_rng(123)
    prompt = list(rng.integers(0, spec.vocab_size, args.prompt))
    cfg = GenerateConfig(max_new_tokens=args.new)

    base_out = gen.generate([prompt], cfg)[0]  # compile + warm
    t0 = time.perf_counter()
    base_out = gen.generate([prompt], cfg)[0]
    base_s = time.perf_counter() - t0

    out, stats = mtp_generate_single(gen, mtp, prompt, cfg, k=args.k)
    t0 = time.perf_counter()
    out, stats = mtp_generate_single(gen, mtp, prompt, cfg, k=args.k)
    mtp_s = time.perf_counter() - t0

    agree = 0
    for a, b in zip(out, base_out):
        if a != b:
            break
        agree += 1

    acc = stats.acceptance_rate
    base_tps = args.new / base_s
    mtp_tps = len(out) / mtp_s
    result = {
        "metric": f"MTP self-speculation SINGLE-PROGRAM round, k={args.k} (16B int4, 1 chip, "
        f"{'TRAINED' if trained else 'random'} dense head)",
        "baseline_tok_s": round(base_tps, 2),
        "mtp_tok_s": round(mtp_tps, 2),
        "speedup_measured": round(mtp_tps / base_tps, 3),
        "acceptance_measured": round(acc, 3),
        "rounds": stats.rounds,
        "round_ms": round(mtp_s / max(1, stats.rounds) * 1e3, 1),
        "greedy_agreement_prefix": agree,
        "head_trained_on_chip": trained,
        "note": "head trained ON-CHIP against the target's own greedy "
        "continuations (scripts/train_mtp.py); baseline is the depth-8 "
        "paced generate loop with real per-token readbacks. spec_lab.py "
        "r4: single-program round 7.93 ms vs alternating 8.42 ms vs "
        "decode step 3.64 ms — the r3 'program re-upload / size cliff' "
        "numbers were broken-barrier artifacts.",
    }
    print(json.dumps(result))
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH_SPECULATIVE.json"), "w") as f:
        json.dump(result, f)


if __name__ == "__main__":
    main()
