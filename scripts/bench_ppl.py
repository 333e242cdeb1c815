"""On-chip quantized-quality evidence (VERDICT r3 item 7; reference:
doc/en/benchmark.md:31-46 MMLU/ppl parity tables).

A synthetic model is materialized at bf16, generates a 1.5K-token greedy
stream (low-ppl under itself), and every supported weight format is then
scored teacher-forced ON-CHIP against that stream:

- online-quantized kinds (int8 / int4_g / int4_gz / fp8 / mxfp4 / mxfp8):
  dppl vs the bf16 model measures OUR quantizer + kernels end to end.
- simple GGUF kinds (q8_0 / q4_0 / q4_1 / q5_0 / q5_1): float weights are
  ENCODED to real ggml block bytes here, carried losslessly by
  quant/gguf_repack.py, and run through the same kernels — dppl measures
  the format + compute path.
- k-quants (q4_k / q6_k): no float->code encoder is shipped (ggml's
  encoder is a search); instead RANDOM valid codes are decoded to f32 for
  a float twin model, and dppl(quant vs its own float twin) asserts
  COMPUTE parity — the repack is lossless, so a real k-quant checkpoint's
  quality is carried exactly.

Writes BENCH_PPL.json with per-kind ppl + dppl.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _f16(x):
    return np.asarray(x, np.float16).view(np.uint8)


def enc_q8_0(w):  # [rows, K] -> block bytes; block=32
    v = w.reshape(-1, 32)
    d = np.abs(v).max(1) / 127.0
    d[d == 0] = 1.0
    q = np.clip(np.round(v / d[:, None]), -127, 127).astype(np.int8)
    out = np.zeros((v.shape[0], 34), np.uint8)
    out[:, :2] = _f16(d).reshape(-1, 2)
    out[:, 2:] = q.view(np.uint8)
    return out.reshape(-1)


def enc_q4_0(w):
    v = w.reshape(-1, 32)
    amax_i = np.abs(v).argmax(1)
    mx = v[np.arange(v.shape[0]), amax_i]
    d = mx / -8.0
    d[d == 0] = 1.0
    q = np.clip(np.round(v / d[:, None]) + 8, 0, 15).astype(np.uint8)
    out = np.zeros((v.shape[0], 18), np.uint8)
    out[:, :2] = _f16(d).reshape(-1, 2)
    out[:, 2:] = q[:, :16] | (q[:, 16:] << 4)
    return out.reshape(-1)


def enc_q4_1(w):
    v = w.reshape(-1, 32)
    mn = v.min(1)
    d = (v.max(1) - mn) / 15.0
    d[d == 0] = 1.0
    q = np.clip(np.round((v - mn[:, None]) / d[:, None]), 0, 15).astype(
        np.uint8
    )
    out = np.zeros((v.shape[0], 20), np.uint8)
    out[:, :2] = _f16(d).reshape(-1, 2)
    out[:, 2:4] = _f16(mn).reshape(-1, 2)
    out[:, 4:] = q[:, :16] | (q[:, 16:] << 4)
    return out.reshape(-1)


def enc_q5_0(w):
    v = w.reshape(-1, 32)
    amax_i = np.abs(v).argmax(1)
    mx = v[np.arange(v.shape[0]), amax_i]
    d = mx / -16.0
    d[d == 0] = 1.0
    q = np.clip(np.round(v / d[:, None]) + 16, 0, 31).astype(np.uint8)
    lo = q & 0xF
    hi = (q >> 4) & 1
    qh = np.zeros(v.shape[0], np.uint32)
    for j in range(32):
        qh |= hi[:, j].astype(np.uint32) << j
    out = np.zeros((v.shape[0], 22), np.uint8)
    out[:, :2] = _f16(d).reshape(-1, 2)
    out[:, 2:6] = qh.view(np.uint8).reshape(-1, 4)
    out[:, 6:] = lo[:, :16] | (lo[:, 16:] << 4)
    return out.reshape(-1)


def enc_q5_1(w):
    v = w.reshape(-1, 32)
    mn = v.min(1)
    d = (v.max(1) - mn) / 31.0
    d[d == 0] = 1.0
    q = np.clip(np.round((v - mn[:, None]) / d[:, None]), 0, 31).astype(
        np.uint8
    )
    lo = q & 0xF
    hi = (q >> 4) & 1
    qh = np.zeros(v.shape[0], np.uint32)
    for j in range(32):
        qh |= hi[:, j].astype(np.uint32) << j
    out = np.zeros((v.shape[0], 24), np.uint8)
    out[:, :2] = _f16(d).reshape(-1, 2)
    out[:, 2:4] = _f16(mn).reshape(-1, 2)
    out[:, 4:8] = qh.view(np.uint8).reshape(-1, 4)
    out[:, 8:] = lo[:, :16] | (lo[:, 16:] << 4)
    return out.reshape(-1)


ENCODERS = {
    "q8_0": enc_q8_0, "q4_0": enc_q4_0, "q4_1": enc_q4_1,
    "q5_0": enc_q5_0, "q5_1": enc_q5_1,
}


PPL_CFG = dict(
    model_type="deepseek_v2", vocab_size=8192, hidden_size=1024,
    intermediate_size=2816, moe_intermediate_size=704,
    num_hidden_layers=8, num_attention_heads=8, num_key_value_heads=8,
    n_shared_experts=1, n_routed_experts=16, num_experts_per_tok=4,
    first_k_dense_replace=1, moe_layer_freq=1, topk_method="greedy",
    norm_topk_prob=False, routed_scaling_factor=1.0,
    scoring_func="softmax", kv_lora_rank=256, q_lora_rank=None,
    qk_rope_head_dim=64, qk_nope_head_dim=64, v_head_dim=64,
    max_position_embeddings=4096, rms_norm_eps=1e-6, rope_theta=10000.0,
)

TRAINED_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "bench_model_trained.npz",
)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from ktransformers_tpu.engine.generate import GenerateConfig, Generator
    from ktransformers_tpu.models.init import init_params
    from ktransformers_tpu.models.spec import spec_from_hf_config
    from ktransformers_tpu.quant.formats import QTensor, quantize
    from ktransformers_tpu.quant.gguf_repack import repack_ggml_exact
    from ktransformers_tpu.utils.eval import perplexity

    cfg = dict(
        PPL_CFG,
        num_hidden_layers=int(os.environ.get("KT_PPL_LAYERS", "8")),
    )
    spec = spec_from_hf_config(cfg)
    base = init_params(spec, seed=0, quant="bf16")
    jax.block_until_ready(base)

    rng = np.random.default_rng(0)
    trained = os.path.exists(TRAINED_PATH) and not os.environ.get(
        "KT_PPL_UNTRAINED"
    )
    if trained:
        # TRAINED synthetic model (VERDICT r4 missing 1: random-weight
        # models have no redundancy, so every format looked catastrophic
        # — int4_g dppl +7,150 told us nothing). Weights come from
        # scripts/train_bench_model.py (on-chip CE training on a Markov
        # source); the eval stream is HELD-OUT data from that source.
        from scripts.train_bench_model import load_params, markov_stream

        print(f"loading trained weights {TRAINED_PATH}...",
              file=sys.stderr, flush=True)
        base = load_params(TRAINED_PATH)
        jax.block_until_ready(base)
        ids = markov_stream(
            cfg["vocab_size"],
            int(os.environ.get("KT_PPL_TOKENS", "1536")) + 16,
            seed=10_001,  # held-out: training streams use seeds < 10_000
        ).tolist()
    else:
        gen = Generator(base, spec, max_len=2048, batch=1)
        prompt = list(rng.integers(0, cfg["vocab_size"], 16))
        print("generating eval stream from the bf16 model...",
              file=sys.stderr, flush=True)
        out = gen.generate(
            [prompt],
            GenerateConfig(
                max_new_tokens=int(os.environ.get("KT_PPL_TOKENS", "1536")),
                prefill_chunk=256,
            ),
        )[0]
        ids = prompt + out

    def requant(fn):
        """Map every weight QTensor (stored bf16) through fn(float_w)."""

        def visit(leaf):
            if isinstance(leaf, QTensor) and leaf.kind == "bf16":
                w = np.asarray(leaf.data, np.float32)
                return fn(w)
            return leaf

        return jax.tree.map(
            visit, base, is_leaf=lambda x: isinstance(x, QTensor)
        )

    results = {}
    t0 = time.perf_counter()
    ppl_f = perplexity(base, spec, ids, chunk=512)
    results["bf16"] = {"ppl": round(ppl_f, 4), "dppl": 0.0}
    print(f"bf16: ppl {ppl_f:.4f} ({time.perf_counter()-t0:.0f}s)",
          file=sys.stderr, flush=True)

    def run(name, params, ref):
        t0 = time.perf_counter()
        p = perplexity(params, spec, ids, chunk=512)
        results[name] = {"ppl": round(p, 4), "dppl": round(p - ref, 4)}
        print(f"{name}: ppl {p:.4f} (d {p-ref:+.4f}, "
              f"{time.perf_counter()-t0:.0f}s)", file=sys.stderr, flush=True)

    # --- online-quantized kinds ---
    for kind, gs in [("int8", 0), ("int4_g", 128), ("int4_gz", 128),
                     ("fp8", 0), ("mxfp4", 32), ("mxfp8", 32)]:
        params = requant(
            lambda w, k=kind, g=gs: quantize(
                jnp.asarray(w), k, group_size=g or 128
            )
        )
        run(kind, params, ppl_f)

    # --- simple GGUF kinds: float -> real ggml block bytes -> lossless
    # repack -> same kernels ---
    for tname in ("q8_0", "q4_0", "q4_1", "q5_0", "q5_1"):
        enc = ENCODERS[tname]

        def to_gguf(w, _enc=enc, _t=tname):
            # [K, N] or [E, K, N]; ggml blocks run along the input dim
            *lead, kdim, n = w.shape
            wt = np.ascontiguousarray(np.swapaxes(w, -1, -2))  # [..., N, K]
            raw = _enc(wt.reshape(-1))
            qt = repack_ggml_exact(raw, _t.upper(), (*lead, n, kdim))
            assert qt is not None, _t
            return qt

        params = requant(to_gguf)
        run(tname, params, ppl_f)

    # --- k-quants: compute parity (random valid codes; the packers
    # return the expected float values, which build the float twin) ---
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests"))
    from test_gguf import pack_q4_k, pack_q6_k

    for tname, packer in (("q4_k", pack_q4_k), ("q6_k", pack_q6_k)):
        qleaves, fleaves = [], []
        qleaves, fleaves = [], []

        def to_quant(w, _p=packer, _t=tname):
            *lead, kdim, n = w.shape
            tot = int(np.prod(lead, dtype=np.int64)) if lead else 1
            n_blocks = tot * n * kdim // 256
            r = np.random.default_rng(
                hash((_t, kdim, n, len(qleaves))) % (2**31)
            )
            raw, expected = _p(r, n_blocks)
            qt = repack_ggml_exact(
                np.frombuffer(raw, np.uint8), _t.upper(), (*lead, n, kdim)
            )
            # tame the random block scales (applied EQUALLY to the quant
            # tensor and its float twin: scaling per-group scales scales
            # the dequant linearly) — raw random k-quant scales make the
            # net saturate and both NLLs overflow to inf
            import dataclasses as _dc

            qt = _dc.replace(
                qt, scales=(qt.scales.astype(jnp.float32) * 0.02)
            )
            vals = np.asarray(expected, np.float32).reshape(
                *lead, n, kdim
            ) * 0.02
            fleaves.append(quantize(jnp.asarray(
                np.ascontiguousarray(np.swapaxes(vals, -1, -2))
            ), "bf16"))
            qleaves.append(qt)
            return qt

        qleaves.clear()
        fleaves.clear()
        qparams = requant(to_quant)
        it = iter(fleaves)

        def next_float(w):
            return next(it)

        fparams = requant(next_float)
        t0 = time.perf_counter()
        import math as _math

        pf = perplexity(fparams, spec, ids, chunk=512, return_nll=True)
        pq = perplexity(qparams, spec, ids, chunk=512, return_nll=True)
        results[tname] = {
            "log_ppl": round(pq, 4),
            "dlogppl_compute": round(pq - pf, 4),
            "float_twin_log_ppl": round(pf, 4),
        }
        print(f"{tname}: quant log-ppl {pq:.4f} vs float-twin {pf:.4f} "
              f"(compute d {pq-pf:+.4f}, {time.perf_counter()-t0:.0f}s)",
              file=sys.stderr, flush=True)

    worst = max(
        abs(v.get("dppl", v.get("dlogppl_compute", 0.0)))
        for k, v in results.items() if k != "bf16"
    )
    payload = {
        "metric": (
            "teacher-forced ppl, synthetic 8-layer MoE "
            + ("TRAINED on a Markov source, held-out eval stream"
               if trained else
               "(self-generated 1.5K-token stream; random weights "
               "overstate quantization sensitivity)")
            + ", ON-CHIP, per weight format"
        ),
        "trained_model": trained,
        "baseline_ppl_bf16": results["bf16"]["ppl"],
        "max_abs_dppl": round(worst, 4),
        "kinds": results,
    }
    print(json.dumps(payload))
    with open("/root/repo/BENCH_PPL.json", "w") as f:
        json.dump(payload, f)


if __name__ == "__main__":
    main()
