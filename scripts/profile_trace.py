"""Capture a jax.profiler trace of the bench decode step and aggregate
device op durations from the trace.json.gz."""
import collections, glob, gzip, json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from ktransformers_tpu.engine.generate import Generator, GenerateConfig
from ktransformers_tpu.models.init import init_params_synthetic
from ktransformers_tpu.models.spec import spec_from_hf_config

BASE = dict(
    model_type="deepseek_v2", vocab_size=102400, hidden_size=2048,
    intermediate_size=10944, moe_intermediate_size=1408,
    num_hidden_layers=27, num_attention_heads=16, num_key_value_heads=16,
    n_shared_experts=2, n_routed_experts=64, num_experts_per_tok=6,
    first_k_dense_replace=1, moe_layer_freq=1, topk_method="greedy",
    norm_topk_prob=False, routed_scaling_factor=1.0,
    scoring_func="softmax", kv_lora_rank=512, q_lora_rank=None,
    qk_rope_head_dim=64, qk_nope_head_dim=128, v_head_dim=128,
    max_position_embeddings=2048, rms_norm_eps=1e-6, rope_theta=10000.0,
)
spec = spec_from_hf_config(BASE)
params = init_params_synthetic(spec, quant="int8", moe_quant="int4_g")
jax.block_until_ready(params)
gen = Generator(params, spec, max_len=1024, batch=1)
prompt = list(np.random.default_rng(0).integers(100, 5000, 64))
# warm up (compile)
out = gen.generate([prompt], GenerateConfig(max_new_tokens=16))
tdir = "/tmp/jaxtrace"
os.system(f"rm -rf {tdir}")
t0 = time.perf_counter()
with jax.profiler.trace(tdir):
    out = gen.generate([prompt], GenerateConfig(max_new_tokens=64))
wall = time.perf_counter() - t0
print(f"generate 64 tok: {wall:.2f}s -> {64/wall:.1f} tok/s (incl prefill)")
f = sorted(glob.glob(tdir + "/**/*.trace.json.gz", recursive=True))[-1]
with gzip.open(f) as fh:
    tr = json.load(fh)
ev = tr["traceEvents"]
durs, cnt = collections.Counter(), collections.Counter()
# find TensorCore pid
pids = {}
for e in ev:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        pids[e["pid"]] = e["args"].get("name", "")
core_pids = {p for p, n in pids.items() if "TensorCore" in n or "/device" in n.lower()}
for e in ev:
    if e.get("ph") == "X" and e.get("pid") in core_pids:
        name = e.get("name", "?")
        durs[name] += e.get("dur", 0)
        cnt[name] += 1
total = sum(durs.values())
print(f"total device time: {total/1e6:.3f}s over {sum(cnt.values())} events; pids={ {p:pids[p] for p in core_pids} }")
for name, d in durs.most_common(30):
    print(f"{d/1e3:9.1f} ms {cnt[name]:6d}x  {name[:100]}")
