"""Kernel lab 4: trace the production gathered kernel chain to explain the
75 GB/s isolation number vs ~450 GB/s effective in the decode step."""
import collections, glob, gzip, json, os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from ktransformers_tpu.quant.formats import quantize
from ktransformers_tpu.ops.pallas.quant_matmul import gathered_quant_matmul

rng = np.random.default_rng(0)
E, K, N, R = 64, 2048, 2816, 8
w = jnp.asarray(rng.standard_normal((E, K, N)).astype(np.float32) * 0.05)
ids = jnp.asarray(np.arange(R) % E, jnp.int32)
INNER = 40
qt = quantize(w, "int4_g", group_size=128)
nbytes = R * qt.data[0].size
x = jnp.asarray(rng.standard_normal((R, K)), jnp.bfloat16)

@jax.jit
def chain(x, ids):
    def body(i, x):
        y = gathered_quant_matmul(x, qt, ids)
        return (y[:, :x.shape[1]] * 1e-6).astype(x.dtype) + x
    return jax.lax.fori_loop(0, INNER, body, x)

y = chain(x, ids); jax.block_until_ready(y)
tdir = "/tmp/jaxtrace4"; os.system(f"rm -rf {tdir}")
t0 = time.perf_counter()
with jax.profiler.trace(tdir):
    y = chain(y, ids); jax.block_until_ready(y)
dt = (time.perf_counter()-t0)/INNER
print(f"per-iter: {dt*1e6:.1f} us  {nbytes/dt/1e9:.1f} GB/s")
f = sorted(glob.glob(tdir + "/**/*.trace.json.gz", recursive=True))[-1]
with gzip.open(f) as fh: tr = json.load(fh)
ev = tr["traceEvents"]
pids = {}
for e in ev:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        pids[e["pid"]] = e["args"].get("name", "")
core = {p for p,n in pids.items() if "TensorCore" in n or "/device" in n.lower()}
durs, cnt = collections.Counter(), collections.Counter()
for e in ev:
    if e.get("ph") == "X" and e.get("pid") in core:
        name = e.get("name","?").split(".")[0]
        durs[name] += e.get("dur",0); cnt[name] += 1
for name,d in durs.most_common(12):
    print(f"{d/INNER:9.1f} us/iter {cnt[name]:6d}x  {name[:70]}")

# --- part 2: device time of the pre-tiled contiguous variant ---
import importlib.util as _ilu
_spec = _ilu.spec_from_file_location(
    "kernel_lab3", os.path.join(os.path.dirname(os.path.abspath(__file__)), "kernel_lab3.py"))
_l3 = _ilu.module_from_spec(_spec)
import builtins
_main = None
_src = open(_spec.origin).read().replace('if __name__ == "__main__":\n    main()', "")
exec(compile(_src, _spec.origin, "exec"), _l3.__dict__)
gathered_tiled = _l3.gathered_tiled

k2 = K // 2
ng = qt.scales.shape[1]
for bn in (256, 1408):
    nb = N // bn
    wt = jnp.asarray(qt.data.reshape(E, k2, nb, bn).transpose(0, 2, 1, 3))
    st = jnp.asarray(qt.scales.reshape(E, ng, nb, bn).transpose(0, 2, 1, 3))

    @jax.jit
    def chain_t(x, wt, st, ids, bn=bn):
        def body(i, x):
            y = gathered_tiled(x, wt, st, ids, N, bn)
            return (y[:, :K] * 1e-6).astype(x.dtype) + x
        return jax.lax.fori_loop(0, INNER, body, x)

    y = chain_t(x, wt, st, ids); jax.block_until_ready(y)
    tdir = f"/tmp/jaxtrace4_{bn}"; os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        y = chain_t(y, wt, st, ids); jax.block_until_ready(y)
    f = sorted(glob.glob(tdir + "/**/*.trace.json.gz", recursive=True))[-1]
    with gzip.open(f) as fh: tr = json.load(fh)
    ev = tr["traceEvents"]
    pids = {e["pid"]: e["args"].get("name","") for e in ev if e.get("ph")=="M" and e.get("name")=="process_name"}
    core = {p for p,n in pids.items() if "TensorCore" in n or "/device" in n.lower()}
    d = sum(e.get("dur",0) for e in ev if e.get("ph")=="X" and e.get("pid") in core and e.get("name","").startswith("gathered_tiled"))
    print(f"tiled bn={bn}: {d/INNER:.1f} us/iter device -> {nbytes/(d/INNER*1e-6)/1e9:.0f} GB/s")
