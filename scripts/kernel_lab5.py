"""Kernel lab 5: int4 dequant formulations, device-time measured.

The gathered int4 kernel is VPU-bound (~340 GB/s effective vs 819 peak).
Variants cut per-value VPU ops:
  A: production (mask/xor/sub sign-extend, f32 scale mul, bf16 cast)
  B: shift sign-extend + direct int32->bf16 cast + bf16 scale mul
  C: B but scales applied per-group on the OUTPUT (no per-value mul)
  E: int8 gather (the no-unpack upper bound)
"""
import collections, functools, glob, gzip, json, os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from ktransformers_tpu.quant.formats import quantize, split_x_for_int4, dequantize
from ktransformers_tpu.ops.pallas.quant_matmul import gathered_quant_matmul

E, K, N, R = 64, 2048, 2816, 8
GS = 128
rng = np.random.default_rng(0)
w = jnp.asarray(rng.standard_normal((E, K, N)).astype(np.float32) * 0.05)
ids = jnp.asarray(np.arange(R) % E, jnp.int32)
INNER = 40
qt = quantize(w, "int4_g", group_size=GS)
nbytes = R * qt.data[0].size
x = jnp.asarray(rng.standard_normal((R, K)), jnp.bfloat16)
wd = dequantize(qt, jnp.float32)[np.asarray(ids)]
ref = jnp.einsum("rk,rkn->rn", x.astype(jnp.float32), wd)

k2 = K // 2
ng = qt.scales.shape[1]
gs2 = GS // 2

def expand(v, bn):
    return jnp.broadcast_to(v[:, None, :], (ng, gs2, bn)).reshape(k2, bn)

def kernel_B(ids_ref, xl_ref, xh_ref, w_ref, s_ref, o_ref):
    r = pl.program_id(1)
    @pl.when(r == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)
    bn = w_ref.shape[2]
    bi = w_ref[0].astype(jnp.int32)
    lo = ((bi << 28) >> 28).astype(jnp.bfloat16)
    hi = ((bi << 24) >> 28).astype(jnp.bfloat16)
    s = expand(s_ref[0].astype(jnp.bfloat16), bn)
    acc = jnp.dot(xl_ref[:], lo * s, preferred_element_type=jnp.float32) + \
          jnp.dot(xh_ref[:], hi * s, preferred_element_type=jnp.float32)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, o_ref.shape, 0)
    o_ref[:] += jnp.where(row_ids == r, acc, 0.0)

def kernel_C(ids_ref, xl_ref, xh_ref, w_ref, s_ref, o_ref):
    r = pl.program_id(1)
    @pl.when(r == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)
    bn = w_ref.shape[2]
    bi = w_ref[0].astype(jnp.int32)
    lo = ((bi << 28) >> 28).astype(jnp.bfloat16)
    hi = ((bi << 24) >> 28).astype(jnp.bfloat16)
    r8 = xl_ref.shape[0]
    acc = jnp.zeros((r8, bn), jnp.float32)
    for g in range(ng):
        sl = slice(g * gs2, (g + 1) * gs2)
        part = jnp.dot(xl_ref[:, sl], lo[sl], preferred_element_type=jnp.float32) \
             + jnp.dot(xh_ref[:, sl], hi[sl], preferred_element_type=jnp.float32)
        acc += part * s_ref[0, g][None, :]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, o_ref.shape, 0)
    o_ref[:] += jnp.where(row_ids == r, acc, 0.0)

def run_variant(name, kernel, bn):
    r8 = 8
    xl, xh = split_x_for_int4(x, K, GS)
    scales = qt.scales.reshape(E, ng, N)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(pl.cdiv(N, bn), R),
        in_specs=[
            pl.BlockSpec((r8, k2), lambda j, i, ids: (0, 0)),
            pl.BlockSpec((r8, k2), lambda j, i, ids: (0, 0)),
            pl.BlockSpec((1, k2, bn), lambda j, i, ids: (ids[i], 0, j)),
            pl.BlockSpec((1, ng, bn), lambda j, i, ids: (ids[i], 0, j)),
        ],
        out_specs=pl.BlockSpec((r8, bn), lambda j, i, ids: (0, j)),
    )
    fn = pl.pallas_call(kernel, grid_spec=grid_spec,
                        out_shape=jax.ShapeDtypeStruct((r8, N), jnp.float32))
    jfn = jax.jit(lambda x_, i_: fn(i_, *split_x_for_int4(x_, K, GS), qt.data, scales))
    y = jfn(x, ids)
    err = float(jnp.abs(y.astype(jnp.float32)-ref).max()/jnp.abs(ref).max())
    @jax.jit
    def chain(x, ids):
        def body(i, xx):
            y = jfn(xx, ids)
            return (y[:, :K] * 1e-6).astype(xx.dtype) + xx
        return jax.lax.fori_loop(0, INNER, body, x)
    y = chain(x, ids); jax.block_until_ready(y)
    tdir = f"/tmp/lab5_{name}"; os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        y = chain(y, ids); jax.block_until_ready(y)
    f = sorted(glob.glob(tdir + "/**/*.trace.json.gz", recursive=True))[-1]
    with gzip.open(f) as fh: tr = json.load(fh)
    ev = tr["traceEvents"]
    pids = {e["pid"]: e["args"].get("name","") for e in ev if e.get("ph")=="M" and e.get("name")=="process_name"}
    core = {p for p,n in pids.items() if "TensorCore" in n or "/device" in n.lower()}
    d = sum(e.get("dur",0) for e in ev if e.get("ph")=="X" and e.get("pid") in core
            and "fori" not in e.get("name","") and not e.get("name","").startswith(("jit_","while")))
    per = d / INNER
    print(f"{name}: {per:7.1f} us/iter device -> {nbytes/(per*1e-6)/1e9:5.0f} GB/s  rel_err {err:.1e}", flush=True)

def run_production():
    @jax.jit
    def chain(x, ids):
        def body(i, xx):
            y = gathered_quant_matmul(xx, qt, ids)
            return (y[:, :K] * 1e-6).astype(xx.dtype) + xx
        return jax.lax.fori_loop(0, INNER, body, x)
    y = chain(x, ids); jax.block_until_ready(y)
    tdir = "/tmp/lab5_prod"; os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        y = chain(y, ids); jax.block_until_ready(y)
    f = sorted(glob.glob(tdir + "/**/*.trace.json.gz", recursive=True))[-1]
    with gzip.open(f) as fh: tr = json.load(fh)
    ev = tr["traceEvents"]
    pids = {e["pid"]: e["args"].get("name","") for e in ev if e.get("ph")=="M" and e.get("name")=="process_name"}
    core = {p for p,n in pids.items() if "TensorCore" in n or "/device" in n.lower()}
    d = sum(e.get("dur",0) for e in ev if e.get("ph")=="X" and e.get("pid") in core
            and not e.get("name","").startswith(("jit_","while")))
    per = d / INNER
    print(f"A(prod bn<=512): {per:7.1f} us/iter device -> {nbytes/(per*1e-6)/1e9:5.0f} GB/s", flush=True)

if __name__ == "__main__":
    run_production()
    run_variant("B_shift_bf16_bn512", kernel_B, 512)
    run_variant("C_groupout_bn512", kernel_C, 512)
    run_variant("B_shift_bf16_bn1408", kernel_B, 1408)
