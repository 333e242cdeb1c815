"""Kernel lab 6: what actually bounds the gathered decode kernel at M=8?

lab5 found the production int4 kernel at 338 GB/s and only ~+11% from
cutting VPU ops (C_groupout 375). Hypotheses to separate:
  (a) VPU dequant ops/byte  (prod ~14 ops/byte)
  (b) MXU weight-load at M=8 (bf16 operands stream 2 B/value through MXU)
  (c) HBM (819 GB/s peak)

Variants (GB/s computed against each variant's OWN HBM bytes):
  G_bf16    : bf16 weights, 1 dot            -> isolates (b)+(c), no (a)
  E_int8w   : int8 weights, cast+scale       -> 1 B/value HBM, bf16 MXU ops
  D_2dot    : int4, shift/sub identity (4 VPU ops/byte), 2 bf16 dots,
              scales applied per-group on OUTPUT:
                d = bitcast_i8(b << 4)  (= 16*lo_signed)
                e = bitcast_i8(b) - (b & 15)  (= 16*hi_signed)
                y_g = s_g/16 * (xl_g @ d_g + xh_g @ e_g)
  F_i8dot   : D's nibble layout but int8 MXU dots with per-(row,group)
              dynamically quantized activations (AMX-int8 analog) -- tests
              whether Mosaic int8 matmul halves the MXU stream time.
"""
import glob, gzip, json, os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from ktransformers_tpu.quant.formats import quantize, split_x_for_int4, dequantize

E, K, N, R = 64, 2048, 2816, 8
GS = 128
rng = np.random.default_rng(0)
w = jnp.asarray(rng.standard_normal((E, K, N)).astype(np.float32) * 0.05)
ids = jnp.asarray(np.arange(R) % E, jnp.int32)
INNER = 40
qt = quantize(w, "int4_g", group_size=GS)
x = jnp.asarray(rng.standard_normal((R, K)), jnp.bfloat16)
wd = dequantize(qt, jnp.float32)[np.asarray(ids)]
ref = jnp.einsum("rk,rkn->rn", x.astype(jnp.float32), wd)

k2 = K // 2
ng = qt.scales.shape[1] if qt.scales.ndim == 3 else K // GS
gs2 = GS // 2
scales3 = qt.scales.reshape(E, ng, N)


def _measure(name, jfn, nbytes, err, *wargs):
    @jax.jit
    def chain(x, ids, *wargs):
        def body(i, xx):
            y = jfn(xx, ids, *wargs)
            return (y[:, :K] * 1e-6).astype(xx.dtype) + xx
        return jax.lax.fori_loop(0, INNER, body, x)
    y = chain(x, ids, *wargs); jax.block_until_ready(y)
    tdir = f"/tmp/lab6_{name}"; os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        y = chain(y, ids, *wargs); jax.block_until_ready(y)
    f = sorted(glob.glob(tdir + "/**/*.trace.json.gz", recursive=True))[-1]
    with gzip.open(f) as fh: tr = json.load(fh)
    ev = tr["traceEvents"]
    pids = {e["pid"]: e["args"].get("name", "") for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    core = {p for p, n_ in pids.items() if "TensorCore" in n_ or "/device" in n_.lower()}
    d = sum(e.get("dur", 0) for e in ev if e.get("ph") == "X" and e.get("pid") in core
            and "fori" not in e.get("name", "")
            and not e.get("name", "").startswith(("jit_", "while")))
    per = d / INNER
    print(f"{name:16s}: {per:7.1f} us/iter -> {nbytes/(per*1e-6)/1e9:5.0f} GB/s"
          f"  rel_err {err:.1e}", flush=True)


def _err(y):
    return float(jnp.abs(y.astype(jnp.float32) - ref).max() / jnp.abs(ref).max())


def _gspec(in_specs, bn):
    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(pl.cdiv(N, bn), R),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((R, bn), lambda j, i, ids: (0, j)))


def _acc_row(o_ref, acc, r):
    row_ids = jax.lax.broadcasted_iota(jnp.int32, o_ref.shape, 0)
    o_ref[:] += jnp.where(row_ids == r, acc, 0.0)


# --- G: bf16 weights --------------------------------------------------------
def run_G(bn=512):
    wb = w.astype(jnp.bfloat16)

    def kern(ids_ref, x_ref, w_ref, o_ref):
        r = pl.program_id(1)
        @pl.when(r == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)
        acc = jnp.dot(x_ref[:], w_ref[0], preferred_element_type=jnp.float32)
        _acc_row(o_ref, acc, r)

    fn = pl.pallas_call(kern, grid_spec=_gspec([
        pl.BlockSpec((R, K), lambda j, i, ids: (0, 0)),
        pl.BlockSpec((1, K, bn), lambda j, i, ids: (ids[i], 0, j)),
    ], bn), out_shape=jax.ShapeDtypeStruct((R, N), jnp.float32))
    jfn = jax.jit(lambda x_, i_, w_: fn(i_, x_, w_))
    _measure("G_bf16", jfn, R * K * N * 2, _err(jfn(x, ids, wb)), wb)


# --- E: int8 weights --------------------------------------------------------
def run_E(bn=512):
    qt8 = quantize(w, "int8")
    wd8 = dequantize(qt8, jnp.float32)[np.asarray(ids)]
    ref8 = jnp.einsum("rk,rkn->rn", x.astype(jnp.float32), wd8)

    def kern(ids_ref, x_ref, w_ref, s_ref, o_ref):
        r = pl.program_id(1)
        @pl.when(r == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)
        acc = jnp.dot(x_ref[:], w_ref[0].astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32) * s_ref[0]
        _acc_row(o_ref, acc, r)

    fn = pl.pallas_call(kern, grid_spec=_gspec([
        pl.BlockSpec((R, K), lambda j, i, ids: (0, 0)),
        pl.BlockSpec((1, K, bn), lambda j, i, ids: (ids[i], 0, j)),
        pl.BlockSpec((1, 1, bn), lambda j, i, ids: (ids[i], 0, j)),
    ], bn), out_shape=jax.ShapeDtypeStruct((R, N), jnp.float32))
    jfn = jax.jit(lambda x_, i_, w_, s_: fn(i_, x_, w_, s_))
    y = jfn(x, ids, qt8.data, qt8.scales)
    err = float(jnp.abs(y - ref8).max() / jnp.abs(ref8).max())
    _measure("E_int8w", jfn, R * K * N, err, qt8.data, qt8.scales)


# --- D: int4, 4-op dequant, group-out scales --------------------------------
def run_D(bn=512):
    def kern(ids_ref, xl_ref, xh_ref, w_ref, s_ref, o_ref):
        r = pl.program_id(1)
        @pl.when(r == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)
        b = w_ref[0]
        d = jax.lax.bitcast_convert_type(b << 4, jnp.int8).astype(jnp.bfloat16)
        e = (jax.lax.bitcast_convert_type(b, jnp.int8)
             - jax.lax.bitcast_convert_type(b & 0xF, jnp.int8)
             ).astype(jnp.bfloat16)
        acc = jnp.zeros((R, bn), jnp.float32)
        for g in range(ng):
            sl = slice(g * gs2, (g + 1) * gs2)
            part = (jnp.dot(xl_ref[:, sl], d[sl], preferred_element_type=jnp.float32)
                    + jnp.dot(xh_ref[:, sl], e[sl], preferred_element_type=jnp.float32))
            acc += part * (s_ref[0, g][None, :] * (1.0 / 16.0))
        _acc_row(o_ref, acc, r)

    fn = pl.pallas_call(kern, grid_spec=_gspec([
        pl.BlockSpec((R, k2), lambda j, i, ids: (0, 0)),
        pl.BlockSpec((R, k2), lambda j, i, ids: (0, 0)),
        pl.BlockSpec((1, k2, bn), lambda j, i, ids: (ids[i], 0, j)),
        pl.BlockSpec((1, ng, bn), lambda j, i, ids: (ids[i], 0, j)),
    ], bn), out_shape=jax.ShapeDtypeStruct((R, N), jnp.float32))
    jfn = jax.jit(lambda x_, i_, w_, s_: fn(
        i_, *split_x_for_int4(x_, K, GS), w_, s_))
    _measure(f"D_2dot_bn{bn}", jfn, R * k2 * N,
             _err(jfn(x, ids, qt.data, scales3)), qt.data, scales3)


# --- D2: like D but ONE full-K dot pair, scales folded into x? no --
# D with full-K dots + per-group scaling via post-pass is impossible without
# group-out; instead test D with fewer, wider group dots (2 groups/dot) by
# pre-multiplying activations per group? skip.

# --- F: int8 MXU dots -------------------------------------------------------
def run_F(bn=512):
    def kern(ids_ref, xl_ref, xh_ref, sx_ref, w_ref, s_ref, o_ref):
        r = pl.program_id(1)
        @pl.when(r == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)
        b = w_ref[0]
        l8 = jax.lax.bitcast_convert_type(b << 4, jnp.int8) >> 4
        h8 = jax.lax.bitcast_convert_type(b, jnp.int8) >> 4
        acc = jnp.zeros((R, bn), jnp.float32)
        for g in range(ng):
            sl = slice(g * gs2, (g + 1) * gs2)
            part = (jnp.dot(xl_ref[:, sl], l8[sl], preferred_element_type=jnp.int32)
                    + jnp.dot(xh_ref[:, sl], h8[sl], preferred_element_type=jnp.int32))
            acc += part.astype(jnp.float32) * (
                sx_ref[:, g][:, None] * s_ref[0, g][None, :])
        _acc_row(o_ref, acc, r)

    fn = pl.pallas_call(kern, grid_spec=_gspec([
        pl.BlockSpec((R, k2), lambda j, i, ids: (0, 0)),
        pl.BlockSpec((R, k2), lambda j, i, ids: (0, 0)),
        pl.BlockSpec((R, ng), lambda j, i, ids: (0, 0)),
        pl.BlockSpec((1, k2, bn), lambda j, i, ids: (ids[i], 0, j)),
        pl.BlockSpec((1, ng, bn), lambda j, i, ids: (ids[i], 0, j)),
    ], bn), out_shape=jax.ShapeDtypeStruct((R, N), jnp.float32))

    def prep(x_):
        xl, xh = split_x_for_int4(x_, K, GS)
        xg = jnp.stack([xl.reshape(R, ng, gs2), xh.reshape(R, ng, gs2)], -1)
        amax = jnp.max(jnp.abs(xg.astype(jnp.float32)), axis=(-2, -1))  # [R,ng]
        sx = amax / 127.0
        q = lambda v: jnp.clip(jnp.round(
            v.reshape(R, ng, gs2).astype(jnp.float32) / sx[..., None]),
            -127, 127).astype(jnp.int8).reshape(R, k2)
        return q(xl), q(xh), sx

    jfn = jax.jit(lambda x_, i_, w_, s_: fn(i_, *prep(x_), w_, s_))
    _measure(f"F_i8dot_bn{bn}", jfn, R * k2 * N,
             _err(jfn(x, ids, qt.data, scales3)), qt.data, scales3)


if __name__ == "__main__":
    which = sys.argv[1:] or ["G", "E", "D", "F"]
    for v in which:
        try:
            dict(G=run_G, E=run_E, D=run_D, F=run_F)[v]()
        except Exception as ex:
            print(f"{v}: FAILED {type(ex).__name__}: {str(ex)[:300]}", flush=True)
