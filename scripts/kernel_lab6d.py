"""Kernel lab 6d: int8-MXU decode variants.

lab6/6b analysis: every bf16-dot variant saturates at ~0.7e12 weight
values/s through the MXU at M=8 (1.4 ps/value), independent of VPU op
count; int8 dots should stream 2x (v5e 394 int8 vs 197 bf16 TOPs).

  V0_ceiling : int8 weights fed straight to i8xi8 dots (no unpack, fake
               scale) -> the int8 MXU streaming ceiling at M=8
  V1_unpack  : int4 packed, i32-unpack to two i8 planes in-kernel
               (7 VPU ops/byte), i8 dots, per-(row,group) activation quant
  V2_identity: offset-lo repacked int4: in-kernel extract = cast+and+xor+
               cast (4 ops/byte) for ONE plane, raw bitcast byte for the
               other; dot identity recovers both nibbles
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
ng = K // GS
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
    tdir = f"/tmp/lab6d_{name}"; os.system(f"rm -rf {tdir}")
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


def _quant_x_groups(x_):
    """[R, K] bf16 -> (xq int8 [R, K], sx f32 [R, ng]) per-(row,group)."""
    xg = x_.astype(jnp.float32).reshape(R, ng, GS)
    amax = jnp.maximum(jnp.max(jnp.abs(xg), axis=-1), 1e-8)
    sx = amax / 127.0
    xq = jnp.clip(jnp.round(xg / sx[..., None]), -127, 127).astype(jnp.int8)
    return xq.reshape(R, K), sx


# --- V0: int8 weights, int8 dots, per-channel scale (speed ceiling) ---------
def run_V0(bn=512):
    qt8 = quantize(w, "int8")
    wd8 = dequantize(qt8, jnp.float32)[np.asarray(ids)]
    ref8 = jnp.einsum("rk,rkn->rn", x.astype(jnp.float32), wd8)

    def kern(ids_ref, xq_ref, sx_ref, w_ref, s_ref, o_ref):
        r = pl.program_id(1)
        @pl.when(r == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)
        acc = jnp.zeros((R, bn), jnp.float32)
        for g in range(ng):
            sl = slice(g * GS, (g + 1) * GS)
            p = jnp.dot(xq_ref[:, sl], w_ref[0, sl],
                        preferred_element_type=jnp.int32)
            acc += p.astype(jnp.float32) * sx_ref[:, g][:, None]
        o_ref_scaled = acc * s_ref[0]
        _acc_row(o_ref, o_ref_scaled, r)

    fn = pl.pallas_call(kern, grid_spec=_gspec([
        pl.BlockSpec((R, K), lambda j, i, ids: (0, 0)),
        pl.BlockSpec((R, ng), lambda j, i, ids: (0, 0)),
        pl.BlockSpec((1, K, bn), lambda j, i, ids: (ids[i], 0, j)),
        pl.BlockSpec((1, 1, bn), lambda j, i, ids: (ids[i], 0, j)),
    ], bn), out_shape=jax.ShapeDtypeStruct((R, N), jnp.float32))
    wi8 = jax.lax.bitcast_convert_type(qt8.data, jnp.int8)

    def jfn(x_, i_, w_, s_):
        xq, sx = _quant_x_groups(x_)
        return fn(i_, xq, sx, w_, s_)
    jfn = jax.jit(jfn)
    y = jfn(x, ids, wi8, qt8.scales)
    err = float(jnp.abs(y - ref8).max() / jnp.abs(ref8).max())
    _measure("V0_i8ceiling", jfn, R * K * N, err, wi8, qt8.scales)


# --- V1: int4 packed, i32 unpack -> i8 dots ---------------------------------
def run_V1(bn=512):
    def kern(ids_ref, xq_ref, sx_ref, w_ref, s_ref, o_ref):
        r = pl.program_id(1)
        @pl.when(r == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)
        c = w_ref[0].astype(jnp.int32)
        l8 = (((c & 0xF) ^ 8) - 8).astype(jnp.int8)
        h8 = ((((c >> 4) & 0xF) ^ 8) - 8).astype(jnp.int8)
        acc = jnp.zeros((R, bn), jnp.float32)
        for g in range(ng):
            wl = slice(g * gs2, (g + 1) * gs2)
            xa = slice(g * GS, g * GS + gs2)
            xb = slice(g * GS + gs2, (g + 1) * GS)
            p = (jnp.dot(xq_ref[:, xa], l8[wl], preferred_element_type=jnp.int32)
                 + jnp.dot(xq_ref[:, xb], h8[wl], preferred_element_type=jnp.int32))
            acc += p.astype(jnp.float32) * (
                sx_ref[:, g][:, None] * s_ref[0, g][None, :])
        _acc_row(o_ref, acc, r)

    fn = pl.pallas_call(kern, grid_spec=_gspec([
        pl.BlockSpec((R, K), lambda j, i, ids: (0, 0)),
        pl.BlockSpec((R, ng), lambda j, i, ids: (0, 0)),
        pl.BlockSpec((1, k2, bn), lambda j, i, ids: (ids[i], 0, j)),
        pl.BlockSpec((1, ng, bn), lambda j, i, ids: (ids[i], 0, j)),
    ], bn), out_shape=jax.ShapeDtypeStruct((R, N), jnp.float32))

    def jfn(x_, i_, w_, s_):
        xq, sx = _quant_x_groups(x_)
        return fn(i_, xq, sx, w_, s_)
    jfn = jax.jit(jfn)
    _measure("V1_unpack_i8", jfn, R * k2 * N,
             _err(jfn(x, ids, qt.data, scales3)), qt.data, scales3)


# --- V2: offset-lo repack + dot identity ------------------------------------
def run_V2(bn=512):
    # repack: flip low-nibble sign bit -> low nibble stores lo_signed+8
    data2 = jnp.asarray(np.asarray(qt.data) ^ np.uint8(8))
    w2 = jax.lax.bitcast_convert_type(data2, jnp.int8)  # = 16*hi_s + (lo_s+8)

    def kern(ids_ref, a_ref, b_ref, sx_ref, t_ref, w_ref, s_ref, o_ref):
        r = pl.program_id(1)
        @pl.when(r == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)
        braw = w_ref[0]                       # int8 = 16*hi_s + u, u = lo_s+8
        u = ((braw.astype(jnp.int32)) & 0xF).astype(jnp.int8)
        acc = jnp.zeros((R, bn), jnp.float32)
        for g in range(ng):
            wl = slice(g * gs2, (g + 1) * gs2)
            p = (jnp.dot(a_ref[:, wl], u[wl], preferred_element_type=jnp.int32)
                 + jnp.dot(b_ref[:, wl], braw[wl], preferred_element_type=jnp.int32))
            acc += (p.astype(jnp.float32) * sx_ref[:, g][:, None]
                    - t_ref[:, g][:, None]) * s_ref[0, g][None, :]
        _acc_row(o_ref, acc, r)

    fn = pl.pallas_call(kern, grid_spec=_gspec([
        pl.BlockSpec((R, k2), lambda j, i, ids: (0, 0)),
        pl.BlockSpec((R, k2), lambda j, i, ids: (0, 0)),
        pl.BlockSpec((R, ng), lambda j, i, ids: (0, 0)),
        pl.BlockSpec((R, ng), lambda j, i, ids: (0, 0)),
        pl.BlockSpec((1, k2, bn), lambda j, i, ids: (ids[i], 0, j)),
        pl.BlockSpec((1, ng, bn), lambda j, i, ids: (ids[i], 0, j)),
    ], bn), out_shape=jax.ShapeDtypeStruct((R, N), jnp.float32))

    def jfn(x_, i_, w_, s_):
        xl, xh = split_x_for_int4(x_, K, GS)      # [R, k2] each
        xlf = xl.astype(jnp.float32); xhf = xh.astype(jnp.float32)
        a = (xlf - xhf / 16.0).reshape(R, ng, gs2)
        bb = (xhf / 16.0).reshape(R, ng, gs2)
        amax = jnp.maximum(jnp.maximum(jnp.max(jnp.abs(a), -1),
                                       jnp.max(jnp.abs(bb), -1)), 1e-8)
        sx = amax / 127.0                         # [R, ng]
        qa = jnp.clip(jnp.round(a / sx[..., None]), -127, 127
                      ).astype(jnp.int8).reshape(R, k2)
        qb = jnp.clip(jnp.round(bb / sx[..., None]), -127, 127
                      ).astype(jnp.int8).reshape(R, k2)
        t = 8.0 * jnp.sum(xlf.reshape(R, ng, gs2), -1)  # [R, ng]
        return fn(i_, qa, qb, sx, t, w_, s_)
    jfn = jax.jit(jfn)
    _measure("V2_identity", jfn, R * k2 * N,
             _err(jfn(x, ids, w2, scales3)), w2, scales3)


if __name__ == "__main__":
    which = sys.argv[1:] or ["V0", "V1", "V2"]
    for v in which:
        try:
            dict(V0=run_V0, V1=run_V1, V2=run_V2)[v]()
        except Exception as ex:
            print(f"{v}: FAILED {type(ex).__name__}: {str(ex)[:300]}", flush=True)
