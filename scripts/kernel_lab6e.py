"""Kernel lab 6e: production candidates for the w4a8 decode-MoE kernel.

lab6d: V2 (offset-lo repack + dot identity, i8 dots) hit 529 GB/s vs the
production bf16-dequant kernel's 338, but shared a/b activation scales cost
6e-2 rel err. Candidates here:

  V2s : V2 with SPLIT a/b scales (two int32 dots scaled separately)
  V3  : V2s with [a;b] stacked into ONE 128-deep dot per group
        (concat u-plane + raw-plane along K inside the kernel)
  V4  : V2s at bn=full-N (fewer grid programs)
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
# offset-lo repack: int8 view = 16*hi_s + (lo_s+8)
data2 = jnp.asarray(np.asarray(qt.data) ^ np.uint8(8))
w2 = jax.lax.bitcast_convert_type(data2, jnp.int8)


def _measure(name, jfn, nbytes, err, *wargs):
    @jax.jit
    def chain(x, ids, *wargs):
        def body(i, xx):
            y = jfn(xx, ids, *wargs)
            return (y[:, :K] * 1e-6).astype(xx.dtype) + xx
        return jax.lax.fori_loop(0, INNER, body, x)
    y = chain(x, ids, *wargs); jax.block_until_ready(y)
    tdir = f"/tmp/lab6e_{name}"; os.system(f"rm -rf {tdir}")
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


def _prep_x(x_):
    """Split-scale activation prep: a = xl - xh/16, b = xh/16, each
    per-(row,group) int8-quantized on its OWN scale; t = 8*sum_g(xl)."""
    xl, xh = split_x_for_int4(x_, K, GS)      # [R, k2]
    xlf = xl.astype(jnp.float32); xhf = xh.astype(jnp.float32)
    a = (xlf - xhf / 16.0).reshape(R, ng, gs2)
    b = (xhf / 16.0).reshape(R, ng, gs2)

    def q(v):
        amax = jnp.maximum(jnp.max(jnp.abs(v), -1), 1e-8)
        s = amax / 127.0
        return (jnp.clip(jnp.round(v / s[..., None]), -127, 127)
                .astype(jnp.int8).reshape(R, k2), s)

    qa, sa = q(a)
    qb, sb = q(b)
    t = 8.0 * jnp.sum(xlf.reshape(R, ng, gs2), -1)  # [R, ng]
    return qa, qb, sa, sb, t


def run_V2s(bn=512, name="V2s_split"):
    def kern(ids_ref, a_ref, b_ref, sa_ref, sb_ref, t_ref, w_ref, s_ref, o_ref):
        r = pl.program_id(1)
        @pl.when(r == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)
        braw = w_ref[0]
        u = ((braw.astype(jnp.int32)) & 0xF).astype(jnp.int8)
        acc = jnp.zeros((R, o_ref.shape[1]), jnp.float32)
        for g in range(ng):
            wl = slice(g * gs2, (g + 1) * gs2)
            pa = jnp.dot(a_ref[:, wl], u[wl], preferred_element_type=jnp.int32)
            pb = jnp.dot(b_ref[:, wl], braw[wl], preferred_element_type=jnp.int32)
            val = (pa.astype(jnp.float32) * sa_ref[:, g][:, None]
                   + pb.astype(jnp.float32) * sb_ref[:, g][:, None]
                   - t_ref[:, g][:, None])
            acc += val * s_ref[0, g][None, :]
        _acc_row(o_ref, acc, r)

    fn = pl.pallas_call(kern, grid_spec=_gspec([
        pl.BlockSpec((R, k2), lambda j, i, ids: (0, 0)),
        pl.BlockSpec((R, k2), lambda j, i, ids: (0, 0)),
        pl.BlockSpec((R, ng), lambda j, i, ids: (0, 0)),
        pl.BlockSpec((R, ng), lambda j, i, ids: (0, 0)),
        pl.BlockSpec((R, ng), lambda j, i, ids: (0, 0)),
        pl.BlockSpec((1, k2, bn), lambda j, i, ids: (ids[i], 0, j)),
        pl.BlockSpec((1, ng, bn), lambda j, i, ids: (ids[i], 0, j)),
    ], bn), out_shape=jax.ShapeDtypeStruct((R, N), jnp.float32))

    def jfn(x_, i_, w_, s_):
        qa, qb, sa, sb, t = _prep_x(x_)
        return fn(i_, qa, qb, sa, sb, t, w_, s_)
    jfn = jax.jit(jfn)
    _measure(name, jfn, R * k2 * N, _err(jfn(x, ids, w2, scales3)), w2, scales3)


def run_V3(bn=512):
    """One 128-deep dot per group: stack [a;b] rows and [u;braw] rows."""
    def kern(ids_ref, ab_ref, sa_ref, sb_ref, t_ref, w_ref, s_ref, o_ref):
        r = pl.program_id(1)
        @pl.when(r == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)
        braw = w_ref[0]                              # [k2, bn]
        u = ((braw.astype(jnp.int32)) & 0xF).astype(jnp.int8)
        # interleave per group: rows [2g*gs2 : (2g+1)*gs2] = u_g,
        #                       rows [(2g+1)*gs2 : (2g+2)*gs2] = braw_g
        ug = u.reshape(ng, gs2, bn)
        bg = braw.reshape(ng, gs2, bn)
        wcat = jnp.concatenate([ug, bg], axis=1).reshape(2 * k2, bn)
        acc = jnp.zeros((R, bn), jnp.float32)
        for g in range(ng):
            wl = slice(g * GS, (g + 1) * GS)         # 128 stacked rows
            p = jnp.dot(ab_ref[:, wl], wcat[wl], preferred_element_type=jnp.int32)
            # NOTE: single int32 dot mixes sa/sb; requires sa == sb. Here we
            # pre-scale b's codes into a's scale domain on the host side
            # instead: ab carries qa and qb_rescaled with one shared scale sa.
            val = (p.astype(jnp.float32) * sa_ref[:, g][:, None]
                   - t_ref[:, g][:, None])
            acc += val * s_ref[0, g][None, :]
        _acc_row(o_ref, acc, r)

    fn = pl.pallas_call(kern, grid_spec=_gspec([
        pl.BlockSpec((R, 2 * k2), lambda j, i, ids: (0, 0)),
        pl.BlockSpec((R, ng), lambda j, i, ids: (0, 0)),
        pl.BlockSpec((R, ng), lambda j, i, ids: (0, 0)),
        pl.BlockSpec((R, ng), lambda j, i, ids: (0, 0)),
        pl.BlockSpec((1, k2, bn), lambda j, i, ids: (ids[i], 0, j)),
        pl.BlockSpec((1, ng, bn), lambda j, i, ids: (ids[i], 0, j)),
    ], bn), out_shape=jax.ShapeDtypeStruct((R, N), jnp.float32))

    def jfn(x_, i_, w_, s_):
        qa, qb, sa, sb, t = _prep_x(x_)
        # rescale qb into sa's domain: qb' = round(qb * sb/sa) — int8 again;
        # cheap on [R,k2]; error absorbed into the activation quant noise.
        ratio = (sb / jnp.maximum(sa, 1e-20))[..., None]      # [R, ng, 1]
        qb2 = jnp.clip(jnp.round(qb.reshape(R, ng, gs2).astype(jnp.float32)
                                 * ratio), -127, 127).astype(jnp.int8)
        ab = jnp.concatenate(
            [qa.reshape(R, ng, gs2), qb2], axis=2).reshape(R, 2 * k2)
        return fn(i_, ab, sa, sb, t, w_, s_)
    jfn = jax.jit(jfn)
    _measure("V3_stack128", jfn, R * k2 * N, _err(jfn(x, ids, w2, scales3)),
             w2, scales3)


def run_V5(bn=512):
    """Balanced 3-dot identity: quantize xl and xh directly (full int8
    precision each). With u = braw & 15 = lo_s + 8:
      xl.lo_s = xl.u - 8*sum(xl)
      xh.hi_s = (xh.braw - xh.u) / 16      (exact in int32)
    D1 = [qxl; qxh] @ u  (one 2R-row dot), D2 = qxh @ braw.
    """
    def kern(ids_ref, xlh_ref, sl_ref, sh_ref, t_ref, w_ref, s_ref, o_ref):
        r = pl.program_id(1)
        @pl.when(r == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)
        braw = w_ref[0]
        u = ((braw.astype(jnp.int32)) & 0xF).astype(jnp.int8)
        acc = jnp.zeros((R, bn), jnp.float32)
        for g in range(ng):
            wl = slice(g * gs2, (g + 1) * gs2)
            d1 = jnp.dot(xlh_ref[:, wl], u[wl], preferred_element_type=jnp.int32)
            d2 = jnp.dot(xlh_ref[R:, wl], braw[wl],
                         preferred_element_type=jnp.int32)
            lo_part = (d1[:R].astype(jnp.float32) * sl_ref[:, g][:, None]
                       - t_ref[:, g][:, None])
            hi_part = ((d2 - d1[R:]).astype(jnp.float32)
                       * (sh_ref[:, g][:, None] / 16.0))
            acc += (lo_part + hi_part) * s_ref[0, g][None, :]
        _acc_row(o_ref, acc, r)

    fn = pl.pallas_call(kern, grid_spec=_gspec([
        pl.BlockSpec((2 * R, k2), lambda j, i, ids: (0, 0)),
        pl.BlockSpec((R, ng), lambda j, i, ids: (0, 0)),
        pl.BlockSpec((R, ng), lambda j, i, ids: (0, 0)),
        pl.BlockSpec((R, ng), lambda j, i, ids: (0, 0)),
        pl.BlockSpec((1, k2, bn), lambda j, i, ids: (ids[i], 0, j)),
        pl.BlockSpec((1, ng, bn), lambda j, i, ids: (ids[i], 0, j)),
    ], bn), out_shape=jax.ShapeDtypeStruct((R, N), jnp.float32))

    def jfn(x_, i_, w_, s_):
        xl, xh = split_x_for_int4(x_, K, GS)
        xlf = xl.astype(jnp.float32).reshape(R, ng, gs2)
        xhf = xh.astype(jnp.float32).reshape(R, ng, gs2)

        def q(v):
            amax = jnp.maximum(jnp.max(jnp.abs(v), -1), 1e-8)
            s = amax / 127.0
            return (jnp.clip(jnp.round(v / s[..., None]), -127, 127)
                    .astype(jnp.int8).reshape(R, k2), s)

        qxl, sl = q(xlf)
        qxh, sh = q(xhf)
        t = 8.0 * jnp.sum(xlf, -1)  # [R, ng]
        xlh = jnp.concatenate([qxl, qxh], axis=0)  # [2R, k2]
        return fn(i_, xlh, sl, sh, t, w_, s_)
    jfn = jax.jit(jfn)
    _measure("V5_balanced", jfn, R * k2 * N, _err(jfn(x, ids, w2, scales3)),
             w2, scales3)


if __name__ == "__main__":
    which = sys.argv[1:] or ["V2s", "V3", "V4", "V5"]
    for v in which:
        try:
            if v == "V2s":
                run_V2s()
            elif v == "V3":
                run_V3()
            elif v == "V4":
                run_V2s(bn=N, name="V4_fullN")
            elif v == "V5":
                run_V5()
        except Exception as ex:
            print(f"{v}: FAILED {type(ex).__name__}: {str(ex)[:300]}", flush=True)
