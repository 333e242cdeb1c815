"""Probe which int8 vector ops Mosaic/v5e accepts, one tiny kernel each."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

K, N = 256, 256
rng = np.random.default_rng(0)
wb_u8 = jnp.asarray(rng.integers(0, 256, (K, N)), jnp.uint8)
x = jnp.asarray(rng.standard_normal((8, K)), jnp.bfloat16)
x8 = jnp.asarray(rng.integers(-100, 100, (8, K)), jnp.int8)


def probe(name, kern, ins):
    try:
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((8, N), jnp.float32),
        )(*ins)
        jax.block_until_ready(out)
        print(f"{name:28s}: OK", flush=True)
    except Exception as ex:
        print(f"{name:28s}: FAIL {type(ex).__name__} {str(ex)[:120]}", flush=True)


wi8 = jax.lax.bitcast_convert_type(wb_u8, jnp.int8)

# 1. int8 input + cast to bf16 + dot
probe("i8_cast_dot",
      lambda w_ref, x_ref, o_ref: o_ref.__setitem__(
          slice(None),
          jnp.dot(x_ref[:], w_ref[:].astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32)),
      [wi8, x])

# 2. int8 shift-left then cast
probe("i8_shl_cast_dot",
      lambda w_ref, x_ref, o_ref: o_ref.__setitem__(
          slice(None),
          jnp.dot(x_ref[:], (w_ref[:] << 4).astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32)),
      [wi8, x])

# 3. int8 and/sub then cast
probe("i8_and_sub_cast_dot",
      lambda w_ref, x_ref, o_ref: o_ref.__setitem__(
          slice(None),
          jnp.dot(x_ref[:],
                  (w_ref[:] - (w_ref[:] & 15)).astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32)),
      [wi8, x])

# 4. uint8 input, astype(int32) then shifts (production-style baseline)
probe("u8_i32_shifts",
      lambda w_ref, x_ref, o_ref: o_ref.__setitem__(
          slice(None),
          jnp.dot(x_ref[:],
                  ((w_ref[:].astype(jnp.int32) << 24) >> 24
                   ).astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32)),
      [wb_u8, x])

# 5. int8 x int8 dot -> int32
probe("i8xi8_dot_i32",
      lambda w_ref, x_ref, o_ref: o_ref.__setitem__(
          slice(None),
          jnp.dot(x_ref[:], w_ref[:],
                  preferred_element_type=jnp.int32).astype(jnp.float32)),
      [wi8, x8])

# 6. int8 arithmetic shift right
probe("i8_sar_cast_dot",
      lambda w_ref, x_ref, o_ref: o_ref.__setitem__(
          slice(None),
          jnp.dot(x_ref[:], (w_ref[:] >> 4).astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32)),
      [wi8, x])

# 7. int8 -> int32 -> shifts -> bf16 (is it only 8-bit SHIFTS that fail?)
probe("i8_via_i32_shl",
      lambda w_ref, x_ref, o_ref: o_ref.__setitem__(
          slice(None),
          jnp.dot(x_ref[:],
                  ((w_ref[:].astype(jnp.int32) << 4)).astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32)),
      [wi8, x])

# 8. narrow dot: 64-col slice of bf16 from int8 cast (groupout inner shape)
def kern8(w_ref, x_ref, o_ref):
    wbf = w_ref[:].astype(jnp.bfloat16)
    acc = jnp.zeros_like(o_ref)
    for g in range(4):
        sl = slice(g * 64, (g + 1) * 64)
        acc += jnp.dot(x_ref[:, sl], wbf[sl],
                       preferred_element_type=jnp.float32)
    o_ref[:] = acc
probe("i8_groupout_64dots", kern8, [wi8, x])
