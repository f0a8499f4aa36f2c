"""int8 vs bf16 MXU rate at the fused-trunk dot shapes.

perf_int8_mxu.py established (marginal-cost method: time difference
between REPS=64 and REPS=16 in-kernel chained dots) that int8 dots run
~1.6-2x faster than bf16 at K=N=1024. The trunk kernels, however, issue:

- grouped conv2: [M, 128] @ [128, 128] tap dots (K=128) — if the int8
  speedup comes from doubling the effective K depth, K=128 dots may see
  no gain;
- conv1/conv3/downsample: K in {256..2048}, N in {128..2048}.

This probe measures the marginal per-dot cost for both dtypes at both
shapes, chained through a VPU cast so the chain can't collapse.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(M, K, N, in_dtype, reps):
    acc_dtype = jnp.int32 if in_dtype == jnp.int8 else jnp.float32

    def kern(a_ref, b_ref, o_ref):
        a = a_ref[:]
        acc = jnp.dot(a, b_ref[:], preferred_element_type=acc_dtype)
        for _ in range(reps - 1):
            if in_dtype == jnp.int8:
                # cheap dep in i32 (Mosaic has no i8 vector arith)
                a2 = jnp.clip((acc[:, :1] & 1) + a.astype(jnp.int32),
                              -127, 127).astype(jnp.int8)
            else:
                a2 = a + (acc[:, :1] * jnp.float32(1e-6)).astype(a.dtype)
            acc = jnp.dot(a2, b_ref[:], preferred_element_type=acc_dtype)
        o_ref[:] = acc.astype(o_ref.dtype)

    rng = np.random.RandomState(0)
    if in_dtype == jnp.int8:
        a = jnp.asarray(rng.randint(-63, 63, (M, K), np.int8))
        b = jnp.asarray(rng.randint(-63, 63, (K, N), np.int8))
        out_dtype = jnp.int32
    else:
        a = jnp.asarray(rng.randn(M, K), np.float32).astype(in_dtype)
        b = jnp.asarray(rng.randn(K, N), np.float32).astype(in_dtype)
        out_dtype = jnp.float32

    f = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype))

    @jax.jit
    def loop(a, b):
        def body(c, _):
            ap = (jnp.bitwise_xor(a, c.astype(jnp.int8))
                  if a.dtype == jnp.int8 else a + c.astype(a.dtype))
            o = f(ap, b)
            s = o[0, 0].astype(jnp.float32)
            return s * jnp.float32(1e-30), s
        _, outs = jax.lax.scan(body, jnp.float32(0), None, length=10)
        return outs

    out = loop(a, b)
    jax.block_until_ready(out)
    _ = float(np.asarray(out)[-1])  # settle tunnel
    t0 = time.perf_counter()
    for _ in range(3):
        out = loop(a, b)
    _ = float(np.asarray(out)[-1])
    return (time.perf_counter() - t0) / 30


def marginal(M, K, N, in_dtype, r_lo=16, r_hi=64):
    lo = probe(M, K, N, in_dtype, r_lo)
    hi = probe(M, K, N, in_dtype, r_hi)
    per_dot = (hi - lo) / (r_hi - r_lo)
    tput = 2 * M * K * N / per_dot / 1e12 if per_dot > 0 else float("inf")
    name = "int8" if in_dtype == jnp.int8 else "bf16"
    print(f"[M={M:5d} K={K:4d} N={N:4d}] {name}: {per_dot*1e6:7.2f} "
          f"us/dot  {tput:6.1f} T/s", flush=True)
    return per_dot


if __name__ == "__main__":
    # grouped-conv tap-dot shape (layer2-ish M)
    b16 = marginal(8192, 128, 128, jnp.bfloat16)
    i8 = marginal(8192, 128, 128, jnp.int8)
    print(f"  K=128 int8 speedup: {b16 / i8:.2f}x")
    # 1x1-conv shape
    b16 = marginal(4096, 512, 512, jnp.bfloat16)
    i8 = marginal(4096, 512, 512, jnp.int8)
    print(f"  K=512 int8 speedup: {b16 / i8:.2f}x")
