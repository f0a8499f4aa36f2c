"""Compute-bound int8 MXU rate probe.

The round-2 probe (perf_int8_probe.py) used M=200704, K=512, N=256 — a
memory-bound shape (102 MB of A per call, ~0.27 ms of bf16 MXU work), so
it measured the DMA path, not the MXU rate. Here the operands stay VMEM-
resident inside one kernel and the dots loop in-kernel with a
data-dependent chain (no CSE), so the measurement is pure MXU issue rate.

Harness note: the scan carry perturbs the input via a REAL runtime-zero
(xor / add of a traced value) — a `* 0` perturbation constant-folds and
the whole pallas_call hoists out of the scan (first version of this probe
measured 17 PFLOP/s that way).

v5e nominal: 197 bf16 TFLOP/s, 394 int8 TOPS — if Mosaic drives the int8
MXU mode properly, the int8 loop should run ~2x faster per dot.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, K, N = 1024, 1024, 1024
REPS = 64  # in-kernel chained dots


def chained_kernel(acc_dtype):
    def kern(a_ref, b_ref, o_ref):
        a = a_ref[:]
        acc = jnp.dot(a, b_ref[:], preferred_element_type=acc_dtype)
        for _ in range(REPS - 1):
            # data-dependent chain: reuse low bits of acc as next A
            a2 = (acc[:, :K] & 127).astype(a_ref.dtype) if \
                acc_dtype == jnp.int32 else \
                (acc[:, :K] * jnp.float32(1e-3)).astype(a_ref.dtype)
            acc = jnp.dot(a2, b_ref[:], preferred_element_type=acc_dtype)
        o_ref[:] = acc.astype(o_ref.dtype)
    return kern


def run_case(name, in_dtype, acc_dtype):
    rng = np.random.RandomState(0)
    if in_dtype == jnp.int8:
        a = jnp.asarray(rng.randint(-127, 127, (M, K), np.int8))
        b = jnp.asarray(rng.randint(-127, 127, (K, N), np.int8))
        out_dtype = jnp.int32
    else:
        a = jnp.asarray(rng.randn(M, K), jnp.float32).astype(in_dtype)
        b = jnp.asarray(rng.randn(K, N), jnp.float32).astype(in_dtype)
        out_dtype = jnp.float32

    f = pl.pallas_call(
        chained_kernel(acc_dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
    )

    @jax.jit
    def loop(a, b):
        def body(c, _):
            # c is a traced runtime-zero: the perturbation cannot fold,
            # so the pallas_call stays inside the loop
            if a.dtype == jnp.int8:
                ap = jnp.bitwise_xor(a, c.astype(jnp.int8))
            else:
                ap = a + c.astype(a.dtype)
            o = f(ap, b)
            s = o[0, 0].astype(jnp.float32)
            return s * jnp.float32(1e-30), s
        _, outs = jax.lax.scan(body, jnp.float32(0), None, length=10)
        return outs

    out = loop(a, b)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(3):
        out = loop(a, b)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / (3 * 10)
    flops = 2 * M * K * N * REPS
    print(f"{name:18s}: {dt*1e3:7.3f} ms  {flops/dt/1e12:7.1f} "
          f"T(FL)OP/s", flush=True)


if __name__ == "__main__":
    run_case("pallas bf16", jnp.bfloat16, jnp.float32)
    run_case("pallas int8", jnp.int8, jnp.int32)
