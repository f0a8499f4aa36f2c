"""Is int8 MXU ~2x bf16 on this v5e? Matmul + Pallas-dot probes."""
import time
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def timed(run, *args, inner=10, iters=3):
    out = run(*args); jax.block_until_ready(out); _ = float(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(*args)
    _ = float(out)
    return (time.perf_counter() - t0) / (iters * inner) * 1e3

rng = np.random.RandomState(0)
M, K, N = 200704, 512, 256

a8 = jnp.asarray(rng.randint(-127, 127, (M, K), np.int8))
b8 = jnp.asarray(rng.randint(-127, 127, (K, N), np.int8))
abf = jnp.asarray(rng.randn(M, K).astype(np.float32)).astype(jnp.bfloat16)
bbf = jnp.asarray(rng.randn(K, N).astype(np.float32)).astype(jnp.bfloat16)

def mk(dtype_pref):
    @jax.jit
    def run(a, b):
        def body(c, _):
            out = jnp.dot(a, b + c.astype(b.dtype),
                          preferred_element_type=dtype_pref)
            s = jnp.float32(out[0].sum())
            return s * 0.0, s
        _, outs = jax.lax.scan(body, jnp.float32(0), None, length=10)
        return outs.sum()
    return run

print(f"XLA bf16 matmul : {timed(mk(jnp.float32), abf, bbf):7.3f} ms", flush=True)
print(f"XLA int8 matmul : {timed(mk(jnp.int32), a8, b8):7.3f} ms", flush=True)

# Pallas tiled int8 vs bf16 matmul (grid over M)
def pallas_mm(a, b, out_dtype, acc_dtype, TM=2048):
    Mx, Kx = a.shape
    Nx = b.shape[1]
    def kern(a_ref, b_ref, o_ref):
        o_ref[:] = jnp.dot(a_ref[:], b_ref[:],
                           preferred_element_type=acc_dtype
                           ).astype(o_ref.dtype)
    return pl.pallas_call(
        kern, grid=(Mx // TM,),
        in_specs=[pl.BlockSpec((TM, Kx), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((Kx, Nx), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TM, Nx), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mx, Nx), out_dtype),
    )(a, b)

def mkp(out_dtype, acc_dtype):
    @jax.jit
    def run(a, b):
        def body(c, _):
            out = pallas_mm(a, b + c.astype(b.dtype), out_dtype, acc_dtype)
            s = jnp.float32(out[0].sum())
            return s * 0.0, s
        _, outs = jax.lax.scan(body, jnp.float32(0), None, length=10)
        return outs.sum()
    return run

M2 = (M // 2048) * 2048
print(f"Pallas bf16 mm  : {timed(mkp(jnp.bfloat16, jnp.float32), abf[:M2], bbf):7.3f} ms", flush=True)
print(f"Pallas int8 mm  : {timed(mkp(jnp.int32, jnp.int32), a8[:M2], b8):7.3f} ms", flush=True)
