"""Why doesn't int8 speed up layer1? (perf_hwbc_int8: L1 9.25 int8 vs
9.30 bf16 despite half the DMA bytes.)

Dissects one L1 tail block (256 -> 128 -> 256, stride 1, no downsample)
with the kernel's `parts` modes, bf16 vs int8:

  copy    pure DMA in -> out              (tests: is i8 DMA element-rate
                                           bound rather than byte-rate?)
  c1only  conv1 + DMA                     (K=256 dot marginal)
  noc2    all but the grouped 3x3         (adds conv3+residual epilogue)
  all     full block                      (adds 9-tap grouped conv, K=128)

Method per repo convention: 10 kernel calls folded into one jit with a
carry perturbation of the input; host-fetch timing.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from multimodal_baby_tpu.ops.bottleneck_hwbc import pack_grouped_kernel
from multimodal_baby_tpu.ops.bottleneck_hwbc import (
    fused_bottleneck_hwbc, to_hwbc)

B = 256
CIN, WIDTH, COUT = 256, 128, 256
H = W = 56


def mk_fw(rng, int8):
    if int8:
        return {
            "w1": jnp.asarray(
                rng.randint(-80, 80, (CIN, WIDTH), np.int8)),
            "a1": jnp.full((WIDTH,), 0.01, jnp.float32),
            "b1": jnp.asarray(rng.randn(WIDTH).astype(np.float32) * .1),
            "w2": pack_grouped_kernel(jnp.asarray(rng.randint(
                -80, 80, (3, 3, WIDTH // 32, WIDTH)).astype(np.float32)),
                32).astype(jnp.int8),
            "a2": jnp.full((WIDTH,), 0.01, jnp.float32),
            "b2": jnp.asarray(rng.randn(WIDTH).astype(np.float32) * .1),
            "w3": jnp.asarray(
                rng.randint(-80, 80, (WIDTH, COUT), np.int8)),
            "a3": jnp.full((COUT,), 0.01, jnp.float32),
            "b3": jnp.asarray(rng.randn(COUT).astype(np.float32) * .1),
            "ai": jnp.full((COUT,), 0.9, jnp.float32),
        }
    dt = jnp.bfloat16
    return {
        "w1": jnp.asarray(
            rng.randn(CIN, WIDTH).astype(np.float32) * .05).astype(dt),
        "b1": jnp.asarray(rng.randn(WIDTH).astype(np.float32) * .1),
        "w2": pack_grouped_kernel(jnp.asarray(
            rng.randn(3, 3, WIDTH // 32, WIDTH).astype(np.float32) * .05),
            32).astype(dt),
        "b2": jnp.asarray(rng.randn(WIDTH).astype(np.float32) * .1),
        "w3": jnp.asarray(
            rng.randn(WIDTH, COUT).astype(np.float32) * .05).astype(dt),
        "b3": jnp.asarray(rng.randn(COUT).astype(np.float32) * .1),
    }


def run_mode(int8, parts):
    rng = np.random.RandomState(0)
    bsub = 32 if int8 else 16
    if int8:
        x0 = jnp.asarray(rng.randint(0, 100, (B, H, W, CIN), np.int8))
    else:
        x0 = jnp.asarray(
            rng.randn(B, H, W, CIN).astype(np.float32) * .5
        ).astype(jnp.bfloat16)
    x5 = to_hwbc(x0, bsub)
    fw = mk_fw(rng, int8)

    @jax.jit
    def run(x5, fw):
        def body(c, _):
            if int8:
                y = jnp.bitwise_xor(x5, c.astype(jnp.int8))
            else:
                y = x5 + c.astype(x5.dtype)
            y = fused_bottleneck_hwbc(y, fw, stride=1, parts=parts)
            out = jnp.sum(y.astype(jnp.float32))
            return out * jnp.float32(1e-30), out
        _, outs = jax.lax.scan(body, jnp.float32(0), None, length=10)
        return outs

    out = run(x5, fw)
    _ = float(np.asarray(out)[-1])
    t0 = time.perf_counter()
    for _ in range(3):
        out = run(x5, fw)
    _ = float(np.asarray(out)[-1])
    dt_ms = (time.perf_counter() - t0) / 30 * 1e3
    # effective DMA rate for the copy mode: in+out bytes
    isz = 1 if int8 else 2
    gb = (B * H * W * CIN + B * H * W * COUT) * isz / 1e9
    rate = gb / (dt_ms / 1e3)
    name = "int8" if int8 else "bf16"
    print(f"{name} parts={parts:7s}: {dt_ms:7.3f} ms"
          + (f"  ({rate:5.0f} GB/s in+out)" if parts == "copy" else ""),
          flush=True)
    return dt_ms


def main():
    for parts in ("copy", "c1only", "noc2", "all"):
        for int8 in (False, True):
            run_mode(int8, parts)


if __name__ == "__main__":
    main()
