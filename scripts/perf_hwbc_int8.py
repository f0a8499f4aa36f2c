"""Per-stage prefix timing of the int8 fused trunk vs bf16.

End-to-end, MMB_TRUNK_INT8=1 gained only ~6% (10,020 -> 10,620 pairs/s at
B=1024) against a model of ~+40%. This probe times stage prefixes of the
kernel chain in both dtypes with identical structure (per-block "blocks"
mode), isolating where the int8 win evaporates.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from multimodal_baby_tpu.models.vision_resnext import RESNEXT50_STAGES
from multimodal_baby_tpu.ops.bottleneck_hwbc import pack_grouped_kernel
from multimodal_baby_tpu.ops.bottleneck_hwbc import (
    fused_bottleneck_hwbc, to_hwbc)

B = 256

BLOCKS = []
in_ch = 64
for planes, blocks, stride in RESNEXT50_STAGES:
    stage = []
    for i in range(blocks):
        s = stride if i == 0 else 1
        stage.append((in_ch, planes * 2, planes * 4, s, i == 0))
        in_ch = planes * 4
    BLOCKS.append(stage)


def mk_fw(rng, cin, width, cout, has_ds, int8):
    if int8:
        fw = {
            "w1": jnp.asarray(rng.randint(-80, 80, (cin, width), np.int8)),
            "a1": jnp.full((width,), 0.01, jnp.float32),
            "b1": jnp.asarray(rng.randn(width).astype(np.float32) * .1),
            "w2": pack_grouped_kernel(jnp.asarray(rng.randint(
                -80, 80, (3, 3, width // 32, width)).astype(np.float32)),
                32).astype(jnp.int8),
            "a2": jnp.full((width,), 0.01, jnp.float32),
            "b2": jnp.asarray(rng.randn(width).astype(np.float32) * .1),
            "w3": jnp.asarray(rng.randint(-80, 80, (width, cout), np.int8)),
            "a3": jnp.full((cout,), 0.01, jnp.float32),
            "b3": jnp.asarray(rng.randn(cout).astype(np.float32) * .1),
        }
        if has_ds:
            fw["wd"] = jnp.asarray(
                rng.randint(-80, 80, (cin, cout), np.int8))
            fw["ad"] = jnp.full((cout,), 0.01, jnp.float32)
            fw["bd"] = jnp.asarray(rng.randn(cout).astype(np.float32) * .1)
        else:
            fw["ai"] = jnp.full((cout,), 0.9, jnp.float32)
        return fw
    dt = jnp.bfloat16
    fw = {
        "w1": jnp.asarray(
            rng.randn(cin, width).astype(np.float32) * .05).astype(dt),
        "b1": jnp.asarray(rng.randn(width).astype(np.float32) * .1),
        "w2": pack_grouped_kernel(jnp.asarray(
            rng.randn(3, 3, width // 32, width).astype(np.float32) * .05),
            32).astype(dt),
        "b2": jnp.asarray(rng.randn(width).astype(np.float32) * .1),
        "w3": jnp.asarray(
            rng.randn(width, cout).astype(np.float32) * .05).astype(dt),
        "b3": jnp.asarray(rng.randn(cout).astype(np.float32) * .1),
    }
    if has_ds:
        fw["wd"] = jnp.asarray(
            rng.randn(cin, cout).astype(np.float32) * .05).astype(dt)
        fw["bd"] = jnp.asarray(rng.randn(cout).astype(np.float32) * .1)
    return fw


def run_case(int8: bool):
    rng = np.random.RandomState(0)
    bsub = 32 if int8 else 16
    if int8:
        x0 = jnp.asarray(
            rng.randint(0, 100, (B, 56, 56, 64), np.int8))
    else:
        x0 = jnp.asarray(
            rng.randn(B, 56, 56, 64).astype(np.float32) * .5
        ).astype(jnp.bfloat16)
    x5 = to_hwbc(x0, bsub)
    fws = [[mk_fw(rng, *cfg[:3], cfg[4], int8) for cfg in stage]
           for stage in BLOCKS]

    name = "int8" if int8 else "bf16"
    prev = 0.0
    for upto in range(1, 5):
        @jax.jit
        def run(x5, fws):
            def body(c, _):
                if int8:
                    y = jnp.bitwise_xor(x5, c.astype(jnp.int8))
                else:
                    y = x5 + c.astype(x5.dtype)
                for si, stage in enumerate(BLOCKS[:upto]):
                    for bi, (cin, w, cout, s, ds) in enumerate(stage):
                        y = fused_bottleneck_hwbc(y, fws[si][bi], stride=s)
                out = jnp.sum(y.astype(jnp.float32))
                return out * jnp.float32(1e-30), out
            _, outs = jax.lax.scan(body, jnp.float32(0), None, length=10)
            return outs

        out = run(x5, fws)
        _ = float(np.asarray(out)[-1])
        t0 = time.perf_counter()
        for _ in range(3):
            out = run(x5, fws)
        _ = float(np.asarray(out)[-1])
        dt_ms = (time.perf_counter() - t0) / 30 * 1e3
        print(f"{name} prefix L1..L{upto}: {dt_ms:7.2f} ms "
              f"(delta L{upto}: {dt_ms - prev:6.2f})", flush=True)
        prev = dt_ms


if __name__ == "__main__":
    run_case(False)
    run_case(True)
