"""Single-block knob sweep for the batch-in-sublanes fused bottleneck.

Times one bottleneck block in isolation at B=256 bf16 across
(Bc, hh, R, tap_mode), perturbing the (small) w1 operand with the scan
carry so lax.scan can't hoist the forward.
"""
import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp

from multimodal_baby_tpu.ops.bottleneck import pack_grouped_kernel
from multimodal_baby_tpu.ops.bottleneck_hwbc import (
    fused_bottleneck_hwbc, to_hwbc)

B = 256
DT = jnp.bfloat16

# name -> (H, cin, width, cout, stride, has_ds)
CONFIGS = {
    "l1b0": (56, 64, 128, 256, 1, True),
    "l1b1": (56, 256, 128, 256, 1, False),
    "l2b0": (56, 256, 256, 512, 2, True),
    "l2b1": (28, 512, 256, 512, 1, False),
    "l3b0": (28, 512, 512, 1024, 2, True),
    "l3b1": (14, 1024, 512, 1024, 1, False),
    "l4b0": (14, 1024, 1024, 2048, 2, True),
    "l4b1": (7, 2048, 1024, 2048, 1, False),
}


def mk_fw(rng, cin, width, cout, has_ds):
    fw = {
        "w1": jnp.asarray(rng.randn(cin, width).astype(np.float32) * .05).astype(DT),
        "b1": jnp.asarray(rng.randn(width).astype(np.float32) * .1),
        "w2": pack_grouped_kernel(jnp.asarray(
            rng.randn(3, 3, width // 32, width).astype(np.float32) * .05), 32
        ).astype(DT),
        "b2": jnp.asarray(rng.randn(width).astype(np.float32) * .1),
        "w3": jnp.asarray(rng.randn(width, cout).astype(np.float32) * .05).astype(DT),
        "b3": jnp.asarray(rng.randn(cout).astype(np.float32) * .1),
    }
    if has_ds:
        fw["wd"] = jnp.asarray(
            rng.randn(cin, cout).astype(np.float32) * .05).astype(DT)
        fw["bd"] = jnp.asarray(rng.randn(cout).astype(np.float32) * .1)
    return fw


_WARMED = False


def time_block(x, fw, stride, Bc, hh, R, parts="all", iters=3, inner=10):
    global _WARMED

    @jax.jit
    def run(x, fw):
        def body(c, _):
            fw2 = dict(fw)
            fw2["w1"] = (fw["w1"].astype(jnp.float32) + c).astype(DT)
            y = fused_bottleneck_hwbc(x, fw2, stride=stride, Bc=Bc,
                                      hh=hh, R=R, parts=parts)
            out = jnp.sum(y.astype(jnp.float32))
            return out * 0.0, out
        _, outs = jax.lax.scan(body, jnp.float32(0), None, length=inner)
        return outs.sum()

    out = run(x, fw)
    jax.block_until_ready(out)
    if not _WARMED:
        # the first timed region in a process absorbs a large one-time
        # tunnel cost; burn it on an untimed run
        _ = float(run(x, fw))
        _WARMED = True
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(x, fw)
    _ = float(out)
    return (time.perf_counter() - t0) / (iters * inner)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("block", choices=list(CONFIGS) + ["all"])
    ap.add_argument("--bc", type=str, default="16")
    ap.add_argument("--hh", type=str, default="0")  # 0 = auto
    ap.add_argument("--r", type=str, default="0")
    ap.add_argument("--parts", type=str, default="all")
    args = ap.parse_args()

    rng = np.random.RandomState(0)
    names = list(CONFIGS) if args.block == "all" else [args.block]
    for name in names:
        H, cin, width, cout, stride, has_ds = CONFIGS[name]
        fw = mk_fw(rng, cin, width, cout, has_ds)
        x = to_hwbc(jnp.asarray(
            rng.randn(B, H, H, cin).astype(np.float32)).astype(DT))
        for Bc in [int(v) for v in args.bc.split(",")]:
            for hh in [int(v) for v in args.hh.split(",")]:
                for R in [int(v) for v in args.r.split(",")]:
                    for parts in args.parts.split(","):
                        try:
                            dt = time_block(x, fw, stride, Bc,
                                            hh or None, R or None, parts)
                            print(f"{name}: Bc={Bc} hh={hh or 'auto'} "
                                  f"R={R or 'auto'} parts={parts}: "
                                  f"{dt*1e3:6.3f} ms", flush=True)
                        except Exception as e:
                            print(f"{name}: Bc={Bc} hh={hh} R={R} "
                                  f"{parts}: FAIL {str(e)[:120]}",
                                  flush=True)


if __name__ == "__main__":
    main()
