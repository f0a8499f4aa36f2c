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

from multimodal_baby_tpu.ops.bottleneck_hwbc import pack_grouped_kernel
from multimodal_baby_tpu.ops.bottleneck_hwbc import (
    fused_bottleneck_hwbc, fused_bottleneck_tiles, to_hwbc)

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


def time_block(x, fw, stride, Bc, hh, R, parts="all", conv3="scratch",
               mode="grid", iters=3, inner=10):
    global _WARMED

    @jax.jit
    def run(x, fw):
        def body(c, _):
            fw2 = dict(fw)
            fw2["w1"] = (fw["w1"].astype(jnp.float32) + c).astype(DT)
            if mode == "tiles":
                y = fused_bottleneck_tiles(x, fw2, stride=stride, Bc=Bc,
                                           hh=hh, R=R)
            else:
                y = fused_bottleneck_hwbc(x, fw2, stride=stride, Bc=Bc,
                                          hh=hh, R=R, parts=parts,
                                          conv3_mode=conv3)
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
    ap.add_argument("block")
    ap.add_argument("--bc", type=str, default="16")
    ap.add_argument("--hh", type=str, default="0")  # 0 = auto
    ap.add_argument("--r", type=str, default="0")
    ap.add_argument("--parts", type=str, default="all")
    ap.add_argument("--conv3", type=str, default="scratch")
    ap.add_argument("--halo-copy", action="store_true")
    ap.add_argument("--mode", type=str, default="grid")
    args = ap.parse_args()

    if args.block.startswith("bstage"):
        for name in args.block.split(","):
            for Bc in [int(v) for v in args.bc.split(",")]:
                for hh in [int(v) for v in args.hh.split(",")] or [0]:
                    for hc in ([False, True] if args.halo_copy
                               else [False]):
                        try:
                            run_banded(name, Bc=Bc, hh=hh or 14,
                                       halo_copy=hc)
                        except Exception as e:
                            print(f"{name} Bc={Bc} hh={hh} hc={hc}: "
                                  f"FAIL {str(e)[:150]}", flush=True)
        return
    if args.block.startswith("stage"):
        for name in args.block.split(","):
            for Bc in [int(v) for v in args.bc.split(",")]:
                try:
                    run_stage(name, Bc=Bc)
                except Exception as e:
                    print(f"{name} Bc={Bc}: FAIL {str(e)[:150]}", flush=True)
        return

    rng = np.random.RandomState(0)
    names = list(CONFIGS) if args.block == "all" else args.block.split(",")
    for name in names:
        H, cin, width, cout, stride, has_ds = CONFIGS[name]
        fw = mk_fw(rng, cin, width, cout, has_ds)
        x = to_hwbc(jnp.asarray(
            rng.randn(B, H, H, cin).astype(np.float32)).astype(DT))
        for Bc in [int(v) for v in args.bc.split(",")]:
            for hh in [int(v) for v in args.hh.split(",")]:
                for R in [int(v) for v in args.r.split(",")]:
                    for parts in args.parts.split(","):
                        for c3 in args.conv3.split(","):
                            try:
                                dt = time_block(x, fw, stride, Bc,
                                                hh or None, R or None,
                                                parts, c3, args.mode)
                                print(f"{name}: Bc={Bc} hh={hh or 'auto'} "
                                      f"R={R or 'auto'} parts={parts} "
                                      f"conv3={c3} mode={args.mode}: "
                                      f"{dt*1e3:6.3f} ms", flush=True)
                            except Exception as e:
                                print(f"{name}: Bc={Bc} hh={hh} R={R} "
                                      f"{parts} {c3}: FAIL {str(e)[:120]}",
                                      flush=True)


# --- whole-stage probe: python perf_hwbc_block.py stage3|stage4 ---
STAGES = {
    "stage2": (56, [(256, 256, 512, 2, True)] + [(512, 256, 512, 1, False)] * 3),
    "stage3": (28, [(512, 512, 1024, 2, True)] + [(1024, 512, 1024, 1, False)] * 5),
    "stage4": (14, [(1024, 1024, 2048, 2, True)] + [(2048, 1024, 2048, 1, False)] * 2),
    # tail-only variants (stride-2 head block run separately per-block)
    "stage2b": (28, [(512, 256, 512, 1, False)] * 3),
    "stage3b": (14, [(1024, 512, 1024, 1, False)] * 5),
    "stage4b": (7, [(2048, 1024, 2048, 1, False)] * 2),
}

def run_stage(name, Bc=16, iters=3, inner=10):
    from multimodal_baby_tpu.ops.bottleneck_hwbc import fused_stage_hwbc
    global _WARMED
    H, cfgs = STAGES[name]
    rng = np.random.RandomState(0)
    fws = [mk_fw(rng, cin, w, co, ds) for cin, w, co, s, ds in cfgs]
    strides = [c[3] for c in cfgs]
    x = to_hwbc(jnp.asarray(
        rng.randn(B, H, H, cfgs[0][0]).astype(np.float32)).astype(DT))

    @jax.jit
    def run(x, fws):
        def body(c, _):
            fws2 = [dict(fw) for fw in fws]
            fws2[0]["w1"] = (fws[0]["w1"].astype(jnp.float32) + c).astype(DT)
            y = fused_stage_hwbc(x, fws2, strides, Bc=Bc)
            out = jnp.sum(y.astype(jnp.float32))
            return out * 0.0, out
        _, outs = jax.lax.scan(body, jnp.float32(0), None, length=inner)
        return outs.sum()

    out = run(x, fws)
    jax.block_until_ready(out)
    if not _WARMED:
        _ = float(run(x, fws)); _WARMED = True
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(x, fws)
    _ = float(out)
    dt = (time.perf_counter() - t0) / (iters * inner)
    print(f"{name} fused whole-stage (Bc={Bc}): {dt*1e3:6.3f} ms", flush=True)


BSTAGES = {
    "bstage1": (56, [(64, 128, 256, 1, True)] + [(256, 128, 256, 1, False)] * 2),
    "bstage2": (56, [(256, 256, 512, 2, True)] + [(512, 256, 512, 1, False)] * 3),
}


def run_banded(name, Bc=16, hh=14, halo_copy=False, iters=3, inner=10):
    from multimodal_baby_tpu.ops.bottleneck_hwbc import fused_stage_banded
    global _WARMED
    H, cfgs = BSTAGES[name]
    rng = np.random.RandomState(0)
    fws = [mk_fw(rng, cin, w, co, ds) for cin, w, co, s, ds in cfgs]
    strides = [c[3] for c in cfgs]
    x = to_hwbc(jnp.asarray(
        rng.randn(B, H, H, cfgs[0][0]).astype(np.float32)).astype(DT))
    x2 = x + jnp.bfloat16(0) if halo_copy else None
    if x2 is not None:
        x2 = jax.device_put(np.asarray(x2))

    @jax.jit
    def run(x, fws, x2=None):
        def body(c, _):
            fws2 = [dict(fw) for fw in fws]
            fws2[0]["w1"] = (fws[0]["w1"].astype(jnp.float32) + c).astype(DT)
            y = fused_stage_banded(x, fws2, strides, Bc=Bc, hh=hh,
                                   halo_source=x2)
            out = jnp.sum(y.astype(jnp.float32))
            return out * 0.0, out
        _, outs = jax.lax.scan(body, jnp.float32(0), None, length=inner)
        return outs.sum()

    args = (x, fws, x2) if halo_copy else (x, fws)
    out = run(*args)
    jax.block_until_ready(out)
    if not _WARMED:
        _ = float(run(*args)); _WARMED = True
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(*args)
    _ = float(out)
    dt = (time.perf_counter() - t0) / (iters * inner)
    print(f"{name} banded stage (Bc={Bc}, hh={hh}, halo_copy={halo_copy}): "
          f"{dt*1e3:6.3f} ms", flush=True)


if __name__ == "__main__":
    main()
