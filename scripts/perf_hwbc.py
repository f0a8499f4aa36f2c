"""Compare the frozen bf16 ResNeXt-50 trunk forward at B=256:
XLA lowering (current default, dense-groups L1) vs the batch-in-sublanes
fused bottleneck kernel (ops/bottleneck_hwbc.py), per-stage prefix deltas.

Methodology: 10 reps folded per jit with a carry-dependent input
perturbation (defeats lax.scan loop-invariant hoisting), timed over 3 calls.
"""
import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from multimodal_baby_tpu.models.vision_resnext import (
    RESNEXT50_STAGES, BottleneckX, _bn)
from multimodal_baby_tpu.ops.bottleneck_hwbc import pack_grouped_kernel
from multimodal_baby_tpu.ops.bottleneck_hwbc import (
    fused_bottleneck_hwbc, to_hwbc)

B = 256
DT = jnp.bfloat16

# (cin, width, cout, stride, has_ds) for every ResNeXt-50 block
BLOCKS = []
in_ch = 64
for planes, blocks, stride in RESNEXT50_STAGES:
    stage = []
    for i in range(blocks):
        s = stride if i == 0 else 1
        ds = i == 0
        width = planes * 2
        stage.append((in_ch, width, planes * 4, s, ds))
        in_ch = planes * 4
    BLOCKS.append(stage)


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


class Stem(nn.Module):
    @nn.compact
    def __call__(self, x):
        y = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    name="conv1", dtype=DT)(x.astype(DT))
        y = _bn("bn1", True, DT, 64)(y)
        y = nn.relu(y)
        return nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))


class XLAPrefix(nn.Module):
    upto: int
    @nn.compact
    def __call__(self, x):
        y = Stem(name="stem")(x)
        in_ch = 64
        for si, (planes, blocks, stride) in enumerate(RESNEXT50_STAGES):
            if si + 1 > self.upto:
                break
            for bi in range(blocks):
                s = stride if bi == 0 else 1
                y = BottleneckX(planes=planes, stride=s,
                                has_downsample=bi == 0, dtype=DT,
                                dense_groups=planes == 64,
                                name=f"l{si}_{bi}")(y, train=False)
        return jnp.sum(y.astype(jnp.float32))


def timed(fn, *args, iters=3, inner=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(out)
    return (time.perf_counter() - t0) / (iters * inner)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bc", type=int, default=16)
    ap.add_argument("--hh", type=str, default="",
                    help="per-stage band rows, e.g. 14,14,14,7")
    ap.add_argument("--r", type=str, default="",
                    help="per-stage chunk rows, e.g. 7,7,7,7")
    ap.add_argument("--skip-xla", action="store_true")
    args = ap.parse_args()
    hh = [int(v) for v in args.hh.split(",")] if args.hh else [None] * 4
    rr = [int(v) for v in args.r.split(",")] if args.r else [None] * 4

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, 224, 224, 3).astype(np.float32))
    fws = [[mk_fw(rng, *cfg[:3], cfg[4]) for cfg in stage] for stage in BLOCKS]

    stem = Stem()
    vs = stem.init(jax.random.PRNGKey(0), x)

    print(f"== hwbc fused trunk (Bc={args.bc}, hh={hh}, R={rr}) ==",
          flush=True)
    prev = 0.0
    for upto in range(5):
        @jax.jit
        def run(vs, x, fws):
            def body(c, _):
                y = stem.apply(vs, x + c)
                y = to_hwbc(y)
                for si, stage in enumerate(BLOCKS[:upto]):
                    for bi, (cin, w, cout, s, ds) in enumerate(stage):
                        y = fused_bottleneck_hwbc(
                            y, fws[si][bi], stride=s, Bc=args.bc,
                            hh=hh[si], R=rr[si])
                out = jnp.sum(y.astype(jnp.float32))
                return out * 0.0, out
            _, outs = jax.lax.scan(body, jnp.float32(0), None, length=10)
            return outs.sum()
        dt = timed(run, vs, x, fws)
        name = "stem+T" if upto == 0 else f"+layer{upto}"
        print(f"{name:8s}: cum {dt*1e3:7.2f} ms  (delta {(dt-prev)*1e3:6.2f} ms)",
              flush=True)
        prev = dt

    if args.skip_xla:
        return
    print("== XLA trunk (dense-groups L1) ==", flush=True)
    prev = 0.0
    for upto in range(5):
        m = XLAPrefix(upto=upto)
        v = m.init(jax.random.PRNGKey(0), x)

        @jax.jit
        def run(v, x):
            def body(c, _):
                out = m.apply(v, x + c)
                return out * 0.0, out
            _, outs = jax.lax.scan(body, jnp.float32(0), None, length=10)
            return outs.sum()
        dt = timed(run, v, x)
        name = "stem" if upto == 0 else f"+layer{upto}"
        print(f"{name:8s}: cum {dt*1e3:7.2f} ms  (delta {(dt-prev)*1e3:6.2f} ms)",
              flush=True)
        prev = dt


if __name__ == "__main__":
    main()
