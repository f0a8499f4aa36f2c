"""Fused bottleneck kernel vs XLA per stage geometry (B=256, bf16)."""
import time
import numpy as np, jax, jax.numpy as jnp
from multimodal_baby_tpu.models.vision_resnext import BottleneckX
from multimodal_baby_tpu.ops.bottleneck import (
    fold_block_params, fused_bottleneck_forward)

B = 256

def timed(run, *args, inner=10, iters=3):
    out = run(*args); jax.block_until_ready(out); _ = float(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(*args)
    _ = float(out)
    return (time.perf_counter() - t0) / (iters * inner) * 1e3

import sys
HALF = sys.argv[1] if len(sys.argv) > 1 else "all"
GEOMS = [
    ("L1.b0 (ds)",    64,  56, 64,   1, True,  1),
    ("L1.plain",      64,  56, 256,  1, False, 2),
    ("L2.b0 (s2,ds)", 128, 56, 256,  2, True,  1),
    ("L2.plain",      128, 28, 512,  1, False, 3),
    ("L3.b0 (s2,ds)", 256, 28, 512,  2, True,  1),
    ("L3.plain",      256, 14, 1024, 1, False, 5),
    ("L4.b0 (s2,ds)", 512, 14, 1024, 2, True,  1),
    ("L4.plain",      512, 7,  2048, 1, False, 2),
]

if HALF == "a":
    GEOMS = GEOMS[:4]
elif HALF == "b":
    GEOMS = GEOMS[4:]
rng = np.random.RandomState(0)
tot_x, tot_p = 0.0, 0.0
for name, planes, H, cin, stride, ds, count in GEOMS:
    m = BottleneckX(planes=planes, stride=stride, has_downsample=ds,
                    dtype=jnp.bfloat16, dense_groups=(planes == 64))
    x = jnp.asarray(rng.randn(B, H, H, cin).astype(np.float32)).astype(jnp.bfloat16)
    v = m.init(jax.random.PRNGKey(planes), x, train=False)
    fw = fold_block_params(v["params"], v["batch_stats"], jnp.bfloat16)

    @jax.jit
    def run_xla(v, x):
        def body(c, _):
            out = m.apply(v, x + c.astype(x.dtype), train=False)
            s = jnp.float32(out.sum())
            return s * 0.0, s
        _, outs = jax.lax.scan(body, jnp.float32(0), None, length=10)
        return outs.sum()

    @jax.jit
    def run_pl(fw, x):
        def body(c, _):
            out = fused_bottleneck_forward(x + c.astype(x.dtype), fw,
                                           stride=stride)
            s = jnp.float32(out.sum())
            return s * 0.0, s
        _, outs = jax.lax.scan(body, jnp.float32(0), None, length=10)
        return outs.sum()

    # numerics on-device
    ref = m.apply(v, x, train=False).astype(jnp.float32)
    got = fused_bottleneck_forward(x, fw, stride=stride).astype(jnp.float32)
    err = float(jnp.abs(ref - got).max() / jnp.abs(ref).max())
    tx = timed(run_xla, v, x)
    tp = timed(run_pl, fw, x)
    tot_x += tx * count
    tot_p += tp * count
    print(f"{name:14s} x{count}: xla {tx:6.2f} ms  pallas {tp:6.2f} ms  "
          f"(rel err {err:.1e})", flush=True)
print(f"{'TRUNK BLOCKS':14s}   : xla {tot_x:6.2f} ms  pallas {tot_p:6.2f} ms", flush=True)
