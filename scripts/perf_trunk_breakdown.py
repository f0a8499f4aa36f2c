"""Trunk stage breakdown: time progressively deeper prefixes of the
frozen bf16 ResNeXt-50 forward at B=256 (10 reps folded per jit)."""
import time
import numpy as np, jax, jax.numpy as jnp
import flax.linen as nn
from multimodal_baby_tpu.models.vision_resnext import (
    RESNEXT50_STAGES, BottleneckX, ResNeXt50, _bn)

B = 256
DT = jnp.bfloat16

class Prefix(nn.Module):
    upto: int  # 0=stem only, 1..4 = through layerN
    dense_groups: bool = True
    @nn.compact
    def __call__(self, x):
        dt = DT
        x = x.astype(dt)
        y = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    name="conv1", dtype=dt)(x)
        y = _bn("bn1", True, dt, 64)(y)
        y = nn.relu(y)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        in_ch = 64
        for stage_idx, (planes, blocks, stride) in enumerate(RESNEXT50_STAGES):
            if stage_idx + 1 > self.upto:
                break
            for block_idx in range(blocks):
                s = stride if block_idx == 0 else 1
                needs_ds = block_idx == 0 and (s != 1 or in_ch != planes * 4)
                y = BottleneckX(planes=planes, stride=s, has_downsample=needs_ds,
                                dtype=dt,
                                dense_groups=self.dense_groups and planes == 64,
                                name=f"layer{stage_idx+1}_{block_idx}")(y, train=False)
                in_ch = planes * 4
        return jnp.sum(y.astype(jnp.float32))

def timed(fn, *args, iters=3, inner=10):
    out = fn(*args); jax.block_until_ready(out); _ = float(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(out)
    return (time.perf_counter() - t0) / (iters * inner)

x = jnp.asarray(np.random.RandomState(0).randn(B, 224, 224, 3).astype(np.float32))
prev = 0.0
for upto in range(5):
    m = Prefix(upto=upto)
    v = m.init(jax.random.PRNGKey(0), x)
    @jax.jit
    def run(v, x):
        def body(c, _):
            # carry-dependent input defeats loop-invariant hoisting
            out = m.apply(v, x + c)
            return out * 0.0, out
        _, outs = jax.lax.scan(body, jnp.float32(0), None, length=10)
        return outs.sum()
    dt = timed(run, v, x)
    name = "stem" if upto == 0 else f"+layer{upto}"
    print(f"{name:8s}: cumulative {dt*1e3:7.2f} ms  (delta {(dt-prev)*1e3:6.2f} ms)", flush=True)
    prev = dt
