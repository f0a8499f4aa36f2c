"""In-context trunk fwd sweep over layer1 group-packing factors."""
import sys, time
import numpy as np, jax, jax.numpy as jnp
from multimodal_baby_tpu.models.vision_resnext import ResNeXt50

B = 256
x = jnp.asarray(np.random.RandomState(0).randn(B, 224, 224, 3).astype(np.float32))

def timed(run, *args, inner=10, iters=3):
    out = run(*args); jax.block_until_ready(out); _ = float(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(*args)
    _ = float(out)
    return (time.perf_counter() - t0) / (iters * inner) * 1e3

combos = eval(sys.argv[1]) if len(sys.argv) > 1 else [
    (True, False, False, False),   # current default (dense L1)
    (8, False, False, False),      # L1 packed fgc=8
    (4, False, False, False),      # L1 packed fgc=4
]
for combo in combos:
    m = ResNeXt50(dtype=jnp.bfloat16, dense_groups=tuple(combo))
    v = m.init(jax.random.PRNGKey(0), x)
    @jax.jit
    def run(v, x):
        def body(c, _):
            out = m.apply(v, x + c)["pooled"]
            return jnp.float32(out.sum()) * 0.0, out.sum()
        _, outs = jax.lax.scan(body, jnp.float32(0), None, length=10)
        return outs.sum()
    print(f"{combo}: {timed(run, v, x)*1e0:7.2f} ms", flush=True)
