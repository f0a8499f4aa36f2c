"""A/B: per-stage dense-groups vs XLA grouped-conv lowering, trunk fwd,
B=256 bf16, hoisting-safe (carry-dependent input)."""
import time
import numpy as np, jax, jax.numpy as jnp
from multimodal_baby_tpu.models.vision_resnext import ResNeXt50

B = 256

def timed(run, *args, iters=3, inner=10):
    out = run(*args); jax.block_until_ready(out); _ = float(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(*args)
    _ = float(out)
    return (time.perf_counter() - t0) / (iters * inner)

x = jnp.asarray(np.random.RandomState(0).randn(B, 224, 224, 3).astype(np.float32))

for combo in [(False,)*4, (True, False, False, False),
              (True, True, False, False), (True, True, True, False),
              (True, True, True, True), (False, True, True, True)]:
    m = ResNeXt50(dtype=jnp.bfloat16, dense_groups=combo)
    v = m.init(jax.random.PRNGKey(0), x)
    @jax.jit
    def run(v, x):
        def body(c, _):
            out = m.apply(v, x + c)["pooled"]
            return jnp.float32(out.sum()) * 0.0, out.sum()
        _, outs = jax.lax.scan(body, jnp.float32(0), None, length=10)
        return outs.sum()
    dt = timed(run, v, x)
    print("".join("D" if d else "G" for d in combo), f"{dt*1e3:7.2f} ms", flush=True)
