"""Stem: direct 7x7/2 conv vs space-to-depth(2) + 4x4 conv (exact same math)."""
import time
import numpy as np, jax, jax.numpy as jnp

B = 256
rng = np.random.RandomState(0)
x = jnp.asarray(rng.randn(B, 224, 224, 3).astype(np.float32)).astype(jnp.bfloat16)
w = jnp.asarray(rng.randn(7, 7, 3, 64).astype(np.float32)).astype(jnp.bfloat16)

def timed(run, *args, inner=10, iters=3):
    out = run(*args); jax.block_until_ready(out); _ = float(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(*args)
    _ = float(out)
    return (time.perf_counter() - t0) / (iters * inner) * 1e3

dn = lambda a, k: jax.lax.conv_dimension_numbers(a.shape, k.shape, ("NHWC", "HWIO", "NHWC"))

def direct(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (2, 2), ((3, 3), (3, 3)), dimension_numbers=dn(x, w))

def s2d_weights(w):
    # pad 7x7 -> 8x8 with a LEADING zero row/col: tap k in 0..6 maps to
    # k' = k+1 in 0..7; k' = 2*c + p with c cell 0..3, p in-cell 0..1
    wp = jnp.pad(w, ((1, 0), (1, 0), (0, 0), (0, 0)))
    # [8,8,3,64] -> [4,2,4,2,3,64] -> [4,4,2*2*3,64]
    wp = wp.reshape(4, 2, 4, 2, 3, 64).transpose(0, 2, 1, 3, 4, 5)
    return wp.reshape(4, 4, 12, 64)

def s2d(x, w):
    B_, H, W, C = x.shape
    xs = x.reshape(B_, H // 2, 2, W // 2, 2, C).transpose(0, 1, 3, 2, 4, 5)
    xs = xs.reshape(B_, H // 2, W // 2, 4 * C)   # cell layout (p_y, p_x, c)
    ws = s2d_weights(w)                          # contract (p_y, p_x, c)
    k = ws.reshape(4, 4, 2, 2, 3, 64).reshape(4, 4, 12, 64)
    return jax.lax.conv_general_dilated(
        xs, k, (1, 1), ((2, 1), (2, 1)), dimension_numbers=dn(xs, k))

a = direct(x, w)
b = s2d(x, w)
print("equal:", float(jnp.abs((a - b).astype(jnp.float32)).max()),
      "scale", float(jnp.abs(a.astype(jnp.float32)).max()), flush=True)

for name, fn in (("direct 7x7/2", direct), ("s2d 4x4", s2d)):
    @jax.jit
    def run(x, w, fn=fn):
        def body(c, _):
            o = fn(x, w + c.astype(w.dtype))
            s = jnp.float32(o.sum())
            return s * 0.0, s
        _, outs = jax.lax.scan(body, jnp.float32(0), None, length=10)
        return outs.sum()
    print(f"{name}: {timed(run, x, w):6.2f} ms", flush=True)
