"""Micro-bench individual ops at ResNeXt stage shapes (B=256, bf16)."""
import time
import numpy as np, jax, jax.numpy as jnp
from functools import partial

B = 256

def timed(fn, *args, inner=10, iters=3):
    @jax.jit
    def run(*a):
        def body(c, _):
            out = fn(*[a[0] + c.astype(a[0].dtype)] + list(a[1:]))
            s = jnp.float32(out.sum())
            return s * 0.0, s
        _, outs = jax.lax.scan(body, jnp.float32(0), None, length=inner)
        return outs.sum()
    out = run(*args); jax.block_until_ready(out); _ = float(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(*args)
    _ = float(out)
    return (time.perf_counter() - t0) / (iters * inner) * 1e3

rng = np.random.RandomState(0)
def arr(*s):
    return jnp.asarray(rng.randn(*s).astype(np.float32)).astype(jnp.bfloat16)

# layer2 shapes: [B,28,28,512] tensors, width 256
x512 = arr(B, 28, 28, 512)
x256 = arr(B, 28, 28, 256)
w1 = arr(1, 1, 512, 256)     # conv1 1x1
wg = arr(3, 3, 8, 256)       # grouped 3x3 (32 groups, cg=8)
wd = arr(3, 3, 256, 256)     # dense 3x3
dn = lambda x, w: jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))

conv = lambda x, w, g=1: jax.lax.conv_general_dilated(
    x, w, (1, 1), ((1, 1), (1, 1)) if w.shape[0] == 3 else ((0, 0), (0, 0)),
    dimension_numbers=dn(x, w), feature_group_count=g)

print("layer2 shapes (B=256):", flush=True)
print(f"  1x1 conv 512->256        : {timed(conv, x512, w1):7.3f} ms  (SOL ~0.26)", flush=True)
print(f"  3x3 grouped conv (32x8)  : {timed(partial(conv, g=32), x256, wg):7.3f} ms", flush=True)
print(f"  3x3 dense conv 256->256  : {timed(conv, x256, wd):7.3f} ms  (SOL ~1.2)", flush=True)
add = lambda a, b: jax.nn.relu(a + b)
print(f"  residual add+relu 512ch  : {timed(add, x512, x512):7.3f} ms  (BW ~0.29)", flush=True)
m = arr(B * 28 * 28, 512); w = arr(512, 256)
mm = lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.bfloat16)
print(f"  matmul [200704,512]x[512,256]: {timed(mm, m, w):7.3f} ms", flush=True)

# layer3 shapes: [B,14,14,1024], width 512, cg=16
x1024 = arr(B, 14, 14, 1024)
x512s = arr(B, 14, 14, 512)
w1b = arr(1, 1, 1024, 512)
wgb = arr(3, 3, 16, 512)
print("layer3 shapes:", flush=True)
print(f"  1x1 conv 1024->512       : {timed(conv, x1024, w1b):7.3f} ms", flush=True)
print(f"  3x3 grouped conv (32x16) : {timed(partial(conv, g=32), x512s, wgb):7.3f} ms", flush=True)

# stem
x_in = arr(B, 224, 224, 3)
w7 = arr(7, 7, 3, 64)
stem = lambda x, w: jax.lax.conv_general_dilated(
    x, w, (2, 2), ((3, 3), (3, 3)), dimension_numbers=dn(x, w))
print(f"  stem 7x7/2 conv          : {timed(stem, x_in, w7):7.3f} ms", flush=True)
