"""Micro-bench individual ops at ResNeXt stage shapes (B=256, bf16).
Anti-hoisting: perturb the SMALL operand (weights) with the carry, so the
measurement does not add an elementwise pass over the big tensor."""
import time
import numpy as np, jax, jax.numpy as jnp
from functools import partial

B = 256

def timed(fn, big, small, inner=10, iters=3):
    @jax.jit
    def run(big, small):
        def body(c, _):
            out = fn(big, small + c.astype(small.dtype))
            s = jnp.float32(out.sum())
            return s * 0.0, s
        _, outs = jax.lax.scan(body, jnp.float32(0), None, length=inner)
        return outs.sum()
    out = run(big, small); jax.block_until_ready(out); _ = float(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(big, small)
    _ = float(out)
    return (time.perf_counter() - t0) / (iters * inner) * 1e3

rng = np.random.RandomState(0)
def arr(*s):
    return jnp.asarray(rng.randn(*s).astype(np.float32)).astype(jnp.bfloat16)

x512 = arr(B, 28, 28, 512)
x256 = arr(B, 28, 28, 256)
w1 = arr(1, 1, 512, 256)
wg = arr(3, 3, 8, 256)
wd = arr(3, 3, 256, 256)
dn = lambda x, w: jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
conv = lambda x, w, g=1: jax.lax.conv_general_dilated(
    x, w, (1, 1), ((1, 1), (1, 1)) if w.shape[0] == 3 else ((0, 0), (0, 0)),
    dimension_numbers=dn(x, w), feature_group_count=g)

print("layer2 shapes (B=256) bf16:", flush=True)
print(f"  1x1 conv 512->256        : {timed(conv, x512, w1):7.3f} ms  (SOL flop .26 / bw .37)", flush=True)
print(f"  3x3 grouped conv (32x8)  : {timed(partial(lambda x, w: conv(x, w, 32)), x256, wg):7.3f} ms  (bw ~.25)", flush=True)
print(f"  3x3 dense conv 256->256  : {timed(conv, x256, wd):7.3f} ms  (SOL flop 1.2)", flush=True)
# residual add+relu: scalar perturbation fuses into the same pass
def addrelu(a, c2):
    return jax.nn.relu(a + a * c2[0, 0])
print(f"  add+relu 512ch (2 pass)  : {timed(addrelu, x512, arr(1, 1)):7.3f} ms  (bw ~.25)", flush=True)
m = arr(B * 28 * 28, 512)
w = arr(512, 256)
w2k = arr(512, 2048)
mm = lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.bfloat16)
print(f"  matmul K512 N256         : {timed(mm, m, w):7.3f} ms", flush=True)
print(f"  matmul K512 N2048        : {timed(mm, m, w2k):7.3f} ms  (SOL flop 2.1 / bw 1.2)", flush=True)

x1024 = arr(B, 14, 14, 1024)
x512s = arr(B, 14, 14, 512)
w1b = arr(1, 1, 1024, 512)
wgb = arr(3, 3, 16, 512)
print("layer3 shapes:", flush=True)
print(f"  1x1 conv 1024->512       : {timed(conv, x1024, w1b):7.3f} ms", flush=True)
print(f"  3x3 grouped conv (32x16) : {timed(partial(lambda x, w: conv(x, w, 32)), x512s, wgb):7.3f} ms", flush=True)

x_in = arr(B, 224, 224, 3)
w7 = arr(7, 7, 3, 64)
stem = lambda x, w: jax.lax.conv_general_dilated(
    x, w, (2, 2), ((3, 3), (3, 3)), dimension_numbers=dn(x, w))
print(f"  stem 7x7/2 conv          : {timed(stem, x_in, w7):7.3f} ms  (bw ~.12)", flush=True)

# layer1 shapes
x56 = arr(B, 56, 56, 256)
x128 = arr(B, 56, 56, 128)
w1c = arr(1, 1, 256, 128)
wgc = arr(3, 3, 4, 128)
wdc = arr(3, 3, 128, 128)
print("layer1 shapes:", flush=True)
print(f"  1x1 conv 256->128        : {timed(conv, x56, w1c):7.3f} ms", flush=True)
print(f"  3x3 grouped conv (32x4)  : {timed(partial(lambda x, w: conv(x, w, 32)), x128, wgc):7.3f} ms", flush=True)
print(f"  3x3 dense conv 128->128  : {timed(conv, x128, wdc):7.3f} ms", flush=True)
