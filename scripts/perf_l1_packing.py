"""Layer1 3x3 conv: sweep the group-packing factor. fgc=32 is the true
grouped conv; fgc<32 packs 32/fgc groups into one block-diagonal masked
super-group (FLOPs x (32/fgc), better MXU lane use)."""
import time
import numpy as np, jax, jax.numpy as jnp

B = 256
H, C, G, cg = 56, 128, 32, 4
rng = np.random.RandomState(0)
x = jnp.asarray(rng.randn(B, H, H, C).astype(np.float32)).astype(jnp.bfloat16)
wg = jnp.asarray(rng.randn(3, 3, cg, C).astype(np.float32)).astype(jnp.bfloat16)

def make_weights(fgc):
    """[3,3,cg,C] grouped kernel -> [3,3,C//fgc,C] masked kernel for
    feature_group_count=fgc."""
    if fgc == G:
        return wg
    sg = C // fgc          # channels per super-group
    w_t = wg.reshape(9, cg, C)
    row = jnp.arange(sg)[:, None]
    col = jnp.arange(C)[None, :]
    # within super-group b (= col // sg), input channel index = b*sg + row
    in_ch = (col // sg) * sg + row
    ids = jnp.arange(C) // cg
    mask = (ids[in_ch] == ids[col])
    dense = jnp.where(mask, w_t[:, (in_ch % cg), col], 0)
    return dense.reshape(3, 3, sg, C)

def timed(run, *args, inner=10, iters=3):
    out = run(*args); jax.block_until_ready(out); _ = float(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(*args)
    _ = float(out)
    return (time.perf_counter() - t0) / (iters * inner) * 1e3

ref = None
for fgc in (32, 16, 8, 4, 2, 1):
    w = make_weights(fgc)
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    def conv(x, w, fgc=fgc, dn=dn):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn,
            feature_group_count=fgc)
    out = conv(x, w)
    if ref is None:
        ref = out
    err = float(jnp.abs((out - ref).astype(jnp.float32)).max())
    @jax.jit
    def run(x, w):
        def body(c, _):
            o = conv(x, w + c.astype(w.dtype))
            s = jnp.float32(o.sum())
            return s * 0.0, s
        _, outs = jax.lax.scan(body, jnp.float32(0), None, length=10)
        return outs.sum()
    print(f"fgc={fgc:2d} (flops x{G//fgc:2d}): {timed(run, x, w):6.2f} ms  "
          f"err={err:.1e}", flush=True)
