"""Price the sub-int8 weight rung on the trunk's L3/L4 (VERDICT r4 task 2a)
and re-probe the Mosaic DMA ceiling (task 2b).

Three measurements, each a Pallas grid kernel timed the tunnel-safe way
(reps folded into one jit via lax.scan, carry-perturbed inputs so nothing
hoists, host value fetch to time):

1. `copy`  — pure-copy grid kernel HBM->HBM on a 64 MB bf16 tensor:
   the Mosaic DMA ceiling re-probe (round-2 measured ~210-260 GB/s per
   direction, ~340 aggregate; this checks the closure isn't resting on a
   since-fixed bug).

2. `weights` — a call whose inputs are exactly one L4 block's weight set
   (w1/w2/w3/wd int8, constant-index VMEM blocks like the real trunk
   kernel) and whose body only touches one row of each. Timed at grid
   (1,1) vs (64,1): if Mosaic re-fetched constant blocks per grid cell
   the 64-cell call would cost ~64x; the delta vs a dummy-weight call of
   the same structure prices the per-call weight DMA itself.

3. `packed` — same call with 4-bit-PACKED weights (half the bytes; two
   nibbles per int8 byte, low nibbles = first half columns) whose body
   fully unpacks every weight to int8 scratch via i32 shifts at the
   first grid cell — the real cost structure of an int4 trunk: half the
   weight DMA, plus a one-time VPU unpack.

The int4 saving ceiling for the whole step is then
    (sum of all 16 trunk block weight bytes) / measured_weight_rate / 2
which PERF_CLOSURE.md compares against the 5x step budget.

Run:  PYTHONPATH=/root/repo python scripts/perf_int4_probe.py
CPU smoke:  MMB_PROBE_SMOKE=1 JAX_PLATFORMS=cpu python scripts/perf_int4_probe.py
"""
import functools
import json
import os
import time

import numpy as np
import jax

if "cpu" in os.environ.get("JAX_PLATFORMS", "").lower():
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SMOKE = os.environ.get("MMB_PROBE_SMOKE", "0") == "1"
INTERPRET = jax.devices()[0].platform != "tpu"


def timed_ms(build_fn, *arrs, inner=8, iters=3):
    """Median-free simple timer: one jit, `inner` reps per call via scan
    (carry-perturbs every input so nothing hoists), host fetch to time."""

    @jax.jit
    def run(*arrs):
        def body(c, _):
            pert = [a + c.astype(a.dtype) for a in arrs]
            s = build_fn(*pert)
            return (s * 0).astype(jnp.float32) + 1, s
        _, outs = jax.lax.scan(body, jnp.float32(0), None, length=inner)
        return outs.sum()

    out = run(*arrs)
    _ = float(out)          # burn the first-region garbage (verify skill)
    out = run(*arrs)
    _ = float(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(*arrs)
    _ = float(out)
    return (time.perf_counter() - t0) / (iters * inner) * 1e3


# ---------------------------------------------------------------------------
# 1. pure-copy DMA ceiling
# ---------------------------------------------------------------------------

def copy_probe():
    rows, cols, br = (256, 1024, 32) if SMOKE else (4096, 8192, 256)

    def kern(x_ref, o_ref):
        o_ref[...] = x_ref[...]

    def call(x):
        y = pl.pallas_call(
            kern,
            grid=(rows // br,),
            in_specs=[pl.BlockSpec((br, cols), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((br, cols), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows, cols), x.dtype),
            interpret=INTERPRET,
        )(x)
        return y[0, 0].astype(jnp.float32)

    x = jnp.asarray(np.random.RandomState(0).randn(rows, cols),
                    jnp.bfloat16)
    ms = timed_ms(call, x, inner=4 if SMOKE else 8)
    nbytes = rows * cols * 2
    return {
        "probe": "mosaic_copy",
        "ms": round(ms, 4),
        "GBps_per_dir": round(nbytes / (ms * 1e-3) / 1e9, 1),
        "GBps_aggregate": round(2 * nbytes / (ms * 1e-3) / 1e9, 1),
    }


# ---------------------------------------------------------------------------
# 2/3. weight-streaming probes (L4 block-1 weight set)
# ---------------------------------------------------------------------------

# L4 first block (ResNeXt-50 32x4d): cin=1024, width=1024, cout=2048,
# downsample present — the biggest weight set in the trunk.
CIN, WIDTH, COUT = (128, 128, 256) if SMOKE else (1024, 1024, 2048)
NB = WIDTH // 128


def _wset(rng, pack=False, dummy=False):
    if dummy:
        shapes = [(8, 128), (1, 1, 128, 128), (8, 128), (8, 128)]
    elif pack:
        shapes = [(CIN, WIDTH // 2), (9, NB, 128, 64),
                  (WIDTH, COUT // 2), (CIN, COUT // 2)]
    else:
        shapes = [(CIN, WIDTH), (9, NB, 128, 128),
                  (WIDTH, COUT), (CIN, COUT)]
    return [jnp.asarray(rng.randint(-127, 128, s), jnp.int8)
            for s in shapes]


def _unpack_nibbles(p_i32):
    """packed int8 (as i32) -> (low-nibble int8, high-nibble int8),
    both sign-extended; Mosaic-lowerable (shifts on i32 only)."""
    lo = ((p_i32 << 28) >> 28).astype(jnp.int8)
    hi = (p_i32 >> 4).astype(jnp.int8)
    return lo, hi


def weight_probe(grid_b, pack=False, dummy=False):
    rng = np.random.RandomState(0)
    ws = _wset(rng, pack=pack, dummy=dummy)

    def const_map(n):
        return lambda ib, ih: (0,) * n

    in_specs = [pl.BlockSpec(w.shape, const_map(w.ndim),
                             memory_space=pltpu.VMEM) for w in ws]

    scratch = []
    if pack:
        scratch = [pltpu.VMEM((CIN, WIDTH), jnp.int8),
                   pltpu.VMEM((9, NB, 128, 128), jnp.int8),
                   pltpu.VMEM((WIDTH, COUT), jnp.int8),
                   pltpu.VMEM((CIN, COUT), jnp.int8)]

    def kern(*refs):
        wrefs, o_ref = refs[:4], refs[4]
        srefs = refs[5:]
        if pack:
            # one-time full unpack at the first grid cell (resident after)
            @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
            def _():
                for w_ref, s_ref in zip(wrefs, srefs):
                    p = w_ref[...].astype(jnp.int32)
                    lo, hi = _unpack_nibbles(p)
                    half = w_ref.shape[-1]
                    s_ref[..., :half] = lo
                    s_ref[..., half:] = hi
            touch = [s_ref[..., :1, :128].reshape(-1, 128)[:1]
                     for s_ref in srefs]
        else:
            touch = [w_ref[..., :1, :128].reshape(-1, 128)[:1]
                     for w_ref in wrefs]
        acc = touch[0].astype(jnp.float32)
        for t in touch[1:]:
            acc = acc + t.astype(jnp.float32)
        o_ref[...] = acc

    def call(*ws):
        y = pl.pallas_call(
            kern,
            grid=(grid_b, 1),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, 128), lambda ib, ih: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
            scratch_shapes=scratch,
            interpret=INTERPRET,
        )(*ws)
        return y[0, 0]

    ms = timed_ms(call, *ws, inner=4 if SMOKE else 16)
    nbytes = sum(int(np.prod(w.shape)) for w in ws)
    return ms, nbytes


def main():
    results = [copy_probe()]
    print(json.dumps(results[-1]), flush=True)

    g64 = 2 if SMOKE else 64
    ms_dummy, _ = weight_probe(1, dummy=True)
    ms_1, nb_full = weight_probe(1)
    ms_64, _ = weight_probe(g64)
    ms_p1, nb_pack = weight_probe(1, pack=True)
    ms_p64, _ = weight_probe(g64, pack=True)

    dma_ms = ms_1 - ms_dummy
    rate = nb_full / max(dma_ms, 1e-9) / 1e6  # GB/s
    # if the weight DMA is below timing noise, bound the step arithmetic
    # with the (slower -> conservative, i.e. saving-maximizing) pure-copy
    # per-direction rate instead of a garbage implied rate
    rate_valid = dma_ms > 0.005
    ceiling_rate = rate if rate_valid else results[0]["GBps_per_dir"]
    results.append({
        "probe": "weight_stream_L4block1",
        "weight_bytes_int8": nb_full,
        "ms_dummy_call": round(ms_dummy, 4),
        "ms_int8_grid1": round(ms_1, 4),
        "ms_int8_grid64": round(ms_64, 4),
        "restreamed_per_cell": bool(ms_64 > 4 * ms_1),
        "weight_dma_ms_per_call": round(dma_ms, 4),
        "implied_weight_GBps": round(rate, 1) if rate_valid else None,
        "ms_packed_grid1": round(ms_p1, 4),
        "ms_packed_grid64": round(ms_p64, 4),
        "packed_bytes": nb_pack,
        "int4_saving_ms_per_call_grid1": round(ms_1 - ms_p1, 4),
        "int4_saving_ms_per_call_grid64": round(ms_64 - ms_p64, 4),
    })
    print(json.dumps(results[-1]), flush=True)

    # step-level ceiling arithmetic: every trunk block's weight bytes
    # (ResNeXt-50 32x4d, int8, BN folded) DMA'd once per pallas_call
    def blk(cin, width, cout, ds):
        return (cin * width + 9 * (width // 128) * 128 * 128
                + width * cout + (cin * cout if ds else 0))
    wbytes = 0
    for stage, (cin, width, cout, n) in {
            "L1": (64, 128, 256, 3), "L2": (256, 256, 512, 4),
            "L3": (512, 512, 1024, 6), "L4": (1024, 1024, 2048, 3)}.items():
        wbytes += blk(cin, width, cout, True)
        wbytes += (n - 1) * blk(cout, width, cout, False)
    step_weight_dma_ms = wbytes / max(ceiling_rate, 1e-9) / 1e6
    results.append({
        "probe": "step_ceiling",
        "trunk_weight_bytes_int8": wbytes,
        "rate_source": "measured_weight_dma" if rate_valid else "copy_probe",
        "step_weight_dma_ms": round(step_weight_dma_ms, 4),
        "int4_step_saving_ceiling_ms": round(step_weight_dma_ms / 2, 4),
    })
    print(json.dumps(results[-1]), flush=True)


if __name__ == "__main__":
    main()
