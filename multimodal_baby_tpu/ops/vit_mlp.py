"""Fused ViT MLP block (Pallas TPU kernel): LN + fc1 + GELU + fc2 + residual.

Why (B=64 device trace, BENCH_NOTES round 4): the 12 fc1 fusions bill
0.98 ms each against fc2's 0.43 — identical matmul FLOPs, so the fc1
fusion runs at 2.3x its MXU floor while fc2 runs AT floor. The
difference is the erf-GELU epilogue on the [B, N, 4C] hidden tensor,
which XLA executes SERIALLY after each output tile's matmul, plus the
80 MB/block HBM round-trip of that hidden tensor. This kernel

  * keeps the hidden tensor in VMEM (never exists in HBM),
  * chunks the 4C axis so chunk i's GELU (VPU) is data-independent of
    chunk i+1's fc1 dot (MXU) and the two pipelines can overlap,
  * folds norm2's normalize + affine and the residual add in, removing
    two more loop fusions' traffic.

Weights ride as grid-constant VMEM operands (~9.4 MB bf16 at ViT-B),
DMA'd once. The GELU form follows MMB_VIT_GELU (vision_vit._gelu):
exact erf by default.

Backward uses an XLA-reference VJP (the ViT trunk is frozen in the CVCL
recipes — forward is the hot path; reference
multimodal/vision_transformer_dino_mugs.py:231-250 for the block).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


def _erfc_rational_f32(a: jax.Array) -> jax.Array:
    """erfc on f32 for a >= 0, from exp/div/FMA only (A&S 7.1.26).

    Mosaic's TC lowering has no `erf` primitive (measured: the erf fused-MLP
    queue-14 combos abort with NotImplementedError), so the in-kernel erf GELU
    uses this classical rational form. Absolute error <= 1.5e-7 (textbook
    bound) + f32 rounding; measured max |Derf| = 4.7e-7 vs lax.erf
    (tests/test_ops.py::test_erf_rational_matches_lax_erf).
    """
    f32 = jnp.float32
    t = 1.0 / (1.0 + f32(0.3275911) * a)
    poly = t * (f32(0.254829592)
                + t * (f32(-0.284496736)
                       + t * (f32(1.421413741)
                              + t * (f32(-1.453152027)
                                     + t * f32(1.061405429)))))
    return poly * jnp.exp(-a * a)


def _erf_rational_f32(x: jax.Array) -> jax.Array:
    """erf(x) = sign(x) * (1 - erfc(|x|)), Mosaic-lowerable (see above)."""
    return jnp.sign(x) * (1.0 - _erfc_rational_f32(jnp.abs(x)))


def _gelu_erf_kernel_f32(h: jax.Array) -> jax.Array:
    """erf-form GELU via the cancellation-free erfc branch.

    GELU(h) = 0.5*h*(1 + erf(h/sqrt2)). For h < 0 the (1 + erf) factor
    cancels catastrophically, so compute it directly as erfc(|h|/sqrt2);
    for h >= 0 it is 2 - erfc. Fidelity envelope (measured,
    tests/test_ops.py): max |DGELU| <= 2.5e-6 absolute everywhere
    (the tail share of that is lax.erf's OWN rounding); bf16 outputs
    >= 99% bit-identical to the lax.erf form on the live range
    |h| <= 4 with every live disagreement exactly one bf16 ulp;
    larger relative disagreements are confined to the dead tail
    h < -4 where |GELU(h)| < 2e-4.
    """
    E = _erfc_rational_f32(jnp.abs(h) * jnp.float32(0.7071067811865476))
    branch = jnp.where(h < 0, E, 2.0 - E)
    return 0.5 * h * branch


def _gelu_f32(h: jax.Array, mode: str, *, in_kernel: bool = False) -> jax.Array:
    """GELU on f32, selected like models/vision_vit._gelu. `in_kernel`
    swaps lax.erf for the Mosaic-lowerable rational erfc form (see above)."""
    if mode == "tanh":
        c = jnp.float32(0.7978845608028654)  # sqrt(2/pi)
        return 0.5 * h * (1.0 + jnp.tanh(c * (h + 0.044715 * h * h * h)))
    if mode == "sigmoid":
        return h * jax.nn.sigmoid(1.702 * h)
    if in_kernel:
        return _gelu_erf_kernel_f32(h)
    return 0.5 * h * (1.0 + jax.lax.erf(h * jnp.float32(0.7071067811865476)))


def _mlp_half_f32(xb, g, b, w1_ref, b1, w2_ref, b2, *, eps: float,
                  f_chunk: int, n_chunks: int, gelu_mode: str):
    """The MLP half's math on VMEM-resident values/refs: bf16 block
    input [N, C] -> f32 ``x + fc2(gelu(fc1(LN(x))))``. Shared by
    ``_mlp_kernel`` and the whole-ViT-block kernel (ops/vit_block.py);
    weight matrices arrive as REFS so only one hidden chunk's slices
    load per dot."""
    f32 = jnp.float32
    x32 = xb.astype(f32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True) - jnp.square(mu)
    xn32 = (x32 - mu) * jax.lax.rsqrt(var + eps)
    xn = (xn32 * g.astype(f32) + b.astype(f32)).astype(xb.dtype)  # [N, C]

    dn = (((1,), (0,)), ((), ()))
    acc = jnp.zeros((xb.shape[0], xb.shape[1]), f32)  # [N, C]
    for c in range(n_chunks):
        lo = c * f_chunk
        hi = lo + f_chunk
        h = jax.lax.dot_general(xn, w1_ref[:, lo:hi], dn,
                                preferred_element_type=f32)
        h = h + b1[lo:hi].astype(f32)
        gact = _gelu_f32(h, gelu_mode, in_kernel=True).astype(xb.dtype)
        acc = acc + jax.lax.dot_general(gact, w2_ref[lo:hi, :], dn,
                                        preferred_element_type=f32)
    return x32 + acc + b2.astype(f32)


def _mlp_kernel(x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                o_ref, *, eps: float, f_chunk: int, n_chunks: int,
                gelu_mode: str):
    out = _mlp_half_f32(x_ref[0], g_ref[0], b_ref[0], w1_ref, b1_ref[0],
                        w2_ref, b2_ref[0], eps=eps, f_chunk=f_chunk,
                        n_chunks=n_chunks, gelu_mode=gelu_mode)
    o_ref[0] = out.astype(o_ref.dtype)


def _xla_mlp(x, ln_scale, ln_bias, w1, b1, w2, b2, eps: float,
             gelu_mode: str):
    """Oracle/VJP reference: the block's own math in XLA ops (f32 LN
    stats, bf16 matmuls when x is bf16 — mirrors vision_vit.ViTBlock)."""
    f32 = jnp.float32
    x32 = x.astype(f32)
    mu = x32.mean(-1, keepdims=True)
    var = jnp.square(x32).mean(-1, keepdims=True) - jnp.square(mu)
    xn = ((x32 - mu) * jax.lax.rsqrt(var + eps)
          * ln_scale.astype(f32) + ln_bias.astype(f32)).astype(x.dtype)
    h = (xn @ w1.astype(x.dtype) + b1.astype(x.dtype)).astype(f32)
    g = _gelu_f32(h, gelu_mode).astype(x.dtype)
    y = (g @ w2.astype(x.dtype) + b2.astype(x.dtype)).astype(f32)
    return (x32 + y).astype(x.dtype)


def _pallas_mlp(x, ln_scale, ln_bias, w1, b1, w2, b2, eps, gelu_mode,
                f_chunk=512):
    B, N, C = x.shape
    F = w1.shape[1]
    assert F % f_chunk == 0, (F, f_chunk)
    kern = functools.partial(_mlp_kernel, eps=eps, f_chunk=f_chunk,
                             n_chunks=F // f_chunk, gelu_mode=gelu_mode)
    # vectors ride as [1, D] (the TPU-safe pattern, cf. bottleneck_hwbc)
    vec = lambda n: pl.BlockSpec((1, n), lambda b: (0, 0),
                                 memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, N, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            vec(C), vec(C),
            pl.BlockSpec((C, F), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            vec(F),
            pl.BlockSpec((F, C), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            vec(C),
        ],
        out_specs=pl.BlockSpec((1, N, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, C), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * N * C * F,
            transcendentals=B * N * F,
            bytes_accessed=(2 * B * N * C + 2 * C * F) * x.dtype.itemsize),
        interpret=_interpret(),
    )(x, ln_scale.reshape(1, -1), ln_bias.reshape(1, -1), w1,
      b1.reshape(1, -1), w2, b2.reshape(1, -1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def fused_mlp(x, ln_scale, ln_bias, w1, b1, w2, b2,
              eps: float = 1e-6, gelu_mode: str = "erf"):
    """x + fc2(gelu(fc1(LayerNorm(x)))) in one kernel; x: [B, N, C],
    w1: [C, F], w2: [F, C]. The [B, N, F] hidden tensor stays in VMEM.
    All parameters ride as grid-constant VMEM operands (cast to x.dtype
    by the caller or here)."""
    dt = x.dtype
    return _pallas_mlp(x, ln_scale.astype(dt), ln_bias.astype(dt),
                       w1.astype(dt), b1.astype(dt), w2.astype(dt),
                       b2.astype(dt), eps, gelu_mode)


def _mlp_fwd(x, ln_scale, ln_bias, w1, b1, w2, b2, eps, gelu_mode):
    return fused_mlp(x, ln_scale, ln_bias, w1, b1, w2, b2, eps,
                     gelu_mode), (x, ln_scale, ln_bias, w1, b1, w2, b2)


def _mlp_bwd(eps, gelu_mode, res, g):
    x, ln_scale, ln_bias, w1, b1, w2, b2 = res
    _, vjp = jax.vjp(
        lambda *a: _xla_mlp(*a, eps=eps, gelu_mode=gelu_mode),
        x, ln_scale, ln_bias, w1, b1, w2, b2)
    return vjp(g)


fused_mlp.defvjp(_mlp_fwd, _mlp_bwd)


def should_fuse_mlp(n_tokens: int, dim: int, hidden: int,
                    f_chunk: int = 512) -> bool:
    """VMEM: grid-constant weights + per-cell x/xn/acc/out + one hidden
    chunk (double-buffered x/out blocks are small)."""
    if hidden % f_chunk:
        return False
    weights = 2 * dim * hidden * 2
    cell = (4 * n_tokens * dim * 4 + 2 * n_tokens * f_chunk * 4)
    return weights + 2 * cell < 96 * 1024 * 1024
