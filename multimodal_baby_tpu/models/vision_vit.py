"""DINO/Mugs-style Vision Transformer in flax (ViT-B/14 and friends).

Architecture-equivalent to the reference's timm-style ViT
(multimodal/vision_transformer_dino_mugs.py:170-298): pre-norm blocks,
qkv_bias, GELU MLP (ratio 4), LayerNorm eps 1e-6, CLS token, learned absolute
positional embeddings with bicubic interpolation for off-grid input sizes.

TPU-first: attention runs as batched einsums that XLA tiles onto the MXU
(257 tokens x 12 heads x 64 head-dim at ViT-B scale); the backbone is frozen
in the CVCL recipe so only the forward pass matters and is wrapped in
``stop_gradient`` upstream.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, List

import flax.linen as nn
import jax
import jax.numpy as jnp


# Committed kernel-dispatch defaults (round-5 flip, measured on the 55.5%
# ViT flagship config at B=128 — BENCH_NOTES "ViT kernel-combo ladder"):
# the whole-attention-half block kernel + the fused MLP with the in-kernel
# rational erfc GELU run 2,820.5 pairs/s vs 2,016.4 for round 4's
# padseq+pairs default (+40%) at erf-faithful numerics (the rational erf's
# |Δerf| ≤ 1.5e-7 sits two decades below bf16 resolution; envelope gated
# in tests/test_ops.py and re-measured at a trained operating point by
# scripts/fidelity_trained.py). MMB_FUSED_ATTN=pairs MMB_VIT_MLP=
# restores the round-4 dispatch; =0 / =off disables kernels entirely.
_ATTN_DEFAULT = "block"
_MLP_DEFAULT = "fused"


def _attn_mode() -> str:
    import os
    return os.environ.get("MMB_FUSED_ATTN", _ATTN_DEFAULT)


def _mlp_mode() -> str:
    import os
    return os.environ.get("MMB_VIT_MLP", _MLP_DEFAULT)


def _gelu(h: jax.Array) -> jax.Array:
    """MLP activation. Default: exact erf GELU (torch ``nn.GELU``'s
    default, which the reference ViT uses). ``MMB_VIT_GELU`` selects
    cheaper opt-in forms for the frozen serving path — the B=64 device
    trace bills the erf epilogue ~0.56 ms per fc1 fusion (the fusion
    runs 2.3x its matmul floor while fc2 runs AT floor; BENCH_NOTES):
      tanh    — the tanh approximation (flax approximate=True)
      sigmoid — x * sigmoid(1.702 x), the cheapest VPU form
                (max |delta| ~1e-2 of an O(1) activation)
    """
    import os
    mode = os.environ.get("MMB_VIT_GELU", "erf")
    if mode == "tanh":
        return nn.gelu(h, approximate=True)
    if mode == "sigmoid":
        return h * jax.nn.sigmoid(1.702 * h)
    return nn.gelu(h, approximate=False)


class QuantizableDense(nn.Dense):
    """``nn.Dense`` with an opt-in int8 MXU path for FROZEN trunks.

    The parameter tree ("kernel"/"bias", f32) is identical to ``nn.Dense``
    so checkpoints are interchangeable; only the compute path changes.
    With ``int8=True`` the matmul runs via ``ops.quant.int8_dense``
    (dynamic per-tensor activation scale, per-output-channel weight
    scale, int8 ``dot_general`` that XLA lowers to the MXU's 2x int8
    rate). The quantization uses ``round`` and therefore has zero
    gradient — callers must gate on the trunk being frozen.
    """

    int8: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, ln_scale: jax.Array | None = None,
                 ln_bias: jax.Array | None = None,
                 amax_rows: int | None = None) -> jax.Array:
        kernel = self.param("kernel", self.kernel_init,
                            (x.shape[-1], self.features), self.param_dtype)
        bias = (self.param("bias", self.bias_init, (self.features,),
                           self.param_dtype) if self.use_bias else None)
        if ln_scale is not None:
            # LN-fold (frozen trunks): caller feeds the PURE normalize
            # n(x) and the preceding LayerNorm's gamma/beta fold into
            # this matmul: n(x)@(gamma*W) + (beta@W + b). Constant under
            # the frozen trunk, so XLA hoists the fold out of the step.
            k32 = kernel.astype(jnp.float32)
            kernel = ln_scale.astype(jnp.float32)[:, None] * k32
            fold_b = ln_bias.astype(jnp.float32) @ k32
            bias = fold_b if bias is None else bias + fold_b
            kernel = jax.lax.stop_gradient(kernel)
            bias = jax.lax.stop_gradient(bias)
        if self.int8:
            from multimodal_baby_tpu.ops.quant import int8_dense
            return int8_dense(x, kernel, bias,
                              out_dtype=self.dtype or x.dtype,
                              amax_rows=amax_rows)
        x, kernel, bias = nn.dtypes.promote_dtype(
            x, kernel, bias, dtype=self.dtype)
        y = jax.lax.dot_general(
            x, kernel, (((x.ndim - 1,), (0,)), ((), ())))
        if bias is not None:
            y = y + bias
        return y


class _DenseParams(nn.Module):
    """Declares ``nn.Dense``'s kernel/bias under the standard names
    without running the matmul — the qkv-folded attention kernel consumes
    them directly (param tree stays byte-identical to the Dense path, so
    checkpoints and the torch converter are unaffected)."""

    in_features: int
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (self.in_features, self.features))
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.features,)) if self.use_bias else None)
        return kernel, bias


class _AttnParams(nn.Module):
    """Declares ViTAttention's qkv/proj Dense params (same nested names)
    without running them — the whole-block attention kernel consumes
    them directly."""

    dim: int
    qkv_bias: bool = True

    @nn.compact
    def __call__(self):
        wq, bq = _DenseParams(self.dim, 3 * self.dim, self.qkv_bias,
                              name="qkv")()
        wp, bp = _DenseParams(self.dim, self.dim, True, name="proj")()
        return wq, bq, wp, bp


class _LNParams(nn.Module):
    """Declares LayerNorm's scale/bias under the standard names without
    applying them — the LN-fold path consumes them directly (param tree
    stays byte-identical to ``nn.LayerNorm``, so checkpoints and the
    torch converter are unaffected)."""

    dim: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.dim,))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        return scale, bias


def _norm_only(x: jax.Array, eps: float = 1e-6) -> jax.Array:
    """LayerNorm's normalize (f32 stats) WITHOUT gamma/beta — those are
    folded into the consumer matmul by QuantizableDense(ln_scale=...)."""
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = jnp.square(x32).mean(-1, keepdims=True) - jnp.square(mu)
    return ((x32 - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


class ViTAttention(nn.Module):
    dim: int
    num_heads: int
    qkv_bias: bool = True
    dtype: Any = None
    int8: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, return_attention: bool = False,
                 ln_scale: jax.Array | None = None,
                 ln_bias: jax.Array | None = None,
                 kv_valid: int | None = None):
        B, N, C = x.shape
        H = self.num_heads
        head_dim = C // H
        scale = head_dim ** -0.5

        import os
        from multimodal_baby_tpu.ops.attention import (
            fused_attention, fused_attention_pairs,
            fused_qkv_attention_pairs, should_fuse_attention,
            should_fuse_attention_pairs, should_fuse_qkv_attention_pairs)

        # qkv-FOLDED pairs kernel (opt-in, MMB_FUSED_ATTN=qkv): the
        # projection runs inside the kernel, so the [B, N, 3C] qkv
        # tensor never exists in HBM — the B=64 trace bills the pairs
        # kernel at its qkv-read bytes over the ~305 GB/s Mosaic DMA
        # rate, i.e. purely traffic-bound, and this removes 2/3 of its
        # input bytes plus the projection fusion's HBM write.
        if not return_attention and not self.int8 \
                and jax.devices()[0].platform == "tpu" \
                and _attn_mode() in ("3", "qkv") \
                and should_fuse_qkv_attention_pairs(N, H, head_dim):
            # same param tree as the unfused path ("qkv"/kernel, bias)
            w, b = _DenseParams(C, 3 * C, self.qkv_bias, name="qkv")()
            if ln_scale is not None:
                # LN-fold, identically to QuantizableDense(ln_scale=...)
                w32 = w.astype(jnp.float32)
                w = ln_scale.astype(jnp.float32)[:, None] * w32
                fold_b = ln_bias.astype(jnp.float32) @ w32
                b = fold_b if b is None else b + fold_b
                w = jax.lax.stop_gradient(w)
                b = jax.lax.stop_gradient(b)
            xp, w, b = nn.dtypes.promote_dtype(x, w, b, dtype=self.dtype)
            y = fused_qkv_attention_pairs(xp, w, b, H, scale, kv_valid)
            return QuantizableDense(C, name="proj", dtype=self.dtype)(
                y, amax_rows=kv_valid)

        qkv = QuantizableDense(3 * C, use_bias=self.qkv_bias, name="qkv",
                               dtype=self.dtype, int8=self.int8)(
                                   x, ln_scale=ln_scale, ln_bias=ln_bias,
                                   amax_rows=kv_valid)
        # layout-native pair-packed kernel: consumes the qkv projection's
        # own [B, N, C] lane layout (no transposes, no lane padding) and
        # keeps the [N, N] scores in VMEM — see ops/attention.py. ON by
        # default on TPU: measured 1,957 vs 1,586 pairs/s end-to-end at
        # ViT-B/14 B=256 under the default token-axis padseq (BENCH_NOTES
        # round-4). MMB_FUSED_ATTN=0 restores the XLA softmax path.
        # Any fused mode falls back to this kernel when its own shape
        # gate fails (e.g. mode "block" at a token count the whole-block
        # kernel can't tile): the stronger kernels dispatch earlier in
        # ViTBlock / above when they can, so reaching here under
        # "block"/"qkv" means only the pairs kernel remains viable.
        if not return_attention \
                and jax.devices()[0].platform == "tpu" \
                and _attn_mode() in ("2", "pairs", "3", "qkv", "block") \
                and should_fuse_attention_pairs(N, H, head_dim):
            y = fused_attention_pairs(
                qkv[:, :, :C], qkv[:, :, C:2 * C], qkv[:, :, 2 * C:],
                H, scale, kv_valid)
            return QuantizableDense(C, name="proj", dtype=self.dtype,
                                    int8=self.int8)(y, amax_rows=kv_valid)

        qkv = qkv.reshape(B, N, 3, H, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [B, N, H, d]
        # the heads-first kernel variant stays opt-in: it wins in
        # isolation (-30% on the attention op) but its operand layout
        # constraints force reshape/transpose copies through every block
        # in the full step (measured 1461 vs 1559 pairs/s end-to-end at
        # B=256) — see BENCH_NOTES.md. MMB_FUSED_ATTN=1 enables.
        if not return_attention \
                and jax.devices()[0].platform == "tpu" \
                and _attn_mode() == "1" \
                and should_fuse_attention(N, head_dim):
            # Pallas kernel: scores never leave VMEM (ops/attention.py);
            # kv_valid masks pad key columns under MMB_VIT_PADSEQ
            def heads_first(t):
                return t.transpose(0, 2, 1, 3).reshape(B * H, N, head_dim)
            y = fused_attention(heads_first(q), heads_first(k),
                                heads_first(v), scale, kv_valid)
            y = y.reshape(B, H, N, head_dim).transpose(0, 2, 1, 3)
            y = y.reshape(B, N, C)
        else:
            attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
            if kv_valid is not None and kv_valid < N:
                # tile-padded token stream (VisionTransformerDino): key
                # columns >= kv_valid are pad tokens; -1e9 underflows to
                # exp() == 0 exactly, so real-row softmax is bitwise the
                # unpadded computation
                mask = jnp.where(jnp.arange(N) < kv_valid, 0.0, -1e9)
                attn = attn + mask.astype(attn.dtype)[None, None, None, :]
            attn = jax.nn.softmax(attn, axis=-1)
            if return_attention:
                return attn
            y = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, N, C)
        return QuantizableDense(C, name="proj", dtype=self.dtype,
                                int8=self.int8)(y, amax_rows=kv_valid)


class ViTBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    dtype: Any = None
    int8: bool = False
    lnfold: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, return_attention: bool = False,
                 kv_valid: int | None = None):
        if self.lnfold and not return_attention:
            # FROZEN-trunk fast path: LayerNorms run as pure normalizes,
            # gamma/beta fold into the qkv / fc1 kernels (hoisted
            # constants). Param tree identical to the plain path.
            s1, b1 = _LNParams(self.dim, name="norm1")()
            x = x + ViTAttention(self.dim, self.num_heads, self.qkv_bias,
                                 self.dtype, int8=self.int8, name="attn")(
                                     _norm_only(x), ln_scale=s1, ln_bias=b1,
                                     kv_valid=kv_valid)
            s2, b2 = _LNParams(self.dim, name="norm2")()
            h = QuantizableDense(int(self.dim * self.mlp_ratio), name="fc1",
                                 dtype=self.dtype, int8=self.int8)(
                                     _norm_only(x), ln_scale=s2, ln_bias=b2,
                                     amax_rows=kv_valid)
            h = _gelu(h)
            h = QuantizableDense(self.dim, name="fc2", dtype=self.dtype,
                                 int8=self.int8)(h, amax_rows=kv_valid)
            return x + h
        ln = partial(nn.LayerNorm, epsilon=1e-6, dtype=self.dtype)
        if return_attention:
            return ViTAttention(self.dim, self.num_heads, self.qkv_bias,
                                self.dtype, name="attn")(
                                    ln(name="norm1")(x),
                                    return_attention=True)

        import os
        from multimodal_baby_tpu.ops.attention import (
            fused_block_attention, should_fuse_block_attention)
        head_dim = self.dim // self.num_heads

        # whole-ViT-block kernel (opt-in, MMB_VIT_BLOCK=1): BOTH halves
        # in one program — the inter-half y tensor never exists in HBM
        # (ops/vit_block.py; bit-identical to the block+fused-MLP
        # composition below).
        from multimodal_baby_tpu.ops.vit_block import (
            fused_vit_block, should_fuse_vit_block)
        if not self.int8 and jax.devices()[0].platform == "tpu" \
                and os.environ.get("MMB_VIT_BLOCK", "0") == "1" \
                and should_fuse_vit_block(x.shape[1], self.num_heads,
                                          head_dim,
                                          int(self.dim * self.mlp_ratio)):
            s1, b1 = _LNParams(self.dim, name="norm1")()
            wq, bq, wp, bp = _AttnParams(self.dim, self.qkv_bias,
                                         name="attn")()
            s2, b2 = _LNParams(self.dim, name="norm2")()
            Fh = int(self.dim * self.mlp_ratio)
            w1, bb1 = _DenseParams(self.dim, Fh, name="fc1")()
            w2, bb2 = _DenseParams(Fh, self.dim, name="fc2")()
            return fused_vit_block(
                x, s1, b1, wq, bq, wp, bp, s2, b2, w1, bb1, w2, bb2,
                self.num_heads, head_dim ** -0.5, kv_valid, 1e-6,
                os.environ.get("MMB_VIT_GELU", "erf"))

        # whole-attention-half kernel (opt-in, MMB_FUSED_ATTN=block):
        # norm1 + qkv + pair-packed attention + out-proj + residual in
        # one program — per block the only HBM traffic is reading x and
        # writing the result (ops/attention.py).
        if not self.int8 and jax.devices()[0].platform == "tpu" \
                and _attn_mode() == "block" \
                and should_fuse_block_attention(x.shape[1],
                                                self.num_heads, head_dim):
            s1, b1 = _LNParams(self.dim, name="norm1")()
            wq, bq, wp, bp = _AttnParams(self.dim, self.qkv_bias,
                                         name="attn")()
            x = fused_block_attention(x, s1, b1, wq, bq, wp, bp,
                                      self.num_heads, head_dim ** -0.5,
                                      kv_valid, 1e-6)
        else:
            y = ln(name="norm1")(x)
            x = x + ViTAttention(self.dim, self.num_heads, self.qkv_bias,
                                 self.dtype, int8=self.int8, name="attn")(
                                     y, kv_valid=kv_valid)

        from multimodal_baby_tpu.ops.vit_mlp import fused_mlp, should_fuse_mlp
        F = int(self.dim * self.mlp_ratio)
        # fused MLP kernel (opt-in, MMB_VIT_MLP=fused): norm2 + fc1 +
        # GELU + fc2 + residual in one program; the [B, N, 4C] hidden
        # tensor stays in VMEM and the GELU VPU work is chunked to
        # overlap the fc2 MXU dots (the B=64 trace bills fc1's serial
        # erf epilogue at 2.3x the matmul floor — ops/vit_mlp.py).
        if not self.int8 and jax.devices()[0].platform == "tpu" \
                and _mlp_mode() == "fused" \
                and should_fuse_mlp(x.shape[1], self.dim, F):
            s2, b2 = _LNParams(self.dim, name="norm2")()
            w1, bb1 = _DenseParams(self.dim, F, name="fc1")()
            w2, bb2 = _DenseParams(F, self.dim, name="fc2")()
            return fused_mlp(
                x, s2, b2, w1, bb1, w2, bb2, 1e-6,
                os.environ.get("MMB_VIT_GELU", "erf"))

        h = ln(name="norm2")(x)
        h = QuantizableDense(F, name="fc1",
                             dtype=self.dtype, int8=self.int8)(
                                 h, amax_rows=kv_valid)
        h = _gelu(h)
        h = QuantizableDense(self.dim, name="fc2", dtype=self.dtype,
                             int8=self.int8)(h, amax_rows=kv_valid)
        return x + h


class VisionTransformerDino(nn.Module):
    patch_size: int = 14
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    base_img_size: int = 224  # grid size the pos_embed was trained at
    dtype: Any = None  # compute dtype (params stay f32)
    # int8 MXU matmuls for the 48 block Denses (dynamic activation quant,
    # per-channel weight quant — ops/quant.int8_dense). FROZEN trunks
    # only: the quantization is non-differentiable by design. Gated in
    # VisionEncoder.setup on `not finetune_cnn` + MMB_VIT_INT8=1.
    int8: bool = False
    # LN-fold for frozen trunks (MMB_VIT_LNFOLD=1): see ViTBlock.
    lnfold: bool = False

    def setup(self):
        self.patch_proj = nn.Conv(
            self.embed_dim, (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size), padding="VALID",
            name="patch_embed", dtype=self.dtype)
        n = (self.base_img_size // self.patch_size) ** 2
        init = nn.initializers.truncated_normal(stddev=0.02, lower=-2, upper=2)
        self.cls_token = self.param("cls_token", init, (1, 1, self.embed_dim))
        self.pos_embed = self.param(
            "pos_embed", init, (1, n + 1, self.embed_dim))
        self.blocks = [
            ViTBlock(self.embed_dim, self.num_heads, self.mlp_ratio,
                     self.qkv_bias, self.dtype, int8=self.int8,
                     lnfold=self.lnfold, name=f"block{i}")
            for i in range(self.depth)]
        self.norm = nn.LayerNorm(epsilon=1e-6, name="norm",
                                 dtype=self.dtype)

    def _interpolate_pos_encoding(self, npatch: int, w: int, h: int):
        """Bicubic pos-embed interpolation for off-grid inputs
        (reference: vision_transformer_dino_mugs.py:210-230)."""
        N = self.pos_embed.shape[1] - 1
        if npatch == N and w == h:
            return self.pos_embed
        cls_pos = self.pos_embed[:, :1]
        patch_pos = self.pos_embed[:, 1:]
        dim = self.pos_embed.shape[-1]
        side = int(math.sqrt(N))
        w0, h0 = w // self.patch_size, h // self.patch_size
        patch_pos = jax.image.resize(
            patch_pos.reshape(1, side, side, dim), (1, w0, h0, dim),
            method="bicubic").reshape(1, -1, dim)
        return jnp.concatenate([cls_pos, patch_pos], axis=1)

    def prepare_tokens(self, x: jax.Array) -> jax.Array:
        """x: [B, H, W, 3] NHWC -> [B, 1 + npatch, E]."""
        B, H, W, _ = x.shape
        patches = self.patch_proj(x).reshape(B, -1, self.embed_dim)
        cls = jnp.broadcast_to(self.cls_token, (B, 1, self.embed_dim))
        tokens = jnp.concatenate([cls, patches], axis=1)
        tokens = tokens + self._interpolate_pos_encoding(
            patches.shape[1], H, W)
        # cls/pos_embed are f32 params: without this cast the residual
        # stream — and with it every LayerNorm and matmul operand — is
        # silently promoted to f32 for all 12 blocks (measured 89 ms of
        # f32 matmul fusions + 38 GB of layout copies per step at B=256)
        if self.dtype is not None:
            tokens = tokens.astype(self.dtype)
        return tokens

    def __call__(self, x: jax.Array) -> jax.Array:
        """Returns the CLS feature [B, E] after the final norm
        (reference forward: vision_transformer_dino_mugs.py:245-250)."""
        tokens = self.prepare_tokens(x)
        n_valid = tokens.shape[1]
        n_pad = self._padded_len(n_valid)
        if n_pad > n_valid:
            # 257 tokens (16x16 patches + cls) is PRIME: every [B, 257, E]
            # tensor carries a ragged sublane tile, taxing each LN /
            # elementwise / layout op in all 12 blocks (device trace:
            # 12 x 5.4 ms LN fusions, 17.5 GB "data formatting" at
            # B=256). Pad the token axis to the tile multiple and mask
            # the pad keys in attention (-1e9 bias -> exp underflows to
            # exactly 0). Real-token outputs are exact in f32 (gated at
            # 1e-5, tests/test_vision.py); in bf16 the padded reduction
            # tree rounds differently (deltas at bf16 eps, ~1e-2 on O(1)
            # features). MMB_VIT_PADSEQ: 0 = off, N = explicit length.
            tokens = jnp.pad(tokens, ((0, 0), (0, n_pad - n_valid), (0, 0)))
            kv_valid = n_valid
        else:
            kv_valid = None
        for blk in self.blocks:
            tokens = blk(tokens, kv_valid=kv_valid)
        # LayerNorm is per-token: normalize only the CLS row instead of
        # paying a full [B, N, E] pass for one row of output
        return self.norm(tokens[:, :1])[:, 0].astype(jnp.float32)

    def _padded_len(self, n: int) -> int:
        """Token-axis pad target: MMB_VIT_PADSEQ='auto' (default: round up
        to the bf16 sublane tile of 16 — measured +23% end-to-end with the
        pair-packed attention kernel at ViT-B/14 B=256, BENCH_NOTES
        round-4), 0 (off), or N (explicit target length)."""
        import os
        spec = os.environ.get("MMB_VIT_PADSEQ", "auto")
        if spec == "auto":
            return ((n + 15) // 16) * 16
        target = int(spec)
        return target if target > n else n

    def get_last_selfattention(self, x: jax.Array) -> jax.Array:
        tokens = self.prepare_tokens(x)
        for blk in self.blocks[:-1]:
            tokens = blk(tokens)
        return self.blocks[-1](tokens, return_attention=True)

    def get_intermediate_layers(self, x: jax.Array, n: int = 1
                                ) -> List[jax.Array]:
        tokens = self.prepare_tokens(x)
        out = []
        for i, blk in enumerate(self.blocks):
            tokens = blk(tokens)
            if self.depth - i <= n:
                out.append(self.norm(tokens))
        return out


def vit_base(patch_size: int = 14, dtype=None, int8: bool = False,
             lnfold: bool = False) -> VisionTransformerDino:
    return VisionTransformerDino(
        patch_size=patch_size, embed_dim=768, depth=12, num_heads=12,
        dtype=dtype, int8=int8, lnfold=lnfold)


def vit_small(patch_size: int = 16, dtype=None) -> VisionTransformerDino:
    return VisionTransformerDino(
        patch_size=patch_size, embed_dim=384, depth=12, num_heads=6,
        dtype=dtype)


def vit_large(patch_size: int = 16, dtype=None) -> VisionTransformerDino:
    return VisionTransformerDino(
        patch_size=patch_size, embed_dim=1024, depth=24, num_heads=16,
        dtype=dtype)
