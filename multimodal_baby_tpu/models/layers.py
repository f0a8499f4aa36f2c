"""Shared neural layers, designed TPU-first.

Notable departures from the torch reference:

- Variable-length text uses *masked ``lax.scan``* instead of PackedSequence
  (which has no XLA equivalent): every call is a fixed-shape jit over
  ``MAX_LEN_UTTERANCE`` steps and padding is handled by select/mask, so the
  whole encoder fuses into one compiled program
  (reference pack/pad dance: multimodal/multimodal.py:522-538).
- The LSTM input projection for all timesteps is hoisted into one big
  ``[B, L, 4H]`` matmul (MXU-friendly); only the ``h @ W_hh`` recurrence is
  sequential.
- Parameter layout matches torch conventions (gate order i,f,g,o; separate
  b_ih/b_hh) so reference checkpoints convert losslessly.
"""

from __future__ import annotations

import math
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from multimodal_baby_tpu.core.constants import PAD_TOKEN_ID


class TorchLinear(nn.Module):
    """Dense layer with explicit dims and torch ``nn.Linear`` default init
    (U(-k, k), k = 1/sqrt(fan_in) for both weight and bias).

    Parameters are plain attributes after setup, so parents can read the raw
    arrays (``.kernel``/``.bias``) and use them functionally inside
    ``lax.scan`` bodies where lazily-initialized modules can't be called.
    """

    in_dim: int
    out_dim: int
    use_bias: bool = True

    def setup(self):
        k = 1.0 / math.sqrt(self.in_dim)

        def uinit(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -k, k)

        self.kernel = self.param("kernel", uinit, (self.in_dim, self.out_dim))
        self.bias = (self.param("bias", uinit, (self.out_dim,))
                     if self.use_bias else None)

    def __call__(self, x: jax.Array) -> jax.Array:
        y = x @ self.kernel
        if self.bias is not None:
            y = y + self.bias
        return y


def padding_safe_embed(table: jax.Array, ids: jax.Array) -> jax.Array:
    """Embedding lookup reproducing ``nn.Embedding(padding_idx=0)``.

    torch zero-inits the PAD row and blocks gradients from *lookups* of it
    (but not from weight tying). We reproduce that exactly: lookups read a
    copy of the table whose PAD row has stopped gradients, while the raw
    table (used by a tied LM head) keeps full gradients.
    (reference: multimodal/multimodal.py:311-312)
    """
    table = jnp.asarray(table)
    lookup = table.at[PAD_TOKEN_ID].set(
        jax.lax.stop_gradient(table[PAD_TOKEN_ID]))
    return jnp.take(lookup, ids, axis=0)


class LockedDropout(nn.Module):
    """Variational dropout: one mask shared across the time dimension
    (reference: multimodal/multimodal.py:46-53)."""

    @nn.compact
    def __call__(self, x, rate: float, deterministic: bool, dim: int = 1):
        if deterministic or rate == 0.0:
            return x
        shape = x.shape[:dim] + (1,) + x.shape[dim + 1:]
        rng = self.make_rng("dropout")
        keep = jax.random.bernoulli(rng, 1.0 - rate, shape)
        return jnp.where(keep, x / (1.0 - rate), 0.0)


def length_mask(x_len: jax.Array, max_len: int) -> jax.Array:
    """[B, L] boolean mask of valid positions."""
    pos = jnp.arange(max_len)[None, :]
    return pos < x_len[:, None]


# ---------------------------------------------------------------------------
# LSTM (masked scan; torch-compatible parameters)
# ---------------------------------------------------------------------------

class LSTMCellParams(nn.Module):
    """Holds torch-layout LSTM parameters for one direction.

    weight_ih: [input_dim, 4H] (transposed vs torch's [4H, input]),
    weight_hh: [H, 4H], bias_ih/bias_hh: [4H]. Gate order i, f, g, o.
    """

    input_dim: int
    hidden_dim: int

    def setup(self):
        h = self.hidden_dim
        k = 1.0 / math.sqrt(h)
        init = nn.initializers.uniform(scale=2 * k)  # U(0, 2k); shift below

        def uinit(key, shape, dtype=jnp.float32):
            return init(key, shape, dtype) - k  # U(-k, k), torch default

        self.weight_ih = self.param("weight_ih", uinit, (self.input_dim, 4 * h))
        self.weight_hh = self.param("weight_hh", uinit, (h, 4 * h))
        self.bias_ih = self.param("bias_ih", uinit, (4 * h,))
        self.bias_hh = self.param("bias_hh", uinit, (4 * h,))

    def __call__(self):  # pragma: no cover - parameters only
        raise NotImplementedError


def lstm_gates(pre: jax.Array, h_dim: int) -> Tuple[jax.Array, ...]:
    i, f, g, o = jnp.split(pre, 4, axis=-1)
    return (jax.nn.sigmoid(i), jax.nn.sigmoid(f), jnp.tanh(g),
            jax.nn.sigmoid(o))


# Minimum sequence length at which the Pallas recurrence kernel beats the
# XLA scan. Measured on v5e (BENCH_NOTES.md scorecard): at CVCL scale
# (L=25, H=512) the scan is ~45% FASTER — 25 steps are too few to
# amortize the kernel's per-grid-step overhead — so the kernel is a
# LONG-SEQUENCE kernel and dispatch is length-based, not env-gated.
FUSED_LSTM_MIN_LEN = 64


def _use_fused_lstm(x_proj_shape, h_dim: int) -> bool:
    """Dispatch to the Pallas recurrence kernel on TPU for long sequences
    whose per-step working set fits VMEM (~16 MB/core). MMB_FUSED_LSTM=1/0
    force-overrides for benchmarking."""
    import os
    force = os.environ.get("MMB_FUSED_LSTM")
    if force is not None:
        if force != "1":
            return False
    try:
        if jax.devices()[0].platform != "tpu":
            return False
    except RuntimeError:
        return False
    B, L, h4 = x_proj_shape
    if force is None and L < FUSED_LSTM_MIN_LEN:
        return False
    # x block + out block + 2 carries + W_hh, all f32
    working = (B * h4 + B * h_dim * 3 + h_dim * h4) * 4
    return working < 12 * 1024 * 1024 and B % 8 == 0 and h_dim % 128 == 0


def lstm_scan(
    weight_ih: jax.Array,
    weight_hh: jax.Array,
    bias_ih: jax.Array,
    bias_hh: jax.Array,
    x: jax.Array,          # [B, L, input_dim]
    mask: jax.Array,       # [B, L] bool — True at valid steps
    h0: jax.Array,         # [B, H]
    c0: jax.Array,         # [B, H]
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Run a masked LSTM over the full padded window.

    Returns (outputs [B, L, H], h_last [B, H], c_last [B, H]) where outputs
    are zero at padded steps and h_last/c_last are the states at each
    sequence's final *valid* step — the packed-sequence semantics of the
    reference (multimodal/multimodal.py:533-552) without packing.
    """
    h_dim = h0.shape[-1]
    # hoist the input projection out of the recurrence: one MXU matmul
    x_proj = jnp.einsum("ble,eh->blh", x, weight_ih) + bias_ih + bias_hh

    if _use_fused_lstm(x_proj.shape, h_dim):
        # Pallas kernel: recurrence carries stay in VMEM (ops/lstm.py)
        from multimodal_baby_tpu.ops.lstm import lstm_fused
        out_tm, h_last, c_last = lstm_fused(
            jnp.swapaxes(x_proj, 0, 1).astype(jnp.float32),
            jnp.swapaxes(mask, 0, 1).astype(jnp.float32),
            weight_hh.astype(jnp.float32),
            h0.astype(jnp.float32), c0.astype(jnp.float32))
        return jnp.swapaxes(out_tm, 0, 1), h_last, c_last

    def step(carry, inp):
        h, c = carry
        xp_t, m_t = inp  # [B, 4H], [B]
        pre = xp_t + h @ weight_hh
        i, f, g, o = lstm_gates(pre, h_dim)
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        m = m_t[:, None]
        h = jnp.where(m, h_new, h)
        c = jnp.where(m, c_new, c)
        out = jnp.where(m, h_new, 0.0)
        return (h, c), out

    (h_last, c_last), outputs = jax.lax.scan(
        step, (h0, c0),
        (jnp.swapaxes(x_proj, 0, 1), jnp.swapaxes(mask, 0, 1)))
    return jnp.swapaxes(outputs, 0, 1), h_last, c_last


def reverse_padded(x: jax.Array, x_len: jax.Array) -> jax.Array:
    """Reverse each sequence within its valid length, keeping padding at the
    end. Used for the backward direction of the biLSTM."""
    L = x.shape[1]
    pos = jnp.arange(L)[None, :]
    idx = jnp.clip(x_len[:, None] - 1 - pos, 0, L - 1)
    return jnp.take_along_axis(
        x, idx.reshape(idx.shape + (1,) * (x.ndim - 2)), axis=1)


def lstm_step(
    weight_ih: jax.Array, weight_hh: jax.Array,
    bias_ih: jax.Array, bias_hh: jax.Array,
    x_t: jax.Array, h: jax.Array, c: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """Single LSTM step (decoding / beam search)."""
    pre = x_t @ weight_ih + bias_ih + bias_hh + h @ weight_hh
    i, f, g, o = lstm_gates(pre, h.shape[-1])
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


# ---------------------------------------------------------------------------
# Transformer encoder layer (torch nn.TransformerEncoderLayer-compatible)
# ---------------------------------------------------------------------------

class TorchTransformerEncoderLayer(nn.Module):
    """Post-norm transformer encoder layer with the exact structure of
    ``torch.nn.TransformerEncoderLayer(d_model, nhead)`` defaults
    (dim_feedforward=2048, dropout=0.1, relu, norm_first=False), as used by
    the reference text encoder (multimodal/multimodal.py:321-322).

    Parameter names mirror torch for checkpoint conversion:
    in_proj (packed qkv), out_proj, linear1, linear2, norm1, norm2.
    """

    d_model: int
    nhead: int = 8
    dim_feedforward: int = 2048
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: jax.Array, key_padding_mask: jax.Array,
                 deterministic: bool = True) -> jax.Array:
        # x: [B, L, E]; key_padding_mask: [B, L] True where PAD (masked out)
        E, H = self.d_model, self.nhead
        head_dim = E // H
        B, L, _ = x.shape

        in_proj_w = self.param(
            "in_proj_weight", nn.initializers.xavier_uniform(), (E, 3 * E))
        in_proj_b = self.param(
            "in_proj_bias", nn.initializers.zeros, (3 * E,))
        qkv = x @ in_proj_w + in_proj_b
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split_heads(t):
            return t.reshape(B, L, H, head_dim).transpose(0, 2, 1, 3)

        q, k, v = split_heads(q), split_heads(k), split_heads(v)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(head_dim)
        neg = jnp.finfo(scores.dtype).min
        scores = jnp.where(key_padding_mask[:, None, None, :], neg, scores)
        attn = jax.nn.softmax(scores, axis=-1)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, L, E)
        ctx = nn.Dense(E, name="out_proj")(ctx)
        ctx = nn.Dropout(self.dropout)(ctx, deterministic=deterministic)

        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x + ctx)

        ff = nn.Dense(self.dim_feedforward, name="linear1")(x)
        ff = nn.relu(ff)
        ff = nn.Dropout(self.dropout)(ff, deterministic=deterministic)
        ff = nn.Dense(E, name="linear2")(ff)
        ff = nn.Dropout(self.dropout)(ff, deterministic=deterministic)

        return nn.LayerNorm(epsilon=1e-5, name="norm2")(x + ff)


def sinusoidal_pos_embed(max_len: int, dim: int) -> jnp.ndarray:
    """Sinusoidal positional embeddings [max_len, dim]
    (reference: multimodal/multimodal.py:325-336)."""
    position = jnp.arange(max_len)[:, None].astype(jnp.float32)
    div_term = jnp.exp(
        jnp.arange(0, dim, 2).astype(jnp.float32)
        * -(math.log(10000.0) / dim))
    pe = jnp.zeros((max_len, dim), jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(position * div_term))
    pe = pe.at[:, 1::2].set(jnp.cos(position * div_term))
    return pe
