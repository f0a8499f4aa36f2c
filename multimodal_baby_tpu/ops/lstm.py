"""Fused LSTM recurrence as a Pallas TPU kernel.

The input projection (all timesteps at once, one big MXU matmul) stays in
XLA; this kernel fuses the *sequential* part — 25 small ``h @ W_hh``
matmuls + gate math + length masking — into one launch. The hidden/cell
carries and W_hh live in VMEM scratch across the sequential grid (TPU grid
programs execute in order), so the recurrence never round-trips HBM, unlike
a ``lax.scan`` whose carries are loop-carried HBM buffers.

Layout is time-major ([L, B, .]) to make each grid step a contiguous block.

Backward: ``lstm_fused`` carries a custom VJP whose backward replays the
jax-native masked scan (models.layers.lstm_scan) and differentiates it —
rematerialized backward, numerically identical to training on the scan.

Status: LIBRARY KERNEL for long-context configs. At CVCL's max sequence
length (25, core/constants.MAX_LEN_UTTERANCE) the XLA scan is ~45% faster
(BENCH_NOTES.md scorecard) — too few steps to amortize the per-grid-step
overhead — so the auto-dispatch (models/layers.FUSED_LSTM_MIN_LEN = 64)
never fires on any reference recipe. It is kept, oracle-tested, for
future configs with longer windows (e.g. COCO captions without the
25-token truncation) and is force-selectable with MMB_FUSED_LSTM=1.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


def _lstm_kernel(xp_ref, mask_ref, whh_ref, h0_ref, c0_ref,
                 out_ref, hlast_ref, clast_ref, h_scr, c_scr):
    l = pl.program_id(0)
    L = pl.num_programs(0)
    H = h_scr.shape[-1]

    @pl.when(l == 0)
    def _():
        h_scr[:] = h0_ref[:]
        c_scr[:] = c0_ref[:]

    h = h_scr[:]
    c = c_scr[:]
    # W_hh arrives via a constant-index BlockSpec: Mosaic keeps the block
    # resident across the sequential grid (an explicit VMEM scratch copy
    # pushes the budget 2 KB over the 16 MB scoped limit at B=256/H=512)
    pre = xp_ref[0] + jnp.dot(h, whh_ref[:],
                              preferred_element_type=jnp.float32)
    i = jax.nn.sigmoid(pre[:, :H])
    f = jax.nn.sigmoid(pre[:, H:2 * H])
    g = jnp.tanh(pre[:, 2 * H:3 * H])
    o = jax.nn.sigmoid(pre[:, 3 * H:])
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)

    m = mask_ref[0, 0][:, None]  # [B, 1] float 0/1
    h_scr[:] = m * h_new + (1.0 - m) * h
    c_scr[:] = m * c_new + (1.0 - m) * c
    out_ref[0] = m * h_new

    @pl.when(l == L - 1)
    def _():
        hlast_ref[:] = h_scr[:]
        clast_ref[:] = c_scr[:]


def _pallas_forward(x_proj_tm, mask_tm, w_hh, h0, c0):
    """x_proj_tm: [L, B, 4H] f32 (input projection + biases already added),
    mask_tm: [L, B] f32; returns (outputs [L, B, H], h_last, c_last)."""
    L, B, H4 = x_proj_tm.shape
    H = H4 // 4
    # mask rides as [L, 1, B] so its block's trailing dims satisfy the TPU
    # (8, 128) tiling rule
    mask_tm = mask_tm.reshape(L, 1, B)
    out, h_last, c_last = pl.pallas_call(
        _lstm_kernel,
        grid=(L,),
        in_specs=[
            pl.BlockSpec((1, B, H4), lambda l: (l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, B), lambda l: (l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H4), lambda l: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda l: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda l: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, B, H), lambda l: (l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda l: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda l: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((L, B, H), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * L * B * H * H4, transcendentals=5 * L * B * H,
            bytes_accessed=(L * B * H4 + L * B * H + H * H4) * 4),
        interpret=_interpret(),
    )(x_proj_tm, mask_tm, w_hh, h0, c0)
    return out, h_last, c_last


def _scan_reference(x_proj_tm, mask_tm, w_hh, h0, c0):
    """The jax-native masked scan with identical semantics (used for the
    rematerialized backward)."""
    H = h0.shape[-1]

    def step(carry, inp):
        h, c = carry
        xp_t, m_t = inp
        pre = xp_t + h @ w_hh
        i = jax.nn.sigmoid(pre[:, :H])
        f = jax.nn.sigmoid(pre[:, H:2 * H])
        g = jnp.tanh(pre[:, 2 * H:3 * H])
        o = jax.nn.sigmoid(pre[:, 3 * H:])
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        m = m_t[:, None]
        h = m * h_new + (1.0 - m) * h
        c = m * c_new + (1.0 - m) * c
        return (h, c), m * h_new

    (h_last, c_last), out = jax.lax.scan(step, (h0, c0),
                                         (x_proj_tm, mask_tm))
    return out, h_last, c_last


@jax.custom_vjp
def lstm_fused(x_proj_tm, mask_tm, w_hh, h0, c0):
    return _pallas_forward(x_proj_tm, mask_tm, w_hh, h0, c0)


def _fwd(x_proj_tm, mask_tm, w_hh, h0, c0):
    out = _pallas_forward(x_proj_tm, mask_tm, w_hh, h0, c0)
    return out, (x_proj_tm, mask_tm, w_hh, h0, c0)


def _bwd(residuals, cotangents):
    x_proj_tm, mask_tm, w_hh, h0, c0 = residuals
    _, vjp = jax.vjp(
        lambda xp, w, h, c: _scan_reference(xp, mask_tm, w, h, c),
        x_proj_tm, w_hh, h0, c0)
    dxp, dw, dh0, dc0 = vjp(cotangents)
    return dxp, None, dw, dh0, dc0


lstm_fused.defvjp(_fwd, _bwd)
