"""Activation-range calibration for the int8 fused trunk.

The int8 trunk (ops/quant.py, models/vision_resnext.py) quantizes every
activation tensor with a per-tensor scale. Uncalibrated, it falls back to
a bound derived from the folded-BN statistics; this module measures the
actual ranges by running the f32/bf16 conv path over sample batches with
flax intermediate capture, and returns the "quant_scales" variable
collection to merge into the model variables.

Usage (bench.py / train/trainer.py do this automatically when int8 is
enabled):

    scales = calibrate_backbone(params_bb, stats_bb, images)
    variables = {**variables, "quant_scales":
                 {"vision_encoder": {"backbone": scales}}}
"""

from __future__ import annotations

import os
from typing import Dict

import jax
import jax.numpy as jnp

from multimodal_baby_tpu.models.vision_resnext import (
    RESNEXT50_STAGES, ResNeXt50)


def _amax(x) -> jax.Array:
    return jnp.maximum(jnp.max(x.astype(jnp.float32)), 0.0)


def calibrate_backbone(params: Dict, batch_stats: Dict,
                       images: jax.Array) -> Dict:
    """Measure activation amaxes on the conv path (no fused kernels).

    images: [B, 224, 224, 3] normalized f32. Returns the ResNeXt50
    "quant_scales" subtree: {"stem_amax": s, "layer1_0": {"h1_amax": ...,
    "h2_amax": ..., "out_amax": ...}, ...}.
    """
    module = ResNeXt50(dtype=None, dense_groups=False, fused_trunk=False)
    env = os.environ.pop("MMB_FUSED_TRUNK", None)
    try:
        _, state = module.apply(
            {"params": params, "batch_stats": batch_stats},
            images.astype(jnp.float32), train=False,
            capture_intermediates=True, mutable=["intermediates"])
    finally:
        if env is not None:
            os.environ["MMB_FUSED_TRUNK"] = env
    inter = state["intermediates"]

    def out_of(tree):
        return tree["__call__"][0]

    scales: Dict = {
        # maxpool is a spatial max of the relu'd stem, so its amax equals
        # the stem's post-relu amax
        "stem_amax": _amax(out_of(inter["bn1"])),
    }
    for stage_idx, (_, blocks, _) in enumerate(RESNEXT50_STAGES):
        for block_idx in range(blocks):
            name = f"layer{stage_idx + 1}_{block_idx}"
            b = inter[name]
            scales[name] = {
                "h1_amax": _amax(out_of(b["bn1"])),
                "h2_amax": _amax(out_of(b["bn2"])),
                # block output is already relu'd
                "out_amax": _amax(out_of(b)),
            }
    return scales


def calibrate_cvcl(variables: Dict, images: jax.Array) -> Dict:
    """Calibrate a CVCL model's trunk and return variables with the
    "quant_scales" collection merged (images: normalized f32 batch)."""
    bb_params = variables["params"]["vision_encoder"]["backbone"]
    bb_stats = variables.get("batch_stats", {}).get(
        "vision_encoder", {}).get("backbone", {})
    scales = calibrate_backbone(bb_params, bb_stats, images)
    out = dict(variables)
    qs = dict(out.get("quant_scales", {}))
    ve = dict(qs.get("vision_encoder", {}))
    ve["backbone"] = scales
    qs["vision_encoder"] = ve
    out["quant_scales"] = qs
    return out
