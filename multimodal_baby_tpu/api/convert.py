"""torch checkpoint -> flax param-tree converters.

Bridges the reference ecosystem into this framework:

- pretrained backbones (TC-ResNeXt, DINO-SAYCam ResNeXt / ViT-B/14 from HF
  hub — reference loaders: multimodal/utils.py:145-214),
- full CVCL Lightning checkpoints (reference: multimodal_lit.py:133-149),

producing parameter/batch-stat pytrees for our NHWC flax modules. Also used
by the test suite as the numerical-parity bridge: random torch modules are
converted and outputs compared elementwise.

All functions take plain ``state_dict``-style {name: np.ndarray} mappings, so
torch is only required by the callers that actually read .ckpt files.
"""

from __future__ import annotations

from typing import Dict, Mapping, Tuple

import numpy as np


Array = np.ndarray
StateDict = Mapping[str, Array]


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def _conv_kernel(w: Array) -> Array:
    """torch OIHW -> flax HWIO (also correct for grouped convs)."""
    return _np(w).transpose(2, 3, 1, 0)


def _linear(sd: StateDict, prefix: str) -> Dict[str, Array]:
    out = {"kernel": _np(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _bn(sd: StateDict, prefix: str) -> Tuple[Dict, Dict]:
    params = {"scale": _np(sd[f"{prefix}.weight"]),
              "bias": _np(sd[f"{prefix}.bias"])}
    stats = {"mean": _np(sd[f"{prefix}.running_mean"]),
             "var": _np(sd[f"{prefix}.running_var"])}
    return params, stats


def _ln(sd: StateDict, prefix: str) -> Dict[str, Array]:
    return {"scale": _np(sd[f"{prefix}.weight"]),
            "bias": _np(sd[f"{prefix}.bias"])}


# ---------------------------------------------------------------------------
# ResNeXt-50 trunk (torchvision resnext50_32x4d layout)
# ---------------------------------------------------------------------------

RESNEXT_BLOCKS = {1: 3, 2: 4, 3: 6, 4: 3}


def convert_resnext50(sd: StateDict, prefix: str = ""
                      ) -> Tuple[Dict, Dict]:
    """-> (params, batch_stats) for models.vision_resnext.ResNeXt50."""
    p = prefix
    params: Dict = {"conv1": {"kernel": _conv_kernel(sd[f"{p}conv1.weight"])}}
    stats: Dict = {}
    params["bn1"], stats["bn1"] = _bn(sd, f"{p}bn1")

    for stage, n_blocks in RESNEXT_BLOCKS.items():
        for b in range(n_blocks):
            tp = f"{p}layer{stage}.{b}"
            name = f"layer{stage}_{b}"
            bp: Dict = {}
            bs: Dict = {}
            for i in (1, 2, 3):
                bp[f"conv{i}"] = {
                    "kernel": _conv_kernel(sd[f"{tp}.conv{i}.weight"])}
                bp[f"bn{i}"], bs[f"bn{i}"] = _bn(sd, f"{tp}.bn{i}")
            if f"{tp}.downsample.0.weight" in sd:
                bp["downsample_conv"] = {
                    "kernel": _conv_kernel(sd[f"{tp}.downsample.0.weight"])}
                bp["downsample_bn"], bs["downsample_bn"] = _bn(
                    sd, f"{tp}.downsample.1")
            params[name] = bp
            stats[name] = bs
    return params, stats


# ---------------------------------------------------------------------------
# DINO ViT (vision_transformer_dino_mugs layout)
# ---------------------------------------------------------------------------

def convert_vit(sd: StateDict, prefix: str = "", depth: int = 12) -> Dict:
    """-> params for models.vision_vit.VisionTransformerDino."""
    p = prefix
    params: Dict = {
        "cls_token": _np(sd[f"{p}cls_token"]),
        "pos_embed": _np(sd[f"{p}pos_embed"]),
        "patch_embed": {
            "kernel": _conv_kernel(sd[f"{p}patch_embed.proj.weight"]),
            "bias": _np(sd[f"{p}patch_embed.proj.bias"]),
        },
        "norm": _ln(sd, f"{p}norm"),
    }
    for i in range(depth):
        bp = f"{p}blocks.{i}"
        params[f"block{i}"] = {
            "norm1": _ln(sd, f"{bp}.norm1"),
            "norm2": _ln(sd, f"{bp}.norm2"),
            "attn": {
                "qkv": _linear(sd, f"{bp}.attn.qkv"),
                "proj": _linear(sd, f"{bp}.attn.proj"),
            },
            "fc1": _linear(sd, f"{bp}.mlp.fc1"),
            "fc2": _linear(sd, f"{bp}.mlp.fc2"),
        }
    return params


# ---------------------------------------------------------------------------
# Text encoder
# ---------------------------------------------------------------------------

def _lstm_dir(sd: StateDict, prefix: str, suffix: str = "") -> Dict:
    return {
        "weight_ih": _np(sd[f"{prefix}.weight_ih_l0{suffix}"]).T,
        "weight_hh": _np(sd[f"{prefix}.weight_hh_l0{suffix}"]).T,
        "bias_ih": _np(sd[f"{prefix}.bias_ih_l0{suffix}"]),
        "bias_hh": _np(sd[f"{prefix}.bias_hh_l0{suffix}"]),
    }


def convert_text_encoder(sd: StateDict, arch: str, prefix: str = "") -> Dict:
    """-> params for models.text.TextEncoder.

    ``prefix`` is where the reference TextEncoder lives in the state dict
    (e.g. "text_encoder." inside a Lightning checkpoint).
    """
    p = prefix
    params: Dict = {
        "token_embedding": _np(sd[f"{p}embedding.weight"]),
    }
    if arch in ("lstm", "bilstm"):
        params["lstm_fwd"] = _lstm_dir(sd, f"{p}lstm")
        if arch == "bilstm":
            params["lstm_bwd"] = _lstm_dir(sd, f"{p}lstm", "_reverse")
    elif arch == "transformer":
        lp = f"{p}transformer_encoder.layers.0"
        params["transformer_layer"] = {
            "in_proj_weight": _np(sd[f"{lp}.self_attn.in_proj_weight"]).T,
            "in_proj_bias": _np(sd[f"{lp}.self_attn.in_proj_bias"]),
            "out_proj": _linear(sd, f"{lp}.self_attn.out_proj"),
            "linear1": _linear(sd, f"{lp}.linear1"),
            "linear2": _linear(sd, f"{lp}.linear2"),
            "norm1": _ln(sd, f"{lp}.norm1"),
            "norm2": _ln(sd, f"{lp}.norm2"),
        }
        if f"{p}pos_embed" in sd:
            # learned positional embedding, reference layout [L, 1, E]
            params["pos_embed"] = _np(sd[f"{p}pos_embed"]).squeeze(1)
    if f"{p}connector.weight" in sd:
        params["connector"] = _linear(sd, f"{p}connector")
    if f"{p}attention.encoder_projection.weight" in sd:
        params["attention"] = {
            "encoder_projection": _linear(sd, f"{p}attention.encoder_projection"),
            "decoder_projection": _linear(sd, f"{p}attention.decoder_projection"),
            "attn_layer": _linear(sd, f"{p}attention.attn_layer"),
        }
    if f"{p}attention_gate_projection.weight" in sd:
        params["attention_gate_projection"] = _linear(
            sd, f"{p}attention_gate_projection")
    return params


# ---------------------------------------------------------------------------
# Full CVCL Lightning checkpoint
# ---------------------------------------------------------------------------

def convert_cvcl_checkpoint(
    sd: StateDict,
    text_arch: str,
    embedding_type: str = "flat",
    vit: bool = False,
    tie: bool = True,
    bias: bool = True,
) -> Tuple[Dict, Dict]:
    """Convert a full reference MultiModalLitModel state dict
    (keys: vision_encoder.model.*, text_encoder.*, model.*, language_model.*)
    -> (params, batch_stats) for models.multimodal.CVCL.
    """
    params: Dict = {}
    batch_stats: Dict = {}

    # --- vision ---
    vp = "vision_encoder.model."
    vis: Dict = {}
    vis_stats: Dict = {}
    if vit:
        vis["backbone"] = convert_vit(sd, vp)
        vis["head"] = _linear(sd, f"{vp}head")
    else:
        if f"{vp}conv1.weight" in sd:
            trunk_sd, trunk_prefix = sd, vp
        else:
            # spatial variant: the reference wraps the trunk in a
            # Sequential (multimodal.py:182-185), renaming children to
            # indices: 0=conv1, 1=bn1, 4..7=layer1..4, 8=1x1 head conv
            index_to_name = {"0": "conv1", "1": "bn1", "4": "layer1",
                             "5": "layer2", "6": "layer3", "7": "layer4"}
            trunk_sd = {}
            for k, v in sd.items():
                if not k.startswith(vp):
                    continue
                rest = k[len(vp):]
                head_idx, _, tail = rest.partition(".")
                if head_idx in index_to_name:
                    trunk_sd[f"{index_to_name[head_idx]}.{tail}"] = v
            trunk_prefix = ""
            if f"{vp}8.weight" in sd:
                # spatial head: Conv2d(2048, E, 1) -> TorchLinear on the
                # channels-last feature map
                vis["head"] = {
                    "kernel": _np(sd[f"{vp}8.weight"])[:, :, 0, 0].T,
                    "bias": _np(sd[f"{vp}8.bias"]),
                }
        backbone, bstats = convert_resnext50(trunk_sd, trunk_prefix)
        vis["backbone"] = backbone
        vis_stats["backbone"] = bstats
        if f"{vp}fc.weight" in sd:
            vis["head"] = _linear(sd, f"{vp}fc")
    params["vision_encoder"] = vis
    if vis_stats:
        batch_stats["vision_encoder"] = vis_stats

    # --- text ---
    params["text_encoder"] = convert_text_encoder(
        sd, text_arch, "text_encoder.")

    # --- temperature ---
    key = "model.logit_neg_log_temperature"
    if key in sd:
        params["logit_neg_log_temperature"] = _np(sd[key])

    # --- LM head ---
    lm_key = "language_model.output_layer"
    if not tie and f"{lm_key}.weight" in sd:
        params["lm_kernel"] = _np(sd[f"{lm_key}.weight"]).T
    if bias and f"{lm_key}.bias" in sd:
        params["lm_bias"] = _np(sd[f"{lm_key}.bias"])

    return params, batch_stats


def strip_prefix(sd: StateDict, prefix: str) -> Dict[str, Array]:
    """Drop a leading prefix from all keys (e.g. "module." from DataParallel
    checkpoints, reference: multimodal/multimodal.py:168-171)."""
    n = len(prefix)
    return {k[n:]: v for k, v in sd.items() if k.startswith(prefix)}
