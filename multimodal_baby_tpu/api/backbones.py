"""Pretrained vision-backbone loading.

Parity with the reference's backbone zoo (multimodal/utils.py:145-214):
self-supervised SAYCam checkpoints published on HF hub under
``eminorhan/<name>`` with names like ``dino_sfp_resnext50`` /
``dino_sfp_vitb14`` (dino/mugs/mae x say/s/sfp x resnext50/vitb14/...),
plus the TC-ResNeXt tar. Downloads the torch state dict, strips wrapper
prefixes, and converts to our flax params/batch-stats.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

SPEC_TO_ARCH = {
    "resnext50": ("resnext50", None),
    "vitb14": ("vit_base", 14),
    "vitl16": ("vit_large", 16),
    "vitb16": ("vit_base", 16),
    "vits16": ("vit_small", 16),
}


def parse_backbone_name(model_name: str) -> Tuple[str, str, str]:
    """'dino_sfp_resnext50' -> (alg='dino', data='sfp', spec='resnext50')
    (reference: multimodal/utils.py:145-163)."""
    alg, data, spec = model_name.split("_", 2)
    assert alg in ("dino", "mugs", "mae"), f"unknown algorithm {alg}"
    assert spec in SPEC_TO_ARCH, f"unrecognized architecture {spec}"
    return alg, data, spec


def load_backbone_state_dict(model_name: str,
                             checkpoint_path: Optional[str] = None) -> Dict:
    """Fetch (HF hub 'eminorhan/<name>' or local path) and unwrap the torch
    state dict (prefix-stripped: 'module.', 'teacher.', 'backbone.')."""
    import torch

    if checkpoint_path is None:
        from huggingface_hub import hf_hub_download
        checkpoint_path = hf_hub_download(
            repo_id=f"eminorhan/{model_name}",
            filename=f"{model_name}.pth")
    ckpt = torch.load(checkpoint_path, map_location="cpu",
                      weights_only=False)
    for key in ("model_state_dict", "state_dict", "teacher", "model"):
        if isinstance(ckpt, dict) and key in ckpt:
            ckpt = ckpt[key]
    sd = {k: v for k, v in ckpt.items()}
    for prefix in ("module.", "teacher.", "backbone."):
        if any(k.startswith(prefix) for k in sd):
            sd = {(k[len(prefix):] if k.startswith(prefix) else k): v
                  for k, v in sd.items()}
    return sd


def load_backbone_params(model_name: str,
                         checkpoint_path: Optional[str] = None):
    """-> (arch, params, batch_stats) for our flax backbones."""
    from multimodal_baby_tpu.api.convert import (
        convert_resnext50, convert_vit)

    _, _, spec = parse_backbone_name(model_name)
    arch, patch = SPEC_TO_ARCH[spec]
    sd = load_backbone_state_dict(model_name, checkpoint_path)
    if arch == "resnext50":
        params, stats = convert_resnext50(sd)
        return "resnext50", params, stats
    depth = {"vit_base": 12, "vit_small": 12, "vit_large": 24}[arch]
    return arch, convert_vit(sd, depth=depth), {}
