"""Typed configuration for the whole framework.

The field set is the parity contract with the reference's distributed-argparse
flag registry (SURVEY.md section 5.6): every ``add_to_argparse`` flag of
VisionEncoder (multimodal/multimodal.py:74-86), TextEncoder (:366-389),
MultiModalModel (:717-730), LanguageModel (:838-843), MultiModalLitModel
(multimodal/multimodal_lit.py:76-110) and MultiModalDataModule
(multimodal/multimodal_data_module.py:282-311) appears here as a typed field
with the same default. TPU-specific fields (mesh, precision, global batch)
live in :class:`ParallelConfig`.

Configs are plain dataclasses so they serialize to/from JSON (used for
checkpoint-embedded hyperparameters, mirroring Lightning's
``save_hyperparameters``).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Optional, Tuple


def _asdict(cfg) -> dict:
    return dataclasses.asdict(cfg)


@dataclass
class VisionConfig:
    """Vision-encoder options (reference: multimodal/multimodal.py:74-86)."""

    # which backbone: "resnext50" (torchvision resnext50_32x4d-compatible) or
    # "vit_b14" (DINO ViT-B/14-compatible). The reference selects these with
    # the cnn_dino / vit_dino booleans; we keep those too for flag parity.
    pretrained_cnn: bool = True
    cnn_model: str = "resnext50"
    cnn_dino: bool = False
    vit_dino: bool = False
    finetune_cnn: bool = False
    # frozen-CNN BatchNorm mode during training: "batch" reproduces the
    # reference quirk (frozen CNN left in train() mode -> batch statistics,
    # SURVEY.md section 7.3); "running" uses the running averages — ~25%
    # faster on TPU (no stat reductions) and the more principled choice for
    # a frozen trunk. Eval always uses running averages.
    frozen_bn: str = "batch"
    # int8-quantized fused trunk (TPU, frozen trunks only; ops/quant.py).
    # True = whole trunk; a 4-tuple of bools (or "0,0,1,1" string) picks
    # per stage — int8 must form a contiguous suffix. The measured-best
    # v5e plan is (0, 0, 1, 1): int8 wins on the weight/MXU-bound layers
    # 3-4, not on the activation-DMA-bound layers 1-2
    # (scripts/perf_hwbc_int8.py). Requires calibration for best fidelity
    # (models/quant_calib.py); off by default — enable explicitly or via
    # MMB_TRUNK_INT8 after checking feature parity for your checkpoint.
    trunk_int8: Any = False

    @property
    def backbone(self) -> str:
        if self.cnn_model == "toy":
            return "toy"
        return "vit_b14" if self.vit_dino else "resnext50"

    @property
    def last_out_dim(self) -> int:
        """Feature dim of the backbone trunk (multimodal.py:116-126).
        "toy" is a tiny conv net for tests / multi-chip dry-runs."""
        if self.cnn_model == "toy":
            return 32
        return 768 if self.vit_dino else 2048


@dataclass
class TextConfig:
    """Text-encoder options (reference: multimodal/multimodal.py:366-389)."""

    text_encoder: str = "embedding"  # embedding|cbow|lstm|bilstm|transformer
    captioning: bool = False
    attention: bool = False
    attention_activation: str = "relu"  # relu|tanh
    attention_gate: bool = False
    crange: int = 1  # cbow context window half-width
    dropout_i: float = 0.0  # input (locked) dropout
    dropout_o: float = 0.0  # output dropout
    pos_embed_type: str = "no_pos_embed"  # no_pos_embed|sinusoidal|learned

    @property
    def regressional(self) -> bool:
        # only the unidirectional LSTM is a left-to-right model
        # (multimodal.py:654-656)
        return self.text_encoder == "lstm"


@dataclass
class ModelConfig:
    """Dual-encoder head options (reference: multimodal/multimodal.py:717-730
    + LanguageModel :838-843)."""

    vision: VisionConfig = field(default_factory=VisionConfig)
    text: TextConfig = field(default_factory=TextConfig)

    embedding_type: str = "flat"  # flat|spatial
    embedding_dim: int = 128
    normalize_features: bool = False
    sim: str = "max"  # mean|max (spatial similarity aggregation)
    temperature: float = 0.07
    fix_temperature: bool = False

    # language-model head
    tie: bool = True  # tie output layer weight to the input embedding
    bias: bool = True  # output-layer bias

    vocab_size: int = 2350  # default SAYCam vocab size (freq>=3 + 4 special)


@dataclass
class TrainConfig:
    """Optimization + loss mixing (reference: multimodal_lit.py:76-110)."""

    optimizer: str = "AdamW"
    lr: float = 3e-4
    lr_scheduler: bool = False  # ReduceLROnPlateau-equivalent on val_loss
    factor: float = 0.1
    patience: int = 20
    weight_decay: float = 0.01
    lambda_mm: float = 1.0
    lambda_lm: float = 0.0
    lambda_ar: float = 0.0
    optimize_unused: bool = False
    eval_textgen: bool = False
    beam_width: int = 3
    decode_length: int = 25
    length_penalty_alpha: float = 0.0

    # trainer-level (reference exposes these through pl.Trainer flags)
    max_epochs: int = 100
    seed: int = 0
    val_every_n_epochs: int = 1
    checkpoint_dir: str = "checkpoints"
    save_top_k: int = 1
    resume_ckpt: Optional[str] = None  # "last" resolves to <dir>/last
    log_every_n_steps: int = 50
    logger: str = "jsonl"  # jsonl|wandb|none


@dataclass
class DataConfig:
    """Data module options (reference: multimodal_data_module.py:282-311 +
    saycam module :178-211)."""

    dataset: str = "saycam"  # saycam|coco|synthetic
    data_dir: str = "data"
    batch_size: int = 4
    drop_last: bool = False
    val_batch_size: int = 16
    num_workers: int = 4
    augment_frames: bool = False
    eval_include_sos_eos: bool = False
    test_while_val: bool = False
    eval_type: str = "image"  # image|text
    eval_metadata_filename: str = "eval_filtered_dev.json"
    clip_eval: bool = False
    # saycam-specific
    multiple_frames: bool = False  # sample a random frame per utterance
    shuffle_utterances: bool = False  # ablation: break image-text pairing
    # raw-input staging for prepare_data (the L1 ETL; reference:
    # multimodal_saycam_data_module.py:159-176). All optional — steps
    # whose inputs are absent are skipped (idempotent, resumable).
    transcript_dir: Optional[str] = None
    video_dir: Optional[str] = None
    labeled_s_dir: Optional[str] = None
    transcript_links_csv: Optional[str] = None
    # synthetic dataset (for benchmarks / tests)
    synthetic_size: int = 1024


@dataclass
class ParallelConfig:
    """TPU-native scaling knobs — new capability, no reference counterpart
    (SURVEY.md section 2.4). The mesh is (data, model): batch rides the data
    axis (gradient psum over ICI), vocab-/feature-sharded layers ride the
    model axis."""

    # mesh shape as (data, model); (-1, 1) means "all devices data-parallel"
    mesh_shape: Tuple[int, int] = (-1, 1)
    # all-gather embeddings across the data axis so the InfoNCE negative pool
    # is the global batch (BASELINE.json north star)
    global_batch_negatives: bool = True
    # precision policy: params f32, compute bf16 (MXU-native), logits f32
    compute_dtype: str = "bfloat16"
    param_dtype: str = "float32"
    # force full f32 (bitwise-comparable eval vs the torch reference)
    f32_eval: bool = False
    remat_vision: bool = False  # jax.checkpoint the vision trunk


@dataclass
class ExperimentConfig:
    model: ModelConfig = field(default_factory=ModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)
    exp_name: str = "default"

    # ---- serialization (checkpoint-embedded hparams) ----

    def to_json(self) -> str:
        return json.dumps(_asdict(self), indent=2, sort_keys=True)

    @staticmethod
    def from_dict(d: dict) -> "ExperimentConfig":
        def build(cls, sub: dict):
            kwargs = {}
            for f in dataclasses.fields(cls):
                if f.name not in sub:
                    continue
                v = sub[f.name]
                if dataclasses.is_dataclass(f.type) or f.name in (
                        "model", "data", "train", "parallel", "vision", "text"):
                    v = build(_SUBCONFIGS[f.name], v)
                elif f.name == "mesh_shape":
                    v = tuple(v)
                kwargs[f.name] = v
            return cls(**kwargs)

        return build(ExperimentConfig, d)

    @staticmethod
    def from_json(s: str) -> "ExperimentConfig":
        return ExperimentConfig.from_dict(json.loads(s))


_SUBCONFIGS = {
    "model": ModelConfig,
    "data": DataConfig,
    "train": TrainConfig,
    "parallel": ParallelConfig,
    "vision": VisionConfig,
    "text": TextConfig,
}


def apply_overrides(cfg: ExperimentConfig, overrides: dict) -> ExperimentConfig:
    """Apply dotted-path overrides, e.g. {"model.embedding_dim": 512}."""
    d = _asdict(cfg)
    for key, value in overrides.items():
        parts = key.split(".")
        node: Any = d
        for p in parts[:-1]:
            node = node[p]
        if parts[-1] not in node:
            raise KeyError(f"unknown config field: {key}")
        node[parts[-1]] = value
    return ExperimentConfig.from_dict(d)
