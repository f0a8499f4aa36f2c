"""The public CVCL API — the five-call parity surface
(reference: MultiModalLitModel, multimodal_lit.py:130-190 + README usage):

    model, preprocess = load_model("cvcl")
    tokens, token_len = model.tokenize(["ball", "a cat"])
    image_features = model.encode_image(images)
    text_features = model.encode_text(tokens, token_len)
    logits_per_image, logits_per_text = model(images, tokens, token_len)

Checkpoint sources:
- a native checkpoint directory written by train.checkpoint (config.json
  embedded, Lightning-`save_hyperparameters` style),
- a reference PyTorch Lightning ``.ckpt`` (converted on the fly; torch
  required),
- the published HF-hub name "cvcl" (downloads when network is available).

The bundled ``data/vocab.json`` is the published SAYCam vocabulary (a data
artifact of the reference release, 2350 entries), matching the reference's
packaged vocab (multimodal_lit.py:68-70).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional, Sequence, Tuple, Union

import numpy as np

import jax
import jax.numpy as jnp

from multimodal_baby_tpu.core.config import (
    ExperimentConfig, ModelConfig, TextConfig, VisionConfig)
from multimodal_baby_tpu.core.constants import (
    IMAGENET_MEAN, IMAGENET_STD, IMAGE_H, IMAGE_W)
from multimodal_baby_tpu.data.tokenizer import Tokenizer
from multimodal_baby_tpu.data.vocab import Vocab
from multimodal_baby_tpu.models import CVCL

PACKAGED_VOCAB = Path(__file__).parent.parent / "data" / "vocab.json"


def preprocess(pil_image) -> np.ndarray:
    """PIL image -> [224, 224, 3] float32, ImageNet-normalized (bicubic
    resize) — the reference's published preprocess
    (multimodal_lit.py:143-148)."""
    from PIL import Image
    img = pil_image.convert("RGB").resize(
        (IMAGE_W, IMAGE_H), Image.BICUBIC)
    x = np.asarray(img, np.float32) / 255.0
    return ((x - np.asarray(IMAGENET_MEAN, np.float32))
            / np.asarray(IMAGENET_STD, np.float32))


class CVCLModel:
    """Bound model: flax module + parameters + tokenizer."""

    def __init__(self, model: CVCL, variables: dict, vocab: Vocab,
                 cfg: Optional[ExperimentConfig] = None):
        self.model = model
        self.variables = variables
        self.vocab = vocab
        self.cfg = cfg
        self._tokenizer = Tokenizer(vocab)
        self._encode_image = jax.jit(
            lambda v, x: model.apply(v, x, method="encode_image")[0])
        self._encode_text = jax.jit(
            lambda v, y, yl: model.apply(v, y, yl, method="encode_text")[0])
        self._forward = jax.jit(
            lambda v, x, y, yl: model.apply(v, x, y, yl)[:2])

    # ---- the five public calls ----

    def tokenize(self, texts: Union[str, Sequence[str]]):
        return self._tokenizer(texts)

    def encode_image(self, images) -> jax.Array:
        """images: [B, 224, 224, 3] float32, already preprocessed."""
        return self._encode_image(self.variables, jnp.asarray(images))

    def encode_text(self, tokens, token_len=None) -> jax.Array:
        tokens = jnp.asarray(tokens)
        if token_len is None:
            token_len = (tokens != 0).sum(axis=-1)
        return self._encode_text(self.variables, tokens,
                                 jnp.asarray(token_len))

    def __call__(self, images, tokens, token_len
                 ) -> Tuple[jax.Array, jax.Array]:
        return self._forward(self.variables, jnp.asarray(images),
                             jnp.asarray(tokens), jnp.asarray(token_len))

    # ---- constructors ----

    @staticmethod
    def from_checkpoint_dir(ckpt_dir, which: str = "best",
                            allow_placeholder_vocab: bool = False
                            ) -> "CVCLModel":
        """Load a native checkpoint directory (this framework's trainer).

        The checkpoint's embedded vocab_size is authoritative (the params
        were trained against it). If no word table of that size can be
        found, loading FAILS — a mismatched vocab would silently make
        ``tokenize`` garbage. ``allow_placeholder_vocab=True`` opts into a
        synthetic ``<w{i}>`` table for weight-surgery / embedding-only use.
        """
        from multimodal_baby_tpu.train.checkpoint import CheckpointManager
        ckpt_dir = Path(ckpt_dir)
        cfg = CheckpointManager.load_config(ckpt_dir)
        # the trainer persists the training vocab inside the checkpoint
        # dir (self-contained); fall back to the dataset dir, then to the
        # packaged SAYCam table — first size-matching table wins
        candidates = [p for p in (ckpt_dir / "vocab.json",
                                  Path(cfg.data.data_dir) / "vocab.json",
                                  Path(PACKAGED_VOCAB)) if p.exists()]
        tables = [Vocab.load(p) for p in candidates]
        vocab = next((v for v in tables
                      if len(v) == cfg.model.vocab_size),
                     tables[-1] if tables else Vocab({}))
        data_vocab = candidates[-1] if candidates else Path(PACKAGED_VOCAB)
        if len(vocab) != cfg.model.vocab_size:
            if not allow_placeholder_vocab:
                raise ValueError(
                    f"checkpoint was trained with vocab_size="
                    f"{cfg.model.vocab_size} but the available word table "
                    f"({data_vocab if data_vocab.exists() else PACKAGED_VOCAB}) "
                    f"has {len(vocab)} entries; tokenization would be "
                    f"meaningless. Place the training vocab.json under "
                    f"{cfg.data.data_dir} or pass "
                    f"allow_placeholder_vocab=True to load with a "
                    f"synthetic vocab (embeddings only).")
            from multimodal_baby_tpu.core.constants import SPECIAL_TOKENS
            words = list(SPECIAL_TOKENS) + [
                f"<w{i}>" for i in range(cfg.model.vocab_size - 4)]
            vocab = Vocab({w: i for i, w in enumerate(words)})
        model = CVCL(cfg.model)

        mgr = CheckpointManager(ckpt_dir)
        path = mgr.best_path() if which == "best" else mgr.last_path()
        if path is None:
            path = mgr.last_path()
        # build target structure from a fresh init
        rng = jax.random.PRNGKey(0)
        dummy_img = jnp.zeros((1, IMAGE_H, IMAGE_W, 3))
        dummy_txt = jnp.zeros((1, 25), jnp.int32)
        variables = model.init(rng, dummy_img, dummy_txt,
                               jnp.ones((1,), jnp.int32))
        from multimodal_baby_tpu.train.optimizer import build_optimizer
        from multimodal_baby_tpu.train.step import TrainState
        optimizer = build_optimizer(cfg, variables["params"])
        target = {"state": tuple(TrainState(
            variables["params"], variables.get("batch_stats", {}),
            optimizer.init(variables["params"]), rng,
            jnp.zeros((), jnp.int32))),
            "plateau": {"best": 0.0, "num_bad_epochs": 0},
            "epoch": 0, "lr": cfg.train.lr}
        restored = mgr.restore(path, target)
        state = TrainState(*restored["state"])
        return CVCLModel(model, {"params": state.params,
                                 "batch_stats": state.batch_stats},
                         vocab, cfg)

    @staticmethod
    def from_torch_checkpoint(
        ckpt_path,
        text_encoder: Optional[str] = None,
        vocab_path=None,
    ) -> "CVCLModel":
        """Convert a reference PyTorch Lightning checkpoint in-memory."""
        import torch
        from multimodal_baby_tpu.api.convert import convert_cvcl_checkpoint

        ckpt = torch.load(ckpt_path, map_location="cpu",
                          weights_only=False)
        sd = ckpt["state_dict"] if "state_dict" in ckpt else ckpt
        hparams = ckpt.get("hyper_parameters", ckpt.get("hparams", {})) or {}

        text_arch = text_encoder or hparams.get("text_encoder", "embedding")
        vit = bool(hparams.get("vit_dino", False))
        cfg = ModelConfig(
            embedding_dim=int(hparams.get("embedding_dim", 512)),
            embedding_type=hparams.get("embedding_type", "flat"),
            normalize_features=bool(hparams.get("normalize_features", True)),
            sim=hparams.get("sim", "max"),
            temperature=float(hparams.get("temperature", 0.07)),
            fix_temperature=bool(hparams.get("fix_temperature", True)),
            tie=bool(hparams.get("tie", True)),
            bias=bool(hparams.get("bias", True)),
            vision=VisionConfig(
                cnn_dino=bool(hparams.get("cnn_dino", True)),
                vit_dino=vit),
            text=TextConfig(
                text_encoder=text_arch,
                captioning=bool(hparams.get("captioning", False)),
                attention=bool(hparams.get("attention", False)),
                attention_activation=hparams.get(
                    "attention_activation", "relu"),
                attention_gate=bool(hparams.get("attention_gate", False)),
                crange=int(hparams.get("crange", 1)),
                pos_embed_type=hparams.get(
                    "pos_embed_type", "no_pos_embed")))

        vocab = Vocab.load(vocab_path or PACKAGED_VOCAB)
        cfg.vocab_size = len(vocab)
        params, batch_stats = convert_cvcl_checkpoint(
            sd, text_arch, embedding_type=cfg.embedding_type, vit=vit,
            tie=cfg.tie, bias=cfg.bias)
        if cfg.fix_temperature:
            params.pop("logit_neg_log_temperature", None)
        model = CVCL(cfg)
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        variables = jax.tree_util.tree_map(jnp.asarray, variables)
        return CVCLModel(model, variables, vocab,
                         ExperimentConfig(model=cfg))


def load_model(model_name: str = "cvcl"):
    """Returns (model, preprocess) like the reference
    (multimodal_lit.py:133-149). "cvcl" = the published
    cvcl_s_dino_resnext50_embedding checkpoint (HF hub; requires network).
    A filesystem path loads a local checkpoint (native dir or torch .ckpt).
    """
    p = Path(model_name)
    if p.exists():
        if p.is_dir():
            return CVCLModel.from_checkpoint_dir(p), preprocess
        return CVCLModel.from_torch_checkpoint(p), preprocess

    if model_name == "cvcl":
        from huggingface_hub import hf_hub_download
        name = "cvcl_s_dino_resnext50_embedding"
        ckpt = hf_hub_download(repo_id=f"wkvong/{name}",
                               filename=f"{name}.ckpt")
        return CVCLModel.from_torch_checkpoint(ckpt), preprocess

    raise ValueError(f"Model name not found: {model_name}")
