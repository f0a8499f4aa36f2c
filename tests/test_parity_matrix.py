"""Accuracy-parity matrix: the cli.parity cross-implementation harness run
over every published model variant, with the REFERENCE'S OWN modules
(multimodal/multimodal.py imported live from /root/reference) as the
torch-side oracle.

Round-2 verdict gap: the 0.5% forced-choice parity gate had only ever run
on the embedding-encoder flagship. Here each published variant — lstm,
transformer(+ViT-B/14 vision, learned pos-embed: the 55.5% config),
spatial embeddings with sim=mean and sim=max, and the shuffled ablation's
checkpoint format — goes through the full loop:

  reference-format Lightning .ckpt (random weights)
    -> api.convert -> our forced-choice scoring (cli.parity)
  same weights -> reference MultiModalModel/TextEncoder forward
    -> reference eval.py trial semantics (softmax over logits_per_text,
       pred==0 correct; eval.py:196-213)
  -> 0.5% accuracy gate + trial-level prediction equality.
"""

import json
import sys
import types
from argparse import Namespace

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as tF

from tests.reference_stubs import install_reference_stubs
from tests.test_parity_harness import CATEGORIES, _make_trials
from tests.test_vision import _TorchResNeXt50


def _make_textured_trials(tmp_path, n_trials=8, seed=0):
    """Trials over per-category noise textures: a random-init ViT is
    heavily low-pass and produces near-tied features for flat shape
    drawings (softmax gaps ~1e-6, where any two implementations diverge);
    high-contrast textures give decisively separated features so the
    parity comparison measures the pipelines, not coin flips."""
    import json as _json

    from PIL import Image

    rng = np.random.RandomState(seed)
    frames_dir = tmp_path / "frames"
    frames_dir.mkdir()
    paths = {}
    for ci, cat in enumerate(CATEGORIES):
        crng = np.random.RandomState(1000 + ci)
        base = crng.randint(0, 256, (28, 28, 3), np.uint8)
        for v in range(2):
            img = np.asarray(Image.fromarray(base).resize(
                (224, 224), Image.NEAREST))
            img = np.roll(img, v * 8, axis=1)
            p = frames_dir / f"{cat}_{v}.png"
            Image.fromarray(img).save(p)
            paths.setdefault(cat, []).append(str(p))

    trials = []
    for t in range(n_trials):
        target = CATEGORIES[t % len(CATEGORIES)]
        foils = list(rng.choice([c for c in CATEGORIES if c != target],
                                size=3, replace=False))
        trials.append({
            "trial_num": t,
            "target_category": target,
            "target_img_filename": paths[target][t % 2],
            "foil_categories": foils,
            "foil_img_filenames": [paths[c][(t + 1) % 2] for c in foils],
        })
    meta = tmp_path / "eval_filtered_test.json"
    meta.write_text(_json.dumps({"data": trials}))
    return meta, trials

E = 64  # embedding dim (small for CPU speed; conversion is dim-agnostic)


def _reference_modules():
    install_reference_stubs()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import multimodal.multimodal as ref_mm
    import multimodal.vision_transformer_dino_mugs as ref_vit
    return ref_mm, ref_vit


class _VisionWrapper(tnn.Module):
    """Reference VisionEncoder semantics without torchvision: returns
    (features, feature_map) like multimodal/multimodal.py:88-104."""

    def __init__(self, trunk, head, spatial):
        super().__init__()
        self.trunk = trunk
        self.head = head
        self.spatial = spatial

    def forward(self, x):
        pooled, fmap = self.trunk(x)
        if self.spatial:
            return self.head(fmap), fmap      # [B, E, H, W]
        return self.head(pooled), fmap        # [B, E]


class _ViTWrapper(tnn.Module):
    def __init__(self, vit, head):
        super().__init__()
        self.vit = vit
        self.head = head

    def forward(self, x):
        feats = self.vit(x)                   # CLS token features [B, 768]
        return self.head(feats), None


VARIANTS = {
    # name: (text_arch, embedding_type, sim, vit, extra_hparams)
    "lstm": ("lstm", "flat", "max", False, {}),
    "transformer_vit": ("transformer", "flat", "max", True,
                        {"pos_embed_type": "learned"}),
    "spatial_mean": ("embedding", "spatial", "mean", False, {}),
    "spatial_max": ("embedding", "spatial", "max", False, {}),
    "shuffled": ("embedding", "flat", "max", False,
                 {"shuffle_utterances": True}),
    # joint recipe (configs/saycam_joint.py: lambda_mm = lambda_lm = 0.5):
    # captioning LSTM whose hidden state is image-initialized via the
    # connector (multimodal.py:671-688); checkpoint carries connector
    # weights and the contrastive path must still score identically
    "joint_lstm": ("lstm", "flat", "max", False, {"captioning": True}),
    # attention-captioning checkpoint (Attention + gate weights,
    # multimodal.py:197-275): conversion-only row — forced choice is
    # undefined for it (both implementations require a feature map in
    # encode_text), so it's covered by the LM-CE test below instead
    "attn_captioning": ("lstm", "flat", "max", False,
                        {"captioning": True, "attention": True,
                         "attention_gate": True}),
}


def _build_variant(tmp_path, name, vocab_size):
    """Returns (ckpt_path, torch MultiModalModel oracle)."""
    text_arch, embedding_type, sim, vit, extra = VARIANTS[name]
    ref_mm, ref_vit = _reference_modules()
    torch.manual_seed(hash(name) % (2 ** 31))

    # ---- text encoder: the reference's own module ----
    args = Namespace(
        text_encoder=text_arch, embedding_dim=E, embedding_type=embedding_type,
        crange=1, dropout_i=0.0, dropout_o=0.0,
        captioning=extra.get("captioning", False),
        attention=extra.get("attention", False),
        attention_gate=extra.get("attention_gate", False),
        attention_activation="relu",
        pos_embed_type=extra.get("pos_embed_type", "no_pos_embed"),
        sim=sim, normalize_features=True, temperature=0.07,
        fix_temperature=True)
    vocab = {f"<w{i}>": i for i in range(vocab_size)}
    text_encoder = ref_mm.TextEncoder(vocab, 2048, args)
    if text_arch == "transformer" and args.pos_embed_type == "learned":
        with torch.no_grad():  # zeros would be a no-op; make it matter
            text_encoder.pos_embed.normal_(0, 0.05)

    # ---- vision ----
    sd = {}
    if vit:
        trunk = ref_vit.vit_base(patch_size=14)
        head = tnn.Linear(768, E)
        vision = _ViTWrapper(trunk, head)
        for k, v in trunk.state_dict().items():
            sd[f"vision_encoder.model.{k}"] = v
        sd["vision_encoder.model.head.weight"] = head.weight
        sd["vision_encoder.model.head.bias"] = head.bias
    else:
        trunk = _TorchResNeXt50()
        if embedding_type == "spatial":
            head = tnn.Conv2d(2048, E, 1)
            # reference wraps the trunk in a Sequential for spatial mode
            # (multimodal.py:182-193): children renamed to indices
            idx = {"conv1": "0", "bn1": "1", "layer1": "4", "layer2": "5",
                   "layer3": "6", "layer4": "7"}
            for k, v in trunk.state_dict().items():
                top, _, rest = k.partition(".")
                sd[f"vision_encoder.model.{idx[top]}.{rest}"] = v
            sd["vision_encoder.model.8.weight"] = head.weight
            sd["vision_encoder.model.8.bias"] = head.bias
        else:
            head = tnn.Linear(2048, E)
            for k, v in trunk.state_dict().items():
                sd[f"vision_encoder.model.{k}"] = v
            sd["vision_encoder.model.fc.weight"] = head.weight
            sd["vision_encoder.model.fc.bias"] = head.bias
        vision = _VisionWrapper(trunk, head, embedding_type == "spatial")

    for k, v in text_encoder.state_dict().items():
        sd[f"text_encoder.{k}"] = v
    # tied LM head (flagship convention)
    sd["language_model.output_layer.weight"] = \
        text_encoder.embedding.weight
    sd["language_model.output_layer.bias"] = torch.zeros(vocab_size)

    oracle = ref_mm.MultiModalModel(vision, text_encoder, args)
    oracle.eval()

    hparams = {
        "text_encoder": text_arch, "embedding_dim": E,
        "embedding_type": embedding_type, "sim": sim,
        "normalize_features": True, "fix_temperature": True,
        "temperature": 0.07, "cnn_dino": not vit, "vit_dino": vit,
        "tie": True, "bias": True, **extra,
    }
    path = tmp_path / f"{name}.ckpt"
    torch.save({"state_dict": sd, "hyper_parameters": hparams}, path)
    return path, oracle


def _torch_predictions(oracle, trials, vocab, out_path,
                       include_sos_eos=True):
    """Score trials through the live reference model with the reference
    eval.py loop semantics (eval.py:175-232)."""
    from multimodal_baby_tpu.core.constants import (
        EOS_TOKEN_ID, SOS_TOKEN_ID)
    from PIL import Image

    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    rows = []
    for i, trial in enumerate(trials):
        files = [trial["target_img_filename"]] + \
            list(trial["foil_img_filenames"])
        imgs = np.stack([
            np.asarray(Image.open(f).convert("RGB"), np.float32) / 255.0
            for f in files])
        imgs = (imgs - mean) / std
        label = [vocab[trial["target_category"]]]
        if include_sos_eos:
            label = [SOS_TOKEN_ID] + label + [EOS_TOKEN_ID]
        y = torch.tensor([label], dtype=torch.long)
        y_len = torch.tensor([len(label)])
        with torch.no_grad():
            x = torch.tensor(imgs.transpose(0, 3, 1, 2))
            _, logits_per_text = oracle(x, y, y_len)[:2]
            probs = torch.softmax(logits_per_text[0], dim=-1)
            pred = int(torch.argmax(probs).item())
        rows.append({
            "checkpoint": "oracle", "eval_type": "image", "stage": "test",
            "trial_idx": i,
            "categories": [trial["target_category"]]
            + list(trial["foil_categories"]),
            "logits": probs.numpy().tolist(),
            "pred": pred,
            "correct": pred == 0,
        })
    out_path.write_text(json.dumps({"data": rows}))
    return rows


@pytest.mark.parametrize("variant", sorted(VARIANTS))
def test_parity_matrix(tmp_path, variant):
    from multimodal_baby_tpu.api.model import PACKAGED_VOCAB
    from multimodal_baby_tpu.cli.parity import main
    from multimodal_baby_tpu.data.vocab import Vocab

    if VARIANTS[variant][4].get("attention"):
        pytest.skip("attention-captioning has no contrastive eval path; "
                    "covered by test_captioning_checkpoint_lm_ce_parity")
    vocab = Vocab.load(PACKAGED_VOCAB)
    ckpt_path, oracle = _build_variant(tmp_path, variant, len(vocab))
    if variant == "transformer_vit":  # fewer trials: ViT CPU cost
        meta, trials = _make_textured_trials(tmp_path, n_trials=8)
    else:
        meta, trials = _make_trials(tmp_path, n_trials=12)

    ref_preds = tmp_path / "ref_predictions.json"
    ref_rows = _torch_predictions(oracle, trials, vocab, ref_preds)

    out = tmp_path / "ours.json"
    rc = main([
        "--checkpoint", str(ckpt_path),
        "--data_dir", str(tmp_path),
        "--eval_metadata", "eval_filtered_test.json",
        "--eval_include_sos_eos",
        "--reference_predictions", str(ref_preds),
        "--gate", "0.005",
        "--output", str(out),
    ])
    assert rc == 0, f"parity gate failed for {variant}"

    ours = json.loads(out.read_text())["data"]
    assert [r["pred"] for r in ours] == [r["pred"] for r in ref_rows], \
        f"trial-level prediction mismatch for {variant}"
    ours_p = np.array([r["logits"] for r in ours])
    ref_p = np.array([r["logits"] for r in ref_rows])
    np.testing.assert_allclose(ours_p, ref_p, atol=2e-3)


@pytest.mark.parametrize("variant", ["joint_lstm", "attn_captioning"])
def test_captioning_checkpoint_lm_ce_parity(tmp_path, variant):
    """Round-4 matrix rows (VERDICT r3 task 6): the captioning/attention
    halves of a converted checkpoint — connector, Attention projections,
    attention gate, tied LM head — produce the same LM cross-entropy as
    the reference LanguageModel.calculate_ce_loss (multimodal.py:864-891)
    run on the live reference modules with identical weights."""
    from argparse import Namespace as NS

    import jax.numpy as jnp

    from multimodal_baby_tpu.api.model import CVCLModel, PACKAGED_VOCAB
    from multimodal_baby_tpu.data.vocab import Vocab
    from multimodal_baby_tpu.models.losses import lm_cross_entropy

    vocab = Vocab.load(PACKAGED_VOCAB)
    ckpt_path, oracle = _build_variant(tmp_path, variant, len(vocab))
    ref_mm, _ = _reference_modules()
    ref_lm = ref_mm.LanguageModel(oracle.text_embed,
                                  NS(tie=True, bias=True)).eval()
    with torch.no_grad():  # the saved ckpt carries a zero LM bias
        ref_lm.output_layer.bias.zero_()

    B, L = 2, 9
    rng = np.random.RandomState(7)
    imgs = rng.randn(B, 224, 224, 3).astype(np.float32) * 0.5
    y = np.zeros((B, L), np.int64)
    y_len = np.array([9, 6])
    for i, n in enumerate(y_len):
        y[i, 0] = 2  # <sos>
        y[i, 1:n - 1] = rng.randint(4, len(vocab), n - 2)
        y[i, n - 1] = 3  # <eos>

    attention = VARIANTS[variant][4].get("attention", False)
    with torch.no_grad():
        x_t = torch.tensor(imgs.transpose(0, 3, 1, 2))
        # the reference joint loss feeds encode_image output to the
        # connector, i.e. NORMALIZED features (multimodal_lit.py:202-207
        # -> multimodal.py:732-737); ours mirrors that in joint_forward
        feats, fmap = oracle.encode_image(x_t)
        loss_ref, _, logits_ref, _, labels_ref = ref_lm.calculate_ce_loss(
            torch.tensor(y), torch.tensor(y_len),
            image_features=feats,
            image_feature_map=fmap if attention else None)

    model = CVCLModel.from_torch_checkpoint(ckpt_path)
    out = model.model.apply(
        model.variables, jnp.asarray(imgs), jnp.asarray(y),
        jnp.asarray(y_len), use_mm=False, use_lm=True,
        method="joint_forward")
    ce, mask = lm_cross_entropy(out["lm_logits"], out["lm_labels"])
    loss_ours = float(ce.sum() / mask.sum())

    np.testing.assert_allclose(loss_ours, float(loss_ref),
                               atol=2e-4, rtol=1e-4)
    # tokenwise logits on the valid positions (stronger than the scalar)
    lo = np.asarray(out["lm_logits"], np.float32)
    lr = logits_ref.numpy()
    for i, n in enumerate(y_len):
        np.testing.assert_allclose(lo[i, :n - 1], lr[i, :n - 1],
                                   atol=5e-3, rtol=1e-3,
                                   err_msg=f"{variant} row {i}")
