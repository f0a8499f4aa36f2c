"""COCO captions prep + dataset against a synthetic Karpathy-format json."""

import json

import numpy as np
import pytest
from PIL import Image

from multimodal_baby_tpu.data.coco import (
    COCOCaptionsDataset, build_coco_vocab, prepare_coco)
from multimodal_baby_tpu.data.vocab import Vocab


@pytest.fixture
def karpathy(tmp_path):
    rng = np.random.RandomState(0)
    imgdir = tmp_path / "images"
    imgdir.mkdir()
    words = ["a", "man", "dog", "rides", "runs", "park"]
    images = []
    for i in range(6):
        fname = f"img{i}.jpg"
        Image.fromarray(rng.randint(0, 255, (64, 64, 3), np.uint8)).save(
            imgdir / fname)
        sents = []
        for j in range(2):
            toks = list(rng.choice(words, 5))
            sents.append({"tokens": toks, "raw": " ".join(toks),
                          "sentid": i * 2 + j})
        images.append({"filename": fname, "filepath": "",
                       "split": ["train", "train", "train", "val",
                                 "test", "restval"][i],
                       "sentences": sents, "imgid": i})
    path = tmp_path / "dataset_coco.json"
    path.write_text(json.dumps({"images": images}))
    return path, imgdir


def test_prepare_and_load(karpathy, tmp_path):
    path, imgdir = karpathy
    out = tmp_path / "coco"
    prepare_coco(out, path, count_threshold=1)

    vocab = Vocab.load(out / "vocab.json")
    assert vocab["<pad>"] == 0 and vocab["<unk>"] == 1

    train = json.load(open(out / "train.json"))
    # restval joins train: 3 train + 1 restval
    assert len(train["images"]) == 4
    assert len(json.load(open(out / "val.json"))["images"]) == 1

    ds = COCOCaptionsDataset(train, imgdir)
    img, ids, length, raws = ds[0]
    assert img.shape == (224, 224, 3)
    assert ids[0] == 2 and ids[length - 1] == 3
    assert len(raws) == 2  # all captions returned as references

    # token ids round-trip through the vocab
    sent = train["images"][0]["sentences"][0]
    assert sent["token_ids"] == [vocab[t] for t in sent["tokens"]]

    # random-caption mode picks among captions deterministically per rng
    ds2 = COCOCaptionsDataset(train, imgdir, multiple_captions=True, seed=0)
    _ = ds2[0]


def test_vocab_threshold():
    karp = {"images": [{"sentences": [
        {"tokens": ["rare", "common", "common", "common",
                    "common", "common", "common"]}], "split": "train",
        "filename": "x.jpg"}]}
    vocab = build_coco_vocab(karp, count_threshold=5)
    assert "common" in vocab and "rare" not in vocab
