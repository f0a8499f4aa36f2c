"""ETL pipeline: timestamp parsing, utterance preprocessing, metadata /
vocab / eval-trial generation end-to-end on synthetic transcripts."""

import json

import numpy as np
import pytest
from PIL import Image

from multimodal_baby_tpu.data import etl
from multimodal_baby_tpu.data.vocab import Vocab


def test_timestamp_parsing():
    assert etl.convert_timestamp_to_seconds("1:30") == 90
    assert etl.convert_timestamp_to_seconds("12:05") == 725
    assert etl.convert_timestamp_to_seconds("1:30-2:00") == 90  # range
    assert etl.convert_timestamp_to_seconds("3.15") == 195
    assert etl.convert_timestamp_to_seconds("2") == 120  # bare minutes
    # single-digit tens of seconds: "1:3" means 1:30
    assert etl.convert_timestamp_to_seconds("1:3") == 90
    assert etl.convert_timestamp_to_seconds(float("nan")) is None
    # float-like seconds field (3+ digits) is dropped (utils.py:62-67)
    assert etl.convert_timestamp_to_seconds("3.145") is None


def test_clean_utterance():
    assert etl.clean_utterance("hello [laughs] world") == "hello  world"
    assert "INAUDIBLE" in etl.clean_utterance("so [inaudible] yes")
    assert etl.clean_utterance("*whispers* hi") == " hi"
    assert "INAUDIBLE" in etl.clean_utterance("that was inaudible there")


def test_preprocess_utterance_frames():
    utts, stamps, counts = etl.preprocess_utterance(
        "look at the ball", 10.0, 12.0)
    assert utts == ["look at the ball"]
    # 2 seconds at 5 fps -> 10 frames
    assert counts == [10]
    assert len(stamps[0]) == 10
    assert stamps[0][0] == 10.0

    # cap at 32 frames for long gaps
    _, _, counts = etl.preprocess_utterance("hi", 0.0, 100.0)
    assert counts == [32]

    # zero-length window still yields one frame
    _, _, counts = etl.preprocess_utterance("hi", 5.0, 5.0)
    assert counts == [1]

    # inaudible becomes <unk>
    utts, _, _ = etl.preprocess_utterance("so [inaudible] yes", 0.0, 1.0)
    assert "<unk>" in utts[0]


def _write_transcript(path, video="vid_a.avi"):
    import pandas as pd
    rows = [
        {"Time": "0:10", "Speaker": "M",
         "Utterance": "look at the ball", "Video Name": video},
        {"Time": "0:20", "Speaker": "S",  # disallowed speaker
         "Utterance": "baby noises", "Video Name": video},
        {"Time": "0:30", "Speaker": "M",
         "Utterance": "do you see the dog [laughs]", "Video Name": video},
        {"Time": "0:40", "Speaker": "M",
         "Utterance": "the ball the ball the ball", "Video Name": video},
    ]
    pd.DataFrame(rows).to_csv(path, index=False)


def test_full_pipeline(tmp_path):
    # transcripts
    tdir = tmp_path / "transcripts"
    tdir.mkdir()
    _write_transcript(tdir / "vid_a.csv")

    # eval frames: 6 categories x 3 images per stage
    rng = np.random.RandomState(0)
    efd = tmp_path / "eval_frames"
    for stage in ("dev", "test"):
        for cat in ["ball", "dog", "cat", "car", "shoe", "couch"]:
            d = efd / stage / cat
            d.mkdir(parents=True)
            for i in range(3):
                Image.fromarray(rng.randint(
                    0, 255, (32, 32, 3), np.uint8)).save(d / f"{i}.png")

    data_dir = tmp_path / "data"
    etl.prepare_data(data_dir, transcript_dir=tdir,
                     eval_frames_dir=efd, seed=0)

    # preprocessed transcript exists with the frame-filename contract
    import pandas as pd
    pre = pd.read_csv(
        data_dir / "preprocessed_transcripts_5fps" / "vid_a.csv")
    assert set(pre.columns) >= {"transcript_filename", "video_filename",
                                "utterance", "timestamp", "utterance_num",
                                "frame_num", "frame_filename"}
    assert pre["frame_filename"].iloc[0].startswith("vid_a_001_")
    # disallowed speaker dropped; 3 utterances remain
    assert pre["utterance_num"].nunique() == 3
    # 10s windows -> 50 frames -> capped at 32; the last utterance has a
    # zero-length window -> exactly 1 frame (reference end-timestamp hack)
    assert sorted(pre.groupby("utterance_num").size()) == [1, 32, 32]

    # metadata splits
    train = json.load(open(data_dir / "train.json"))["data"]
    assert all("frame_filenames" in u and "utterance" in u for u in train)
    assert (data_dir / "train_shuffled.json").exists()

    # vocab: freq>=3 keeps "ball" (4x) and "the" (6x), drops "dog" (1x)
    vocab = Vocab.load(data_dir / "vocab.json")
    assert vocab["<pad>"] == 0 and vocab["<unk>"] == 1
    assert "the" in vocab and "ball" in vocab
    assert "dog" not in vocab  # freq 1 < 3

    # frequency-ordered ids (ties alphabetical), reference semantics
    v = Vocab.build(["the the the ball ball ball ball"], min_freq=3)
    assert v["ball"] == 4 and v["the"] == 5

    # eval trials: couch excluded, 100 trials x 5 categories
    ev = json.load(open(data_dir / "eval_dev.json"))["data"]
    cats = {t["target_category"] for t in ev}
    assert cats == {"ball", "dog", "cat", "car", "shoe"}
    assert len(ev) == 500
    t0 = ev[0]
    assert len(t0["foil_categories"]) == 3
    assert t0["target_category"] not in t0["foil_categories"]

    # generated trials load in the eval dataset
    from multimodal_baby_tpu.data.datasets import EvalTrialDataset
    v2 = Vocab({w: i for i, w in enumerate(
        ["<pad>", "<unk>", "<sos>", "<eos>", "ball", "dog", "cat", "car",
         "shoe"])})
    ds = EvalTrialDataset(ev, v2)
    imgs, ids, ln, cat = ds[0]
    assert imgs.shape == (4, 224, 224, 3)


def test_extract_frame_array():
    cv2 = pytest.importorskip("cv2")
    frame = np.arange(480 * 640 * 3, dtype=np.uint8).reshape(480, 640, 3)
    out = etl.extract_frame_array(frame)
    assert out.shape == (224, 224, 3)
    # 180-degree rotation: corners swap
    assert etl.extract_frame_array(None) is None


def test_download_transcripts_offline(tmp_path):
    """Transcript download (ref :214-253): injectable fetch, idempotent."""
    links = tmp_path / "links.csv"
    links.write_text(
        "Title,GoogleSheets Link\n"
        "A_001_S,https://docs.google.com/spreadsheets/d/abc123/edit#gid=0\n"
        "A_002_S,https://docs.google.com/spreadsheets/d/def456/edit\n")
    calls = []

    def fake_fetch(url):
        calls.append(url)
        return b"Time,Speaker,Utterance\n01:00,M,hi ball\n"

    out = tmp_path / "transcripts"
    n = etl.download_transcripts(links, out, fetch=fake_fetch, sleep_s=0)
    assert n == 2
    assert (out / "A_001_S.csv").exists()
    assert "spreadsheets/d/abc123/export?format=csv" in calls[0]
    # idempotent: second call skips
    assert etl.download_transcripts(links, out, fetch=fake_fetch,
                                    sleep_s=0) == 0
    assert len(calls) == 2


def _make_labeled_s(root, categories=("ball", "dog"), n=6):
    """Synthetic Labeled-S tree; the green channel encodes the category's
    index in sorted order so a fake scorer can 'classify' frames."""
    from PIL import Image
    for c in categories:
        d = root / c
        d.mkdir(parents=True)
        ci = sorted(categories).index(c)
        for i in range(n):
            Image.new("RGB", (32, 32), (i * 20 % 255, ci, 0)).save(
                d / f"{c}_{i}.png")


def test_filter_and_split_eval_frames(tmp_path):
    """CLIP self-filtering (ref :545-606) with an injected scorer + the
    50/50 dev/test split (ref :608-734)."""
    labeled = tmp_path / "labeled_s"
    _make_labeled_s(labeled)

    def scorer(images_u8, cats):
        # keep every other frame: alternate correct/incorrect predictions
        n = images_u8.shape[0]
        return np.array([i % len(cats) for i in range(n)])

    kept = etl.filter_eval_frames(labeled, tmp_path / "filtered",
                                  scorer=scorer)
    # category 0 ("ball"): preds 0,1,0,1,0,1 -> 3 kept; "dog": 3 kept
    assert kept == 6
    assert len(list((tmp_path / "filtered" / "ball").iterdir())) == 3
    # idempotent
    assert etl.filter_eval_frames(labeled, tmp_path / "filtered",
                                  scorer=scorer) == 0

    etl.split_eval_frames(tmp_path / "filtered", tmp_path / "eval", seed=0)
    for c in ("ball", "dog"):
        dev = set(p.name for p in (tmp_path / "eval/dev" / c).iterdir())
        test = set(p.name for p in (tmp_path / "eval/test" / c).iterdir())
        assert len(dev) == 1 and len(test) == 2  # 3 frames -> 1/2 split
        assert dev & test == set()


def test_prepare_data_full_staging(tmp_path):
    """prepare_data runs all from-raw stages on a synthetic fixture:
    transcript download -> preprocess -> metadata -> eval filtering ->
    filtered trial JSONs -> vocab."""
    links = tmp_path / "links.csv"
    links.write_text(
        "Title,GoogleSheets Link\n"
        "A_001_S,https://docs.google.com/spreadsheets/d/abc/edit\n")

    def fake_fetch(url):
        rows = ["Time,Speaker,Utterance,Video Name"]
        for m in range(12):
            rows.append(f"{m}:00,M,look at the ball and the dog,A_001.avi")
        return ("\n".join(rows) + "\n").encode()

    labeled = tmp_path / "labeled_s"
    _make_labeled_s(labeled, categories=("ball", "dog", "cat", "car",
                                         "shoe"), n=4)

    def scorer(images_u8, cats):
        # 'classify' by reading the category index off the green channel
        return images_u8[:, 0, 0, 1].astype(np.int64)

    data_dir = tmp_path / "data"
    etl.prepare_data(data_dir, transcript_links_csv=links,
                     labeled_s_dir=labeled, clip_scorer=scorer,
                     fetch=fake_fetch, seed=0)
    assert (data_dir / "transcripts" / "A_001_S.csv").exists()
    assert (data_dir / "train.json").exists()
    assert (data_dir / "vocab.json").exists()
    assert (data_dir / "eval" / "dev" / "ball").exists()
    # the perfect scorer keeps every frame in every category
    assert len(list((data_dir / "labeled_s_filtered" / "ball").iterdir())) \
        == 4
    assert (data_dir / "eval_filtered_dev.json").exists()
    trials = json.loads(
        (data_dir / "eval_filtered_dev.json").read_text())["data"]
    assert trials and len(trials[0]["foil_categories"]) == 3
