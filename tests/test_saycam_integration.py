"""Full SAYCam-shaped integration: ETL outputs (metadata + frames + vocab +
eval trials) -> DataModule -> Trainer -> in-training forced-choice eval,
all through the real file-based pipeline."""

import json

import numpy as np
import pytest
from PIL import Image

from multimodal_baby_tpu.core.config import (
    DataConfig, ExperimentConfig, ModelConfig, ParallelConfig, TextConfig,
    TrainConfig, VisionConfig)
from multimodal_baby_tpu.data import etl
from multimodal_baby_tpu.data.modules import DataModule
from multimodal_baby_tpu.train.trainer import Trainer


@pytest.fixture
def saycam_dir(tmp_path):
    import pandas as pd

    rng = np.random.RandomState(0)
    data_dir = tmp_path / "data"

    # transcripts with enough repetition for the freq>=3 vocab
    tdir = tmp_path / "transcripts"
    tdir.mkdir()
    utts = ["look at the ball", "the ball is red", "a big ball",
            "see the dog", "the dog runs", "good dog",
            "where is the ball", "the dog and the ball",
            "red ball red", "big red dog", "big ball big"]
    utts = utts * 3  # every word keeps freq>=3 within any 70% train split
    rows = []
    for i, u in enumerate(utts):
        rows.append({"Time": f"{i}:00", "Speaker": "M", "Utterance": u,
                     "Video Name": "vid_a.avi"})
    pd.DataFrame(rows).to_csv(tdir / "vid_a.csv", index=False)

    # preprocess transcripts (no videos -> create the referenced frames
    # ourselves at 224px)
    etl.prepare_data(data_dir, transcript_dir=tdir)
    pre = pd.read_csv(
        data_dir / "preprocessed_transcripts_5fps" / "vid_a.csv")
    frames_dir = data_dir / "train_5fps"
    frames_dir.mkdir()
    for name in pre["frame_filename"].unique()[:400]:
        Image.fromarray(rng.randint(0, 255, (224, 224, 3), np.uint8)
                        ).save(frames_dir / name)

    # metadata + vocab from the preprocessed transcripts
    etl.create_train_metadata(
        data_dir / "preprocessed_transcripts_5fps", frames_dir, data_dir,
        train_frac=0.7, val_frac=0.2, seed=0)
    etl.create_shuffled_metadata(data_dir)
    etl.create_vocab(data_dir)

    # eval frames + trials for in-vocab categories
    efd = tmp_path / "eval_frames"
    for stage in ("dev", "test"):
        for cat in ("ball", "dog", "red", "big"):  # all freq>=3 in vocab
            d = efd / stage / cat
            d.mkdir(parents=True)
            for i in range(2):
                Image.fromarray(rng.randint(
                    0, 255, (224, 224, 3), np.uint8)).save(d / f"{i}.png")
    etl.create_eval_metadata(efd, data_dir, n_evaluations=4,
                             excluded_categories=())
    # the DataModule looks for eval_filtered_dev.json by default
    (data_dir / "eval_filtered_dev.json").write_text(
        (data_dir / "eval_dev.json").read_text())
    (data_dir / "eval_filtered_test.json").write_text(
        (data_dir / "eval_test.json").read_text())
    return data_dir


def test_datamodule_loads_etl_outputs(saycam_dir):
    dm = DataModule(DataConfig(
        dataset="saycam", data_dir=str(saycam_dir),
        multiple_frames=True)).setup()
    assert "train" in dm.datasets and "val" in dm.datasets
    assert "val" in dm.eval_datasets
    img, ids, length, raw = dm.datasets["train"][0]
    assert img.shape == (224, 224, 3) and img.dtype == np.uint8
    assert ids[0] == 2 and ids[length - 1] == 3  # <sos> ... <eos>
    assert isinstance(raw, str)

    # shuffled-utterance ablation file loads too
    dm2 = DataModule(DataConfig(
        dataset="saycam", data_dir=str(saycam_dir),
        shuffle_utterances=True)).setup()
    assert len(dm2.datasets["train"]) == len(dm.datasets["train"])


def test_trainer_on_saycam_files(saycam_dir, tmp_path):
    cfg = ExperimentConfig(
        exp_name="saycam_it",
        model=ModelConfig(
            embedding_dim=16, embedding_type="flat",
            normalize_features=True, fix_temperature=True,
            vision=VisionConfig(cnn_model="toy"),
            text=TextConfig(text_encoder="lstm")),
        data=DataConfig(dataset="saycam", data_dir=str(saycam_dir),
                        batch_size=4, val_batch_size=4, num_workers=2,
                        augment_frames=True, multiple_frames=True,
                        eval_include_sos_eos=True),
        train=TrainConfig(max_epochs=1, lr=1e-3,
                          checkpoint_dir=str(tmp_path)),
        parallel=ParallelConfig(compute_dtype="float32"))
    trainer = Trainer(cfg)
    out = trainer.fit()
    assert "loss" in out
    assert "accuracy" in out  # forced-choice trials ran
    assert 0.0 <= out["accuracy"] <= 1.0
