"""Dropout plumbing, loader ordering/prefetch, eval_include_sos_eos."""

import numpy as np

import jax
import jax.numpy as jnp

from multimodal_baby_tpu.core.config import (
    ModelConfig, TextConfig, VisionConfig)
from multimodal_baby_tpu.data.loader import DataLoader, collate
from multimodal_baby_tpu.models import CVCL


def test_dropout_active_in_training():
    """dropout_i (locked input dropout) must alter the LSTM encoding in
    train mode and be deterministic given the rng."""
    cfg = ModelConfig(
        embedding_dim=16, vocab_size=50, embedding_type="flat",
        vision=VisionConfig(cnn_model="toy"),
        text=TextConfig(text_encoder="lstm", dropout_i=0.5))
    model = CVCL(cfg)
    img = jnp.zeros((2, 32, 32, 3))
    txt = jnp.array([[2, 5, 6, 3], [2, 7, 3, 0]], jnp.int32)
    tlen = jnp.array([4, 3])
    v = model.init(jax.random.PRNGKey(0), img, txt, tlen)

    out_eval = model.apply(v, img, txt, tlen)  # deterministic
    out_train1 = model.apply(v, img, txt, tlen, train=True,
                             rngs={"dropout": jax.random.PRNGKey(1)},
                             mutable=["batch_stats"])[0]
    out_train2 = model.apply(v, img, txt, tlen, train=True,
                             rngs={"dropout": jax.random.PRNGKey(1)},
                             mutable=["batch_stats"])[0]
    out_train3 = model.apply(v, img, txt, tlen, train=True,
                             rngs={"dropout": jax.random.PRNGKey(2)},
                             mutable=["batch_stats"])[0]
    # train != eval; same rng deterministic; different rng differs
    assert np.abs(np.asarray(out_eval[0]) -
                  np.asarray(out_train1[0])).max() > 1e-6
    np.testing.assert_array_equal(np.asarray(out_train1[0]),
                                  np.asarray(out_train2[0]))
    assert np.abs(np.asarray(out_train1[0]) -
                  np.asarray(out_train3[0])).max() > 1e-6


class _ToyDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        img = np.full((4, 4, 3), i, np.uint8)
        ids = np.full((5,), i, np.int32)
        return img, ids, 3, f"utt{i}"


def test_loader_covers_all_items_in_order():
    ds = _ToyDataset(23)
    loader = DataLoader(ds, batch_size=5, shuffle=False, num_workers=3,
                        prefetch=2)
    seen = []
    sizes = []
    for batch in loader:
        seen += [int(x[0, 0, 0]) for x in batch["image_u8"]]
        sizes.append(len(batch["raw"]))
    assert seen == list(range(23))
    assert sizes == [5, 5, 5, 5, 3]
    assert len(loader) == 5

    # drop_last
    loader2 = DataLoader(ds, batch_size=5, shuffle=False, drop_last=True)
    assert len(loader2) == 4
    assert sum(len(b["raw"]) for b in loader2) == 20

    # shuffled epochs differ but cover everything
    loader3 = DataLoader(ds, batch_size=23, shuffle=True, seed=1)
    a = [int(x[0, 0, 0]) for x in next(iter(loader3))["image_u8"]]
    assert sorted(a) == list(range(23)) and a != list(range(23))


def test_loader_sync_bypass_matches_threaded(monkeypatch):
    """MMB_LOADER_SYNC=1 (the perf_loader_gap.py measurement bypass)
    yields the identical batch stream — same indices, same order — as
    the threaded path."""
    ds = _ToyDataset(23)
    loader = DataLoader(ds, batch_size=5, shuffle=True, seed=3,
                        num_workers=3, prefetch=2)
    threaded = [[int(x[0, 0, 0]) for x in b["image_u8"]] for b in loader]
    monkeypatch.setenv("MMB_LOADER_SYNC", "1")
    loader2 = DataLoader(ds, batch_size=5, shuffle=True, seed=3,
                         num_workers=3, prefetch=2)
    sync = [[int(x[0, 0, 0]) for x in b["image_u8"]] for b in loader2]
    assert sync == threaded
    assert sorted(x for b in sync for x in b) == list(range(23))


def test_eval_include_sos_eos():
    from multimodal_baby_tpu.data.datasets import EvalTrialDataset
    from multimodal_baby_tpu.data.vocab import Vocab
    import tempfile, os
    from PIL import Image

    d = tempfile.mkdtemp()
    for i in range(4):
        Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(
            f"{d}/{i}.png")
    vocab = Vocab({"<pad>": 0, "<unk>": 1, "<sos>": 2, "<eos>": 3,
                   "ball": 4})
    trial = [{"target_img_filename": f"{d}/0.png",
              "foil_img_filenames": [f"{d}/{i}.png" for i in (1, 2, 3)],
              "target_category": "ball", "foil_categories": ["x", "y", "z"]}]
    ds = EvalTrialDataset(trial, vocab, eval_include_sos_eos=True)
    _, ids, ln, _ = ds[0]
    # label is [<sos>, ball, <eos>] (multimodal_data_module.py:146-148)
    assert list(ids[:3]) == [2, 4, 3] and ln == 3
    ds2 = EvalTrialDataset(trial, vocab, eval_include_sos_eos=False)
    _, ids2, ln2, _ = ds2[0]
    assert ids2[0] == 4 and ln2 == 1
