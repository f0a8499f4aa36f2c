"""Native C++ decode pipeline vs PIL."""

import time

import numpy as np
import pytest
from PIL import Image

from multimodal_baby_tpu.data import native


@pytest.fixture(scope="module")
def images(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.RandomState(0)
    paths = {}
    arr = rng.randint(0, 255, (224, 224, 3), np.uint8)
    Image.fromarray(arr).save(d / "a.png")
    paths["png"] = (str(d / "a.png"), arr)
    Image.fromarray(arr).save(d / "a.jpg", quality=95)
    paths["jpg"] = (str(d / "a.jpg"),
                    np.asarray(Image.open(d / "a.jpg").convert("RGB")))
    big = rng.randint(0, 255, (480, 640, 3), np.uint8)
    Image.fromarray(big).save(d / "big.png")
    paths["resize"] = (str(d / "big.png"), big)
    return paths


@pytest.mark.skipif(not native.available(),
                    reason="native pipeline not built (no g++/libjpeg)")
def test_png_exact(images):
    path, arr = images["png"]
    out = native.decode_image(path, 224)
    np.testing.assert_array_equal(out, arr)


@pytest.mark.skipif(not native.available(), reason="native unavailable")
def test_jpeg_matches_pil(images):
    path, pil_pixels = images["jpg"]
    out = native.decode_image(path, 224, fast=False)
    # both decode through libjpeg; tiny differences possible across
    # libjpeg build options
    assert np.abs(out.astype(int) - pil_pixels.astype(int)).mean() < 1.0


@pytest.mark.skipif(not native.available(), reason="native unavailable")
def test_resize_close_to_pil_bilinear(images):
    path, big = images["resize"]
    out = native.decode_image(path, 224, fast=False)
    ref = np.asarray(Image.fromarray(big).resize((224, 224),
                                                 Image.BILINEAR))
    assert np.abs(out.astype(int) - ref.astype(int)).mean() < 2.0


@pytest.mark.skipif(not native.available(), reason="native unavailable")
def test_fast_decode_matches_exact_on_natural_images(tmp_path):
    """DCT-scaled decode (the hot-path default) vs the exact
    full-decode+bilinear path on a low-frequency 'natural' frame at the
    bench's 256 -> 224 operating point (M=7: libjpeg emits 224
    directly). The scaled IDCT is a frequency-domain low-pass, so on
    band-limited content the two paths agree to a few u8 LSB."""
    rng = np.random.RandomState(0)
    low = rng.randint(0, 256, (16, 16, 3), np.uint8)
    img = np.asarray(Image.fromarray(low).resize((256, 256),
                                                 Image.BILINEAR))
    p = tmp_path / "natural.jpg"
    Image.fromarray(img).save(p, quality=90)
    fast = native.decode_image(str(p), 224, fast=True)
    exact = native.decode_image(str(p), 224, fast=False)
    assert fast.shape == exact.shape == (224, 224, 3)
    assert np.abs(fast.astype(int) - exact.astype(int)).mean() < 3.0


@pytest.mark.skipif(not native.available(), reason="native unavailable")
def test_fast_decode_no_upscale_regression(images):
    """fast=True must leave images at or below target size untouched
    (M stays 8 — no DCT scaling kicks in)."""
    path, arr = images["png"]
    np.testing.assert_array_equal(native.decode_image(path, 224, fast=True),
                                  arr)


@pytest.mark.skipif(not native.available(), reason="native unavailable")
def test_batch_decode(images):
    paths = [images["png"][0], images["jpg"][0], images["resize"][0],
             "/nonexistent/file.jpg"]
    out = native.decode_batch(paths, 224, n_threads=4)
    assert out.shape == (4, 224, 224, 3)
    np.testing.assert_array_equal(out[0], images["png"][1])
    assert (out[3] == 0).all()  # failed decode zero-filled


@pytest.mark.skipif(not native.available(), reason="native unavailable")
def test_batch_throughput_beats_sequential_pil(images):
    paths = [images["resize"][0]] * 64

    t0 = time.perf_counter()
    native.decode_batch(paths, 224)
    t_native = time.perf_counter() - t0

    t0 = time.perf_counter()
    for p in paths:
        np.asarray(Image.open(p).convert("RGB").resize(
            (224, 224), Image.BILINEAR))
    t_pil = time.perf_counter() - t0
    # multi-threaded native should beat sequential PIL; allow headroom for
    # loaded CI machines (the win is ~4-8x when quiet)
    assert t_native < t_pil * 1.5, (t_native, t_pil)


@pytest.mark.skipif(not native.available(), reason="native unavailable")
def test_dataset_batch_items_matches_per_item(images, tmp_path):
    """DataLoader's whole-batch fast path (one native decode_batch call)
    must produce the same collated batch as per-item __getitem__."""
    from multimodal_baby_tpu.data.datasets import PairedImageTextDataset
    from multimodal_baby_tpu.data.loader import collate
    from multimodal_baby_tpu.data.vocab import Vocab

    path, _ = images["jpg"]
    utterances = ["look at the ball", "the ball", "look look ball at"]
    vocab = Vocab.build(utterances, min_freq=1)
    data = [{"utterance": u, "frame_filename": path} for u in utterances]
    ds = PairedImageTextDataset(data, vocab)

    idxs = np.asarray([2, 0, 1])
    fast = ds.batch_items(idxs)
    slow = collate([ds[int(j)] for j in idxs])
    np.testing.assert_array_equal(fast["image_u8"], slow["image_u8"])
    np.testing.assert_array_equal(fast["text"], slow["text"])
    np.testing.assert_array_equal(fast["text_len"], slow["text_len"])
    assert fast["raw"] == slow["raw"]


@pytest.mark.skipif(not native.available(), reason="native unavailable")
def test_batch_decode_checked_reports_failures(images):
    paths = [images["png"][0], "/nonexistent/file.jpg", images["jpg"][0]]
    out, ok = native.decode_batch_checked(paths, 224, n_threads=2)
    np.testing.assert_array_equal(ok, [1, 0, 1])
    np.testing.assert_array_equal(out[0], images["png"][1])
    assert (out[1] == 0).all()


@pytest.mark.skipif(not native.available(), reason="native unavailable")
def test_batch_items_pil_fallback_for_native_failures(images, tmp_path):
    """A frame the C++ decoder can't read (GIF — outside its JPEG/PNG
    sniffing) but PIL can must reach the batch through the PIL fallback,
    not as a silently zero-filled black frame."""
    from multimodal_baby_tpu.data.datasets import PairedImageTextDataset
    from multimodal_baby_tpu.data.vocab import Vocab

    rng = np.random.RandomState(3)
    arr = rng.randint(0, 255, (224, 224, 3), np.uint8)
    gif = str(tmp_path / "frame.gif")
    Image.fromarray(arr).save(gif)
    assert native.decode_image(gif, 224) is None  # native can't read it

    utterances = ["the ball", "a cat"]
    vocab = Vocab.build(utterances, min_freq=1)
    data = [{"utterance": utterances[0], "frame_filename": gif},
            {"utterance": utterances[1],
             "frame_filename": images["png"][0]}]
    ds = PairedImageTextDataset(data, vocab)

    with pytest.warns(UserWarning, match="native decode failed"):
        batch = ds.batch_items(np.asarray([0, 1]))
    assert not (batch["image_u8"][0] == 0).all()
    gif_pixels = np.asarray(Image.open(gif).convert("RGB"))
    np.testing.assert_array_equal(batch["image_u8"][0], gif_pixels)
    np.testing.assert_array_equal(batch["image_u8"][1], images["png"][1])
