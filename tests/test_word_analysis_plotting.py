"""Word analysis + plotting + profiler smoke tests."""

import numpy as np
import pandas as pd

from multimodal_baby_tpu.analysis.plotting import (
    dendrogram, scatter_embeddings, similarity_heatmap)
from multimodal_baby_tpu.analysis.word_analysis import (
    per_category_summary, pos_tag, word_to_category)
from multimodal_baby_tpu.train.profiler import (
    StepTimer, device_memory_stats, log_compile_time)


def test_pos_tag_cache(tmp_path):
    cache = tmp_path / "pos.json"
    tags = pos_tag(["the", "ball", "in"], cache_path=cache)
    assert tags["the"] == "DET"
    assert tags["in"] == "ADP"
    assert cache.exists()
    tags2 = pos_tag(["the", "dog"], cache_path=cache)
    assert tags2["the"] == "DET"


def test_per_category_summary():
    summary = pd.DataFrame({
        "token": ["ball", "the", "zzz"],
        "mean_ce": [1.0, 2.0, 3.0],
        "count": [10, 30, 5],
        "mean_position": [2.0, 1.0, 3.0],
    })
    agg = per_category_summary(summary)
    toys = agg[agg.category == "toys"]
    assert float(toys.mean_ce.iloc[0]) == 1.0
    other = agg[agg.category == "other"]
    assert float(other.mean_ce.iloc[0]) == 3.0


def test_plots(tmp_path):
    rng = np.random.RandomState(0)
    coords = rng.randn(30, 2)
    labels = ["a"] * 10 + ["b"] * 10 + ["c"] * 10
    fig = scatter_embeddings(coords, labels,
                             save_path=tmp_path / "scatter.png")
    assert (tmp_path / "scatter.png").exists()

    sim = rng.rand(5, 5)
    similarity_heatmap(sim, list("abcde"),
                       save_path=tmp_path / "heat.png")
    assert (tmp_path / "heat.png").exists()

    feats = rng.randn(8, 16)
    dendrogram(feats, [f"w{i}" for i in range(8)],
               save_path=tmp_path / "dendro.png")
    assert (tmp_path / "dendro.png").exists()


def test_profiler():
    import jax.numpy as jnp
    import jax

    timer = StepTimer(warmup=1)
    f = jax.jit(lambda x: (x @ x).sum())
    x = jnp.ones((64, 64))
    for _ in range(4):
        timer.start()
        timer.stop(sync_on=f(x))
    rep = timer.report(items_per_step=64)
    assert rep["steps_timed"] == 3
    assert rep["items_per_sec"] > 0

    ct = log_compile_time(jax.jit(lambda x: x * 2 + 1), x)
    assert ct["first_call_s"] >= ct["steady_state_s"] >= 0

    stats = device_memory_stats()
    assert len(stats) == 8  # virtual CPU mesh
