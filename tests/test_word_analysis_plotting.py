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
    # "the" and "zzz" are uncategorized -> token-weighted "other" mean
    other = agg[agg.category == "other"]
    assert abs(float(other.mean_ce.iloc[0]) - (2 * 30 + 3 * 5) / 35) < 1e-9


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


def test_curated_categories_and_untypical_exclusion():
    """Word categories are the reference's curated SAYCam lists
    (analysis_tools/word_categories.py pos_subcats typical members), not
    invented ones, and untypical words are excluded from aggregates."""
    from multimodal_baby_tpu.analysis.word_analysis import (
        DEFAULT_WORD_CATEGORIES, UNTYPICAL_WORDS, per_category_summary,
        word_to_category)
    import pandas as pd

    w2c = word_to_category(DEFAULT_WORD_CATEGORIES)
    # reference-curated memberships (spot checks)
    assert w2c["kitty"] == "animals"
    assert w2c["tractor"] == "vehicles"
    assert w2c["sandpit"] == "household"
    assert w2c["hashbrowns"] == "food_drink"
    assert w2c["wonder"] == "trans. verb"
    assert w2c["pooing"] == "intrans. verb"
    assert "<unk>" in UNTYPICAL_WORDS and "let's" in UNTYPICAL_WORDS

    df = pd.DataFrame({
        "token": ["kitty", "let's", "tractor"],
        "mean_ce": [1.0, 99.0, 3.0],
        "count": [2, 100, 1],
    })
    agg = per_category_summary(df)
    assert set(agg["category"]) == {"animals", "vehicles"}  # let's dropped


def test_pos_fallback_and_syntactic_category():
    from multimodal_baby_tpu.analysis.word_analysis import (
        pos_tag, syntactic_category)
    tags = pos_tag(["the", "kitty", "running", "quickly", "on", "7",
                    "is", "red"])
    assert tags["the"] == "DET"
    assert tags["on"] == "ADP"
    assert tags["running"] == "VERB"
    assert tags["quickly"] == "ADV"
    assert tags["7"] == "NUM"
    assert tags["is"] == "AUX"
    assert tags["red"] == "ADJ"
    assert tags["kitty"] == "NOUN"
    assert syntactic_category("NOUN") == "noun"
    assert syntactic_category("AUX") == "function word"
    assert syntactic_category("NUM") == "cardinal number"
    assert syntactic_category("INTJ") == "."


def test_ratings_csv_join(tmp_path):
    """word_ratings.py pattern: external norms join on the word column."""
    from multimodal_baby_tpu.analysis.word_analysis import join_ratings
    import pandas as pd

    ratings = tmp_path / "ratings.csv"
    ratings.write_text("word,aoa,concreteness\nkitty,20.1,4.9\nball,15.3,5.0\n")
    df = pd.DataFrame({"token": ["kitty", "ball", "zzz"],
                       "mean_ce": [1.0, 2.0, 3.0], "count": [1, 2, 3]})
    joined = join_ratings(df, ratings)
    assert float(joined.loc[joined.token == "kitty", "aoa"].iloc[0]) == 20.1
    assert joined.loc[joined.token == "zzz", "concreteness"].isna().all()


def test_untokenize_and_frame_subplots(tmp_path):
    from multimodal_baby_tpu.analysis.plotting import (
        frame_subplots, untokenize)
    assert untokenize("do n't do that !") == "don't do that!"
    assert untokenize("that 's the ball .") == "that's the ball."
    fig, ax, w = frame_subplots(2, 3)
    assert ax.shape == (2, 3) and w > 0
    import matplotlib.pyplot as plt
    plt.close(fig)


def test_build_data_deterministic():
    from multimodal_baby_tpu.analysis.processing import build_data
    data = build_data({"dataset": "synthetic", "synthetic_size": 32})
    assert not data.cfg.augment_frames
    assert data.cfg.eval_include_sos_eos
    assert len(data.datasets["train"]) > 0
