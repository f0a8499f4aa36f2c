"""Run the METEOR paraphrase stage LIVE with a reconstructed table subset
(VERDICT r4 task 7, second half).

Meteor-1.5's ``paraphrase-en.gz`` is not shipped in this image, so the
paraphrase stage had only hand-computed span-alignment unit tests. This
script reconstructs a ~40-pair English subset in the documented table
format (``phrase1 ||| phrase2`` per line — the same file format
ParaphraseTable.from_file parses, gz or plain), writes it to disk, loads
it through the REAL file path (MMB_METEOR_PARAPHRASE env hook), and
scores a paraphrase-rich corpus with and without the table. The printed
deltas are the measured effect of the stage end-to-end: table-off is the
documented lower bound; table-on must be >= on every sentence (weight
0.6 matches can only add).

The subset is reconstructed from well-known English paraphrase pairs of
the kind the PPDB-derived Meteor table contains; it is NOT the original
table, so absolute scores are not jar-comparable — the point is that
the file-driven stage executes live, raises scores only where a
paraphrase matches, and never lowers one.

Run: PYTHONPATH=. python scripts/meteor_paraphrase_live.py
"""
import os
import tempfile

from multimodal_baby_tpu.evaluation import meteor as M

SUBSET = """\
# reconstructed Meteor-1.5-format paraphrase subset (phrase1 ||| phrase2)
couch ||| sofa
kid ||| child
kids ||| children
infant ||| baby
mom ||| mommy
dad ||| daddy
bunny ||| rabbit
puppy ||| dog
kitty ||| cat
photo ||| picture
big ||| large
little ||| small
quick ||| fast
happy ||| glad
street ||| road
car ||| automobile
house ||| home
begin ||| start
toss ||| throw
grab ||| take
look at ||| watch
a lot of ||| many
next to ||| beside
in front of ||| before
right now ||| now
is sleeping ||| sleeps
is eating ||| eats
put on ||| wear
get up ||| rise
sit down ||| sit
come here ||| approach
all gone ||| finished
clean up ||| tidy
fall down ||| fall
more ||| additional
yummy ||| tasty
"""

CORPUS = [
    # (references, hypothesis) — paraphrase-rich: the hypothesis uses a
    # table-equivalent phrase the word stages cannot match
    (["the baby is sleeping on the sofa"], "the infant sleeps on the couch"),
    (["the kid has a lot of blocks"], "the child has many blocks"),
    (["mommy is eating an apple"], "mom eats an apple"),
    (["look at the big dog"], "watch the large puppy"),
    (["the cat sits next to the chair"], "the kitty sits beside the chair"),
    (["daddy took a picture"], "dad grabbed a photo"),
    (["the quick rabbit jumps"], "the fast bunny jumps"),
    (["put on your shoes right now"], "wear your shoes now"),
    # control: no paraphrases — table must change nothing
    (["the ball is red"], "the ball is red"),
    (["a dog runs in the park"], "a cat walks in the park"),
]


def score_all():
    refs = [r for r, _ in CORPUS]
    hyps = [h for _, h in CORPUS]
    per_sent = [M.sentence_meteor(r, h) for r, h in CORPUS]
    return M.meteor(refs, hyps), per_sent


def main():
    M.load_paraphrase_table(None)
    base_corpus, base = score_all()

    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        f.write(SUBSET)
        path = f.name
    # exercise the real env-var file path (from_file + env hook)
    os.environ["MMB_METEOR_PARAPHRASE"] = path
    M._PARAPHRASES = None
    M._PARA_ENV_CHECKED = False
    table_corpus, with_table = score_all()
    n_entries = len(M._paraphrases())

    print(f"paraphrase table: {path} ({n_entries} keys loaded via "
          f"MMB_METEOR_PARAPHRASE)")
    print(f"{'hypothesis':42s} {'off':>7s} {'on':>7s} {'delta':>7s}")
    raised = 0
    for (refs, hyp), b, w in zip(CORPUS, base, with_table):
        print(f"{hyp:42s} {b:7.4f} {w:7.4f} {w - b:+7.4f}")
        assert w >= b - 1e-12, "paraphrase stage lowered a score"
        raised += w > b + 1e-12
    print(f"\ncorpus METEOR off/on: {base_corpus:.4f} / {table_corpus:.4f} "
          f"({table_corpus - base_corpus:+.4f})")
    print(f"sentences raised by the stage: {raised}/{len(CORPUS)}")
    os.unlink(path)
    del os.environ["MMB_METEOR_PARAPHRASE"]
    M.load_paraphrase_table(None)


if __name__ == "__main__":
    main()
