"""Quantify SPICE's KNOWN_DIVERGENCES on a construction-dense corpus
(VERDICT r4 task 7, first half).

The two documented divergences from the Stanford scene-graph pipeline
(tests/test_spice_fixture.py::KNOWN_DIVERGENCES):

  1. transitive verbs emit only the (subject, verb, object) relation
     tuple, not an extra (subject, verb) attribute;
  2. pronoun subjects are not resolved/kept (dropped, or mapped to the
     imperative "you" by the you-insertion rule).

TEXTGEN_FIDELITY.md argued "systematic parse differences largely cancel
in F1" — this script replaces the argument with a number. For each
candidate/reference pair on a corpus where every sentence contains a
transitive verb and/or a pronoun subject, it scores

  F1_ours      sentence F1 on live parse_tuples output (both sides)
  F1_divfixed  sentence F1 on divergence-corrected tuple sets:
               mechanically add (s, v) for every (s, v, o) [div 1], and
               for pronoun-subject sentences substitute hand-derived
               sets that keep the pronoun as an object with its verb /
               preposition tuples [div 2] — all other grammar identical

and reports mean/max |delta| plus the corpus-level SPICE delta. The
matcher (_f1 / _tuples_match incl. WordNet synonymy when available) is
shared by both arms, so the measured delta isolates the parse
divergences alone.

Run: PYTHONPATH=. python scripts/spice_divergence.py
"""
from multimodal_baby_tpu.evaluation.spice import _f1, parse_tuples

PRONOUNS = {"she", "he", "it", "they", "we", "i"}

# (candidate, reference, hand_cand, hand_ref). hand_* = None means the
# sentence has no pronoun subject: the divergence-corrected set is the
# mechanical div-1 closure of the live parse. Hand sets are written from
# the same grammar as the fixture, with the pronoun kept as an object.
CORPUS = [
    # --- transitive verbs, no pronouns (div 1 only) ---
    ("the dog chases the cat", "a dog is chasing a cat", None, None),
    ("the girl is riding a horse", "a girl rides the horse", None, None),
    ("mommy reads a book", "mommy is reading the book", None, None),
    ("the baby holds a bottle", "a baby is holding the bottle", None, None),
    ("the boy kicks a red ball", "a boy is kicking the ball", None, None),
    ("daddy is washing the car", "daddy washes a car", None, None),
    ("the cat is drinking milk", "a cat drinks the milk", None, None),
    ("a bird is eating bread", "the bird eats the bread", None, None),
    ("the girl draws a picture", "a girl is drawing the picture", None, None),
    ("grandma bakes a cake", "grandma is baking the cake", None, None),
    ("the dog carries a stick", "a dog is carrying the stick", None, None),
    ("the baby wants the toy", "a baby wants a toy", None, None),
    # --- transitive, candidate and reference differ in object (noise
    #     floor: divergence correction must not manufacture agreement) ---
    ("the dog chases a ball", "the dog chases the cat", None, None),
    ("mommy reads a book", "mommy holds a cup", None, None),
    ("the boy kicks a ball", "the boy throws a stone", None, None),
    # --- pronoun subjects (div 2; hand sets keep the pronoun) ---
    ("she is eating an apple", "the girl eats an apple",
     {("she",), ("apple",), ("she", "eat", "apple"), ("she", "eat")},
     {("girl",), ("apple",), ("girl", "eat", "apple"), ("girl", "eat")}),
    ("he throws the ball", "the boy throws a ball",
     {("he",), ("ball",), ("he", "throw", "ball"), ("he", "throw")},
     {("boy",), ("ball",), ("boy", "throw", "ball"), ("boy", "throw")}),
    ("it is sleeping on the couch", "the cat sleeps on the couch",
     {("it",), ("couch",), ("it", "sleep"), ("it", "on", "couch")},
     {("cat",), ("couch",), ("cat", "sleep"), ("cat", "on", "couch")}),
    ("she sees a bird", "she is watching a bird",
     {("she",), ("bird",), ("she", "see", "bird"), ("she", "see")},
     {("she",), ("bird",), ("she", "watch", "bird"), ("she", "watch")}),
    ("he is drinking milk", "the baby drinks milk",
     {("he",), ("milk",), ("he", "drink", "milk"), ("he", "drink")},
     {("baby",), ("milk",), ("baby", "drink", "milk"), ("baby", "drink")}),
    ("she is sleeping", "the baby is sleeping",
     {("she",), ("she", "sleep")},
     {("baby",), ("baby", "sleep")}),
    ("it is on the mat", "the cat is on the mat",
     {("it",), ("mat",), ("it", "on", "mat")},
     {("cat",), ("mat",), ("cat", "on", "mat")}),
    ("he is running", "a boy is running",
     {("he",), ("he", "run")},
     {("boy",), ("boy", "run")}),
    ("she holds the cup", "mommy holds a cup",
     {("she",), ("cup",), ("she", "hold", "cup"), ("she", "hold")},
     {("mommy",), ("cup",), ("mommy", "hold", "cup"), ("mommy", "hold")}),
    ("it is in the box", "the toy is in the box",
     {("it",), ("box",), ("it", "in", "box")},
     {("toy",), ("box",), ("toy", "in", "box")}),
    ("he is sitting on the chair", "the boy sits on a chair",
     {("he",), ("chair",), ("he", "sit"), ("he", "on", "chair")},
     {("boy",), ("chair",), ("boy", "sit"), ("boy", "on", "chair")}),
    ("she is reading a book", "she reads the book",
     {("she",), ("book",), ("she", "read", "book"), ("she", "read")},
     {("she",), ("book",), ("she", "read", "book"), ("she", "read")}),
    ("he kicks the ball", "he is kicking a red ball",
     {("he",), ("ball",), ("he", "kick", "ball"), ("he", "kick")},
     {("he",), ("ball",), ("ball", "red"),
      ("he", "kick", "ball"), ("he", "kick")}),
    # --- mixed: pronoun candidate vs transitive reference, mismatching ---
    ("she is eating a banana", "the boy eats an apple",
     {("she",), ("banana",), ("she", "eat", "banana"), ("she", "eat")},
     {("boy",), ("apple",), ("boy", "eat", "apple"), ("boy", "eat")}),
    ("it is under the table", "the ball is on the table",
     {("it",), ("table",), ("it", "under", "table")},
     {("ball",), ("table",), ("ball", "on", "table")}),
    ("he is holding a spoon", "the baby holds the spoon",
     {("he",), ("spoon",), ("he", "hold", "spoon"), ("he", "hold")},
     {("baby",), ("spoon",), ("baby", "hold", "spoon"), ("baby", "hold")}),
]


def div1_closure(tuples):
    """Mechanical divergence-1 correction: Stanford also emits the
    (subject, verb) attribute for every (subject, verb, object)."""
    out = set(tuples)
    for t in tuples:
        if len(t) == 3:
            out.add((t[0], t[1]))
    return out


def main():
    rows = []
    for cand, ref, hand_c, hand_r in CORPUS:
        ours_c, ours_r = parse_tuples(cand), parse_tuples(ref)
        fixed_c = hand_c if hand_c is not None else div1_closure(ours_c)
        fixed_r = hand_r if hand_r is not None else div1_closure(ours_r)
        rows.append((cand, ref, _f1(ours_c, ours_r),
                     _f1(fixed_c, fixed_r)))

    deltas = [abs(a - b) for _, _, a, b in rows]
    ours_corpus = sum(a for _, _, a, _ in rows) / len(rows)
    fixed_corpus = sum(b for _, _, _, b in rows) / len(rows)
    print(f"{'candidate':38s} {'F1 ours':>8s} {'F1 fixed':>9s} {'|d|':>6s}")
    for cand, ref, a, b in rows:
        print(f"{cand:38s} {a:8.4f} {b:9.4f} {abs(a-b):6.4f}")
    n_pron = sum(1 for _, _, hc, _ in CORPUS if hc is not None)
    print(f"\npairs: {len(rows)} ({n_pron} with pronoun subjects)")
    print(f"corpus SPICE ours:  {ours_corpus:.4f}")
    print(f"corpus SPICE fixed: {fixed_corpus:.4f}")
    print(f"corpus delta:       {fixed_corpus - ours_corpus:+.4f}")
    print(f"mean |sentence dF1|: {sum(deltas)/len(deltas):.4f}")
    print(f"max  |sentence dF1|: {max(deltas):.4f}")
    sub = [abs(a - b) for (_, _, hc, _), (_, _, a, b)
           in zip(CORPUS, rows) if hc is None]
    print(f"mean |dF1| transitive-only (div 1): {sum(sub)/len(sub):.4f}")
    sub2 = [abs(a - b) for (_, _, hc, _), (_, _, a, b)
            in zip(CORPUS, rows) if hc is not None]
    print(f"mean |dF1| pronoun pairs (div 1+2): {sum(sub2)/len(sub2):.4f}")


if __name__ == "__main__":
    main()
