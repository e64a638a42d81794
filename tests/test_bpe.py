"""BPE tokenizer training (operators/bpe.py) against an independent
TOKEN-LIST greedy reference (no string tricks) on random corpora: the
' sym,' state encoding must reproduce exact greedy BPE — left boundary
from the space, right boundary from the comma (a space-only encoding
falsely merges into tokens that merely START with the right symbol),
consecutive pairs all merging in one pass — with a deterministic argmax
tie-break and per-char fallback for unseen words in the encoder."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dp3_spark.operators import bpe as B


def _greedy_merge(syms, a, b):
    """Textbook left-to-right non-overlapping merge on a TOKEN LIST."""
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _py_bpe(word_freqs, n_merges):
    """Reference trainer operating on token lists, rendered to the
    operator's state encoding only at the very end for comparison."""
    states = {w: list(w) + [B.MARKER] for w in word_freqs}
    merges = []
    for step in range(1, n_merges + 1):
        counts = {}
        for w, f in word_freqs.items():
            syms = states[w]
            for i in range(len(syms) - 1):
                k = (syms[i], syms[i + 1])
                counts[k] = counts.get(k, 0) + f
        if not counts:
            break
        (a, b), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((step, a, b, c))
        states = {w: _greedy_merge(s, a, b) for w, s in states.items()}
    rendered = {w: "".join(f" {t}," for t in s) for w, s in states.items()}
    return merges, rendered


def _train_on_texts(spark, texts, n_merges):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges, states = B.bpe_train(docs, n_merges=n_merges)
    got_merges = [
        (r["step"], r["lhs"], r["rhs"], r["pair_count"]) for r in merges.collect()
    ]
    got_states = {r["w"]: r["state"] for r in states.collect()}
    return docs, got_merges, got_states


words_strategy = st.lists(
    st.text(alphabet="ab0", min_size=1, max_size=6),
    min_size=1,
    max_size=8,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(docs_words=st.lists(words_strategy, min_size=1, max_size=5))
def test_bpe_matches_token_list_reference_on_random_corpora(spark, docs_words):
    texts = [" ".join(ws) for ws in docs_words]
    wf = {}
    for ws in docs_words:
        for w in ws:
            wf[w] = wf.get(w, 0) + 1
    ref_merges, ref_states = _py_bpe(wf, 6)
    _, got_merges, got_states = _train_on_texts(spark, texts, 6)
    assert got_merges == ref_merges
    assert got_states == ref_states


def test_consecutive_pairs_merge_in_one_pass(spark):
    # 'abab' with merge (a,b): BOTH occurrences must merge in the same
    # iteration
    _, merges, states = _train_on_texts(spark, ["abab abab"], 1)
    assert merges[0][1:3] == ("a", "b")
    assert states["abab"] == " ab, ab, _,"


def test_right_boundary_no_prefix_false_merge(spark):
    """The review-caught defect of a space-only encoding: once (b,c) has
    merged, applying (a,b) to tokens [a, bc, _] must NOT produce 'abc'
    just because 'bc' starts with 'b'.  Corpus {bc:10, ab:6, abc:3}
    learns (b,c), (bc,_), (a,b) in that order."""
    texts = ["bc " * 10 + "ab " * 6 + "abc " * 3]
    _, merges, states = _train_on_texts(spark, texts, 3)
    assert [m[1:3] for m in merges] == [("b", "c"), ("bc", "_"), ("a", "b")]
    # 'abc' segments as [a, bc_]: the (a,b) merge must leave 'bc_' intact
    assert states["abc"] == " a, bc_,"
    assert states["ab"] == " ab, _,"


def test_no_false_boundary_merges(spark):
    # merge (x,y) must not touch 'ya' even though 'y' occurs there —
    # the left boundary.  counts: (x,y)=3 ties (y,_)=3, lhs tie-break
    # picks (x,y)
    _, merges, states = _train_on_texts(spark, ["xy xy xy ya"], 1)
    assert merges[0][1:3] == ("x", "y")
    assert states["ya"] == " y, a, _,"
    assert states["xy"] == " xy, _,"


def test_single_char_words_and_marker(spark):
    _, merges, states = _train_on_texts(spark, ["a a a b"], 2)
    assert merges[0][1:3] == ("a", B.MARKER)
    assert states["a"] == " a_,"


def test_encode_counts_and_unseen_word_fallback(spark):
    docs, _, _ = _train_on_texts(spark, ["aa aa bb"], 1)
    _, states = B.bpe_train(docs, n_merges=1)
    new = docs.sparkSession.createDataFrame(
        [(0, "aa zzz")], "doc_id long, text string"
    )
    row = B.encode_token_counts(new, states).collect()[0]
    # merge (a,a) won (freq 2): 'aa' -> [aa, _] = 2 tokens;
    # 'zzz' unseen -> char fallback len+1 = 4 tokens
    assert (row["n_words"], row["n_tokens"]) == (2, 6)


def test_train_stops_when_fully_merged(spark):
    # 'a' alone: after (a,_) there are no pairs left — train returns
    # fewer merges than asked instead of failing
    _, merges, states = _train_on_texts(spark, ["a a"], 5)
    assert [m[1:3] for m in merges] == [("a", B.MARKER)]
    assert states["a"] == " a_,"


def test_encoding_identity_20k_cases_pure_python():
    """The load-bearing claim behind the ' sym,' state encoding (module
    docstring of operators/bpe.py): left-to-right non-overlapping string
    replace of ' a, b,' -> ' ab,' on the rendered state IS token-list
    greedy BPE merging.  20,000 seeded random (corpus, merge-sequence)
    cases, no Spark — the merge at each step is the argmax pair 70% of
    the time (the trained path) and a uniformly random currently-present
    pair 30% of the time (arbitrary merge orders a real tokenizer's
    merges.txt could contain), so the identity is exercised far beyond
    the sequences training itself would pick."""
    import random

    rng = random.Random(20260815)
    alphabet = "ab0"
    for case in range(20_000):
        n_words = rng.randint(1, 6)
        word_freqs = {}
        for _ in range(n_words):
            w = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 6)))
            word_freqs[w] = word_freqs.get(w, 0) + rng.randint(1, 5)
        tok_states = {w: list(w) + [B.MARKER] for w in word_freqs}
        str_states = {
            w: "".join(f" {t}," for t in s) for w, s in tok_states.items()
        }
        for _ in range(rng.randint(1, 8)):
            counts = {}
            for w, f in word_freqs.items():
                s = tok_states[w]
                for i in range(len(s) - 1):
                    k = (s[i], s[i + 1])
                    counts[k] = counts.get(k, 0) + f
            if not counts:
                break
            if rng.random() < 0.7:
                (a, b), _c = min(
                    counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
                )
            else:
                a, b = rng.choice(sorted(counts))
            tok_states = {w: _greedy_merge(s, a, b) for w, s in tok_states.items()}
            str_states = {
                w: s.replace(f" {a}, {b},", f" {a}{b},")
                for w, s in str_states.items()
            }
            rendered = {
                w: "".join(f" {t}," for t in s) for w, s in tok_states.items()
            }
            assert str_states == rendered, (case, a, b, word_freqs)


def test_driver_trainer_matches_reference_pure_python():
    """_train_from_word_counts (the incremental-pair-count driver-side
    trainer) must equal the O(n_merges * corpus) textbook reference on
    2,000 seeded random word-frequency tables, including the argmax
    tie-break and the final segmentations."""
    import random

    rng = random.Random(7)
    for _ in range(2_000):
        wf = {}
        for _w in range(rng.randint(1, 10)):
            w = "".join(rng.choice("ab0") for _ in range(rng.randint(1, 7)))
            wf[w] = wf.get(w, 0) + rng.randint(1, 9)
        n = rng.randint(1, 10)
        ref_merges, ref_rendered = _py_bpe(wf, n)
        got_merges, got_states = B._train_from_word_counts(wf, n)
        assert got_merges == ref_merges
        assert {
            w: "".join(f" {t}," for t in s) for w, s in got_states.items()
        } == ref_rendered


def test_bpe_train_driver_equals_spark_iteration(spark):
    """bpe_train_driver's output (merges AND final states) must be
    byte-identical to bpe_train's Spark-side iteration on the same
    corpus — the control plane changes, the algorithm must not."""
    texts = [
        "the cat sat on the mat",
        "the cats sat on the mats",
        "a cat and a bat ate the rat",
        "bats and rats and cats",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    m1, s1 = B.bpe_train(docs, n_merges=10)
    m2, s2 = B.bpe_train_driver(docs, n_merges=10)
    as_rows = lambda df: sorted(tuple(r) for r in df.collect())
    assert as_rows(m1) == as_rows(m2)
    assert as_rows(s1.select("w", "freq", "state")) == as_rows(
        s2.select("w", "freq", "state")
    )
    # min_freq is an explicit vocabulary cut, applied before training
    m3, s3 = B.bpe_train_driver(docs, n_merges=10, min_freq=2)
    trained_words = {r["w"] for r in s3.collect()}
    assert "ate" not in trained_words and "the" in trained_words
    assert as_rows(m3) != as_rows(m1) or trained_words != {
        r["w"] for r in s1.collect()
    }


def test_bpe_train_driver_max_vocab_rows_bound(spark):
    """max_vocab_rows makes the driver collect provably bounded: when the
    vocabulary fits under the cap the output is IDENTICAL to the
    uncapped run; when the cap cuts, only the top-V (freq desc, word)
    rows are trained on."""
    texts = [
        "the cat sat on the mat",
        "the cats sat on the mats",
        "a cat and a bat ate the rat",
        "bats and rats and cats",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    n_vocab = B.word_counts(docs).count()
    m_full, s_full = B.bpe_train_driver(docs, n_merges=10)
    # cap >= vocab: equality with the uncapped trainer
    m_cap, s_cap = B.bpe_train_driver(docs, n_merges=10, max_vocab_rows=n_vocab)
    as_rows = lambda df: sorted(tuple(r) for r in df.collect())
    assert as_rows(m_cap) == as_rows(m_full)
    assert as_rows(s_cap.select("w", "freq", "state")) == as_rows(
        s_full.select("w", "freq", "state")
    )
    # cap that cuts: exactly V words survive, and they are the top-V by
    # (freq desc, w) — the deterministic truncation order
    wc = {r["w"]: r["freq"] for r in B.word_counts(docs).collect()}
    top5 = set(sorted(wc, key=lambda w: (-wc[w], w))[:5])
    _, s5 = B.bpe_train_driver(docs, n_merges=10, max_vocab_rows=5)
    assert {r["w"] for r in s5.collect()} == top5


def test_encode_tokens_order_and_fallback(spark):
    """encode_tokens preserves word order in the token stream and falls
    back to chars+marker for out-of-vocab words; its n_tokens agrees
    with encode_token_counts."""
    docs = spark.createDataFrame(
        [(1, "the cat sat"), (2, "a cat ate"), (3, "zz unseen")],
        "doc_id long, text string",
    )
    train = docs.filter("doc_id <= 2")
    _, states = B.bpe_train(train, n_merges=4)
    toks = {r["doc_id"]: r for r in B.encode_tokens(docs, states).collect()}
    counts = {r["doc_id"]: r for r in B.encode_token_counts(docs, states).collect()}
    for d in (1, 2, 3):
        assert toks[d]["n_tokens"] == counts[d]["n_tokens"]
    # word order: doc 1's stream starts with 'the''s segmentation and
    # contains the trained 'cat' merge as a unit
    assert "cat_" in toks[1]["detok"].split()  # word-final merge unit
    # detok reconstructs the lowercased words when separators are removed
    assert toks[1]["detok"].replace(" ", "").replace(B.MARKER, "") == "thecatsat"
    # out-of-vocab 'zz'/'unseen' fell back to single chars + marker
    assert toks[3]["detok"].split()[:3] == ["z", "z", B.MARKER]
