"""BPE tokenizer training (operators/bpe.py) against an independent
pure-python reference on random corpora: the space-prefixed-state
`replace` trick must reproduce exact greedy BPE (consecutive pairs merge
in one pass, no false boundaries), the argmax tie-break must be
deterministic, and the encoder must fall back per-char on unseen words."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dp3_spark.operators import bpe as B


def _py_bpe(word_freqs, n_merges):
    """Reference: textbook greedy BPE over a word-frequency table."""
    states = {w: " " + " ".join(w) + " " + B.MARKER for w in word_freqs}
    merges = []
    for step in range(1, n_merges + 1):
        counts = {}
        for w, f in word_freqs.items():
            syms = states[w].lstrip().split(" ")
            for i in range(len(syms) - 1):
                k = (syms[i], syms[i + 1])
                counts[k] = counts.get(k, 0) + f
        if not counts:
            break
        (a, b), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((step, a, b, c))
        states = {
            w: s.replace(f" {a} {b}", f" {a}{b}") for w, s in states.items()
        }
    return merges, states


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
def test_bpe_matches_reference_on_random_corpora(spark, docs_words):
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
    # iteration — the property naive space-delimited replace gets wrong
    _, merges, states = _train_on_texts(spark, ["abab abab"], 1)
    assert merges[0][1:3] == ("a", "b")
    assert states["abab"] == " ab ab _"


def test_no_false_boundary_merges(spark):
    # merge (x,y) must not touch 'ya' even though 'y' occurs there — the
    # replace pattern must anchor at a symbol's own leading space.
    # counts: (x,y)=3 ties (y,_)=3, lhs tie-break picks (x,y)
    _, merges, states = _train_on_texts(spark, ["xy xy xy ya"], 1)
    assert merges[0][1:3] == ("x", "y")
    assert states["ya"] == " y a _"
    assert states["xy"] == " xy _"


def test_single_char_words_and_marker(spark):
    _, merges, states = _train_on_texts(spark, ["a a a b"], 2)
    # only pairs involving the marker exist: (a,_)=3 then (b,_)=1
    assert merges[0][1:3] == ("a", B.MARKER)
    assert states["a"] == " a_"


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
    assert states["a"] == " a_"
