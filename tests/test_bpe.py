"""BPE tokenizer: trainer determinism, encode semantics, Spark parity.

The encode path is differentially checked against a straight-line
"apply merges in rank order as replace-all passes" reference — the
equivalence that the SQL oracle relies on (valid for any well-formed
merges table; see operators/bpe.py module docstring).
"""

import pytest

from data_contract_engine_spark.operators import bpe


def _replace_all_encode(text, merges):
    """Reference: merges applied strictly in rank order, each as one
    left-to-right replace-all pass over a symbol string (what the DuckDB
    oracle does with chained replace()). Every symbol is WRAPPED in
    separators (``|sym|``), so a pair pattern ``|a||b|`` can only match
    whole symbols — a plain ``a|b`` pattern would also match inside a
    neighboring multi-char symbol that merely ends in ``a`` (e.g. symbol
    ``' s'`` followed by ``'t'`` contains ``s|t``), silently diverging
    from the real tokenizer."""
    SEP = "\x1e"
    out = []
    for w in bpe.pretokenize(text):
        s = "".join(SEP + ch + SEP for ch in w)
        for a, b in merges:
            s = s.replace(SEP + a + SEP + SEP + b + SEP, SEP + a + b + SEP)
        out.extend(x for x in s.split(SEP) if x)
    return out


CORPUS = [
    "the cat sat on the mat",
    "the cats sat on the mats",
    "a theme the the the",
    "low lower lowest slowest",
    "don't stop, it's 1234 tokens!",
    "  leading and   trailing  ",
    "",
]


def test_pretokenize_round_trips():
    for t in CORPUS:
        assert "".join(bpe.pretokenize(t)) == t


def test_learn_merges_deterministic_and_well_formed():
    wc = {}
    for t in CORPUS:
        for w in bpe.pretokenize(t):
            if w.strip():
                wc[w] = wc.get(w, 0) + 1
    m1 = bpe.learn_merges(wc, 30)
    m2 = bpe.learn_merges(dict(wc), 30)
    assert m1 == m2 and len(m1) > 5
    # well-formed: every merge's constituents are single chars or the
    # product of a strictly earlier merge
    produced = set()
    for a, b in m1:
        for side in (a, b):
            assert len(side) == 1 or side in produced, (a, b)
        produced.add(a + b)


def test_encode_equals_replace_all_reference():
    wc = {}
    for t in CORPUS:
        for w in bpe.pretokenize(t):
            if w.strip():
                wc[w] = wc.get(w, 0) + 1
    merges = bpe.learn_merges(wc, 40)
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    for t in CORPUS + ["unseen wording, slower theme?"]:
        got = bpe.encode_text(t, ranks, {})
        assert got == _replace_all_encode(t, merges), t
        assert "".join(got) == t  # lossless


def test_encode_merge_order_not_frequency_order():
    # rank order must win over pair frequency at encode time
    ranks = {("a", "b"): 0, ("ab", "c"): 1, ("b", "c"): 2}
    assert bpe.encode_word("abc", ranks, {}) == ("abc",)
    # without the (a,b) merge the lower-rank (b,c) applies first
    ranks2 = {("b", "c"): 0, ("a", "b"): 1}
    assert bpe.encode_word("abc", ranks2, {}) == ("a", "bc")


def test_spark_encode_matches_local(spark):
    rows = [(i, t) for i, t in enumerate(CORPUS)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = bpe.train_bpe(df, num_merges=40)
    assert merges == bpe.learn_merges(
        {
            w: sum(1 for t in CORPUS for x in bpe.pretokenize(t) if x == w)
            for t in CORPUS
            for w in bpe.pretokenize(t)
            if w.strip()
        },
        40,
    )
    out = {
        r["doc_id"]: (r["tokens"], r["n_tokens"])
        for r in bpe.bpe_encode(df, merges).collect()
    }
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    for i, t in rows:
        want = bpe.encode_text(t, ranks, {})
        assert out[i][0] == want and out[i][1] == len(want)


def test_counts_feed_packing(spark):
    from data_contract_engine_spark.operators import sampling

    rows = [(i, t) for i, t in enumerate(CORPUS) if t]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = bpe.train_bpe(df, num_merges=20)
    counts = bpe.bpe_token_counts(df, merges)
    packed = sampling.pack_sequences(
        counts, budget=16, token_col="n_tokens", n_shards=2
    )
    assert packed.count() == len(rows)
    assert {"shard", "pack_id", "pack_offset"} <= set(packed.columns)


def test_trainer_early_stop_and_empty():
    assert bpe.learn_merges({}, 10) == []
    assert bpe.learn_merges({"a": 100}, 10) == []  # single-char words only
    # no pair occurs twice -> stop immediately
    assert bpe.learn_merges({"ab": 1}, 10) == []
