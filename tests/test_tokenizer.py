"""BPE tokenizer training (operators/tokenizer.py): pair statistics,
merge application, and end-to-end merge learning on a corpus with known
byte-pair structure (Sennrich et al. 2016 worked example style)."""

import pytest

from trino_spark.operators import tokenizer


@pytest.fixture()
def corpus(spark):
    rows = [(1, "low low low lower lowest")]
    return spark.createDataFrame(rows, "doc_id: int, text: string")


def test_word_vocab(spark, corpus):
    v = {r.word: r.freq for r in tokenizer.word_vocab(corpus).collect()}
    assert v == {"low": 3, "lower": 1, "lowest": 1}


def test_pair_stats(spark, corpus):
    syms = tokenizer.to_symbols(tokenizer.word_vocab(corpus))
    stats = {(r.a, r.b): r.cnt for r in tokenizer.pair_stats(syms).collect()}
    # 'lo' and 'ow' occur in all 5 word instances
    assert stats[("l", "o")] == 5 and stats[("o", "w")] == 5
    assert stats[("w", "e")] == 2 and stats[("e", "r")] == 1


def test_top_pair_deterministic_tiebreak(spark, corpus):
    syms = tokenizer.to_symbols(tokenizer.word_vocab(corpus))
    # (l,o) and (o,w) tie at 5; tiebreak a ASC picks (l,o)
    assert tokenizer.top_pair(syms)[:2] == ("l", "o")


def test_apply_merge_non_overlapping(spark):
    df = spark.createDataFrame([("aaaa", 1, ["a", "a", "a", "a"])], "word: string, freq: long, syms: array<string>")
    out = tokenizer.apply_merge(df, "a", "a").collect()[0].syms
    assert out == ["aa", "aa"]  # left-to-right, no overlap


def test_learn_bpe_merge_sequence(spark, corpus):
    merges, symbols = tokenizer.learn_bpe(corpus, n_merges=3)
    # (l,o) and (o,w) tie at 5 -> 'lo' by tiebreak; then (lo,w) at 5 -> 'low';
    # then (low,e) at 2 (lower+lowest) -> 'lowe'.
    assert merges == [("l", "o"), ("lo", "w"), ("low", "e")]
    final = {r.word: r.syms for r in symbols.collect()}
    assert final["low"] == ["low"]
    assert final["lower"] == ["lowe", "r"]
    assert final["lowest"] == ["lowe", "s", "t"]


def test_merge_stops_when_no_repeats(spark):
    df = spark.createDataFrame([(1, "ab cd ef")], "doc_id: int, text: string")
    merges, _ = tokenizer.learn_bpe(df, n_merges=5)
    assert merges == []  # every pair count is 1 < 2
