"""Bigram-LM perplexity scoring (operators/lm.py, the CCNet quality-pass
recipe): hand-checked probabilities on a tiny corpus, pruning, edge docs."""

import pytest

from trino_spark.operators import lm


@pytest.fixture()
def corpus(spark):
    return spark.createDataFrame(
        [(1, "a b a b"), (2, "a b")], "doc_id: int, text: string"
    )


def test_hand_checked_perplexity(spark, corpus):
    model, uni, v = lm.train_bigram_lm(corpus)
    assert v == 2
    probs = {(r.w1, r.w2): r.logp for r in model.collect()}
    import math

    # p(b|a) = (3+1)/(3+2) = 0.8 ; p(a|b) = (1+1)/(3+2) = 0.4
    assert probs[("a", "b")] == pytest.approx(math.log(0.8))
    assert probs[("b", "a")] == pytest.approx(math.log(0.4))
    out = {r.doc_id: r.perplexity for r in lm.score_perplexity(corpus, model, uni, v).collect()}
    assert out[2] == pytest.approx(1.25)  # exp(-ln 0.8)
    assert out[1] == pytest.approx((0.8 * 0.8 * 0.4) ** (-1 / 3))


def test_unseen_bigram_backoff(spark, corpus):
    model, uni, v = lm.train_bigram_lm(corpus)
    probe = spark.createDataFrame([(9, "b b")], "doc_id: int, text: string")
    out = lm.score_perplexity(probe, model, uni, v).collect()[0]
    # (b,b) unseen -> floor 1/(c1(b)+V) = 1/5
    assert out.perplexity == pytest.approx(5.0)


def test_unseen_history_word(spark, corpus):
    model, uni, v = lm.train_bigram_lm(corpus)
    probe = spark.createDataFrame([(9, "zz qq")], "doc_id: int, text: string")
    out = lm.score_perplexity(probe, model, uni, v).collect()[0]
    assert out.perplexity == pytest.approx(2.0)  # 1/(0+V) = 1/2


def test_short_doc_null(spark, corpus):
    model, uni, v = lm.train_bigram_lm(corpus)
    probe = spark.createDataFrame([(9, "solo")], "doc_id: int, text: string")
    assert lm.score_perplexity(probe, model, uni, v).collect()[0].perplexity is None


def test_pruned_model_bounded(spark, corpus):
    model, _, _ = lm.train_bigram_lm(corpus, top_k=1)
    rows = model.collect()
    assert len(rows) == 1 and (rows[0].w1, rows[0].w2) == ("a", "b")


def test_gibberish_scores_worse_than_fluent(spark):
    fluent = " ".join(["the cat sat on the mat"] * 20)
    gibberish = "zq xv jk wp mn bt ly rs dc fg"
    df = spark.createDataFrame([(1, fluent), (2, gibberish)], "doc_id: int, text: string")
    train = spark.createDataFrame([(0, fluent)], "doc_id: int, text: string")
    model, uni, v = lm.train_bigram_lm(train)
    out = {r.doc_id: r.perplexity for r in lm.score_perplexity(df, model, uni, v).collect()}
    assert out[2] > out[1] * 2
