"""Sliding-window chunking operator (operators/chunking.py)."""

from __future__ import annotations

import pytest

from trino_spark.operators.chunking import chunk_documents


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(1, "abcdefghij"), (2, "abc"), (3, "x" * 25)], "doc_id long, text string"
    )


def test_exact_windows(spark, docs):
    rows = {
        (r.doc_id, r.chunk_id): (r.chunk_start, r.chunk_text)
        for r in chunk_documents(docs, "text", size=8, overlap=3).collect()
    }
    # doc 1: len 10, stride 5 -> ceil((10-3)/5) = 2 windows
    assert rows[(1, 0)] == (1, "abcdefgh")
    assert rows[(1, 1)] == (6, "fghij")
    # doc 2: shorter than size -> exactly one window
    assert rows[(2, 0)] == (1, "abc")
    # doc 3: len 25 -> ceil(22/5) = 5 windows, last is the tail
    assert rows[(3, 4)] == (21, "x" * 5)
    assert len([k for k in rows if k[0] == 3]) == 5


def test_overlap_property(spark, docs):
    chunks = chunk_documents(docs, "text", size=8, overlap=3).collect()
    by_doc: dict = {}
    for r in chunks:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_chunks in by_doc.values():
        doc_chunks.sort(key=lambda r: r.chunk_id)
        for a, b in zip(doc_chunks, doc_chunks[1:]):
            # consecutive windows share exactly `overlap` characters
            assert a.chunk_text[-3:] == b.chunk_text[:3] or len(b.chunk_text) < 3


def test_validation(spark, docs):
    with pytest.raises(ValueError):
        chunk_documents(docs, "text", size=5, overlap=5)


def test_plan_stays_codegen(spark, docs):
    plan = chunk_documents(docs, "text")._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan  # chunking itself shuffles nothing
