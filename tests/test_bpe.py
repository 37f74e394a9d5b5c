"""BPE trainer/encoder tests — the classic Sennrich corpus with a
hand-derived merge sequence, plus determinism and encoder properties."""

from __future__ import annotations

import pytest

from building_a_rag_pipeline_with_airflow_spark.operators import bpe


@pytest.fixture(scope="module")
def sennrich(spark):
    # the BPE paper's worked example: low x5, lower x2, newest x6, widest x3
    text = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    return spark.createDataFrame([(1, text)], "doc_id int, text string")


def test_word_frequencies(spark, sennrich):
    wf = {r["word"]: r["freq"] for r in bpe.word_frequencies(sennrich).collect()}
    assert wf == {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def test_train_bpe_classic_merges(spark, sennrich):
    merges = bpe.train_bpe(sennrich, 5)
    # hand-derived with the documented tie-break (count desc, pair lex):
    # e+s (9), es+t (9), est+</w> (9), l+o (7), lo+w (7)
    assert merges == [
        ("e", "s"),
        ("es", "t"),
        ("est", bpe.EOW),
        ("l", "o"),
        ("lo", "w"),
    ]


def test_train_bpe_deterministic_across_layouts(spark, sennrich):
    m1 = bpe.train_bpe(sennrich, 8)
    m2 = bpe.train_bpe(sennrich.repartition(7), 8)
    assert m1 == m2


def test_encode_unseen_word_with_trained_merges(spark, sennrich):
    merges = bpe.train_bpe(sennrich, 5)
    df = spark.createDataFrame([(1, "lowest low")], "doc_id int, text string")
    out = bpe.bpe_encode(df, merges).first()["bpe_tokens"]
    # "lowest" -> low + est</w> (the paper's OOV showcase); "low" has no
    # l+o+w full merge in 5 merges, so it stays low + </w>
    assert out == ["low", "est" + bpe.EOW, "low", bpe.EOW]


def test_encode_concatenation_invariant(spark, sf_dir):
    """Joining a word's BPE symbols (minus EOW) must reproduce the word."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    merges = bpe.train_bpe(docs, 20)
    enc = bpe.bpe_encode(docs, merges)
    row = enc.selectExpr(
        "lower(text) AS t",
        "replace(array_join(bpe_tokens, ''), '</w>', ' ') AS joined",
    ).first()
    assert row["joined"].strip().split() == row["t"].split()


def test_encode_empty_and_null(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, None), (3, "ok")], "doc_id int, text string"
    )
    got = {r["doc_id"]: r["bpe_tokens"] for r in bpe.bpe_encode(df, []).collect()}
    assert got[1] == [] and got[2] == []
    assert got[3] == ["o", "k", bpe.EOW]


def test_train_bpe_stops_when_dry(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id int, text string")
    # every pair occurs once (freq 1 words) -> no pair reaches count 2
    assert bpe.train_bpe(df, 10) == []
