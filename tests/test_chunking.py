"""Golden-value tests for the chunking operators (reference semantics:
chromadb_rag.py:49-61 fixed; RecursiveTokenChunker args :64-72)."""

import pytest
from pyspark.sql import functions as F

from building_a_rag_pipeline_with_airflow_spark.operators import chunking


def _ref_fixed(text: str, size: int = 400, overlap: int = 50) -> list[str]:
    # verbatim reference semantics: chunk_document_simple
    step = size - overlap
    return [text[i : i + size] for i in range(0, len(text), step)]


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "a" * 1000),
        (2, "b" * 400),       # boundary: exactly one window
        (3, "c" * 351),       # boundary: one past a step
        (4, "short"),
        (5, ""),              # empty → no chunks
        (6, None),            # null → no chunks
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_fixed_matches_reference_loop(spark, docs):
    got = {
        (r.doc_id, r.chunk_index): r.text
        for r in chunking.chunk_fixed(docs).collect()
    }
    for doc_id, text in [(1, "a" * 1000), (2, "b" * 400), (3, "c" * 351), (4, "short")]:
        expected = _ref_fixed(text)
        for i, chunk in enumerate(expected):
            assert got[(doc_id, i)] == chunk, (doc_id, i)
        assert (doc_id, len(expected)) not in got
    assert not any(k[0] in (5, 6) for k in got)


def test_fixed_chunk_ids_and_lengths(spark, docs):
    row = (
        chunking.chunk_fixed(docs)
        .where((F.col("doc_id") == 1) & (F.col("chunk_index") == 1))
        .first()
    )
    assert row.chunk_id == "1_chunk_1"  # reference id format chromadb_rag.py:116
    assert row.char_length == 400
    assert row.token_length == 1  # 'a'*400 has a single whitespace token


def test_recursive_split_respects_chunk_size():
    text = "one two three. four five six. seven eight nine. ten eleven twelve."
    chunks = chunking.recursive_split_py(text, chunk_size=6, chunk_overlap=2)
    assert chunks, "must produce chunks"
    assert all(len(c.split()) <= 6 for c in chunks)
    # all input words survive, in order
    joined = " ".join(chunks)
    for word in ("one", "six", "twelve"):
        assert word in joined


def test_recursive_separator_cascade_paragraphs():
    text = "para one here\n\npara two here\n\npara three here"
    chunks = chunking.recursive_split_py(text, chunk_size=3, chunk_overlap=0)
    assert chunks == ["para one here", "para two here", "para three here"]


def test_recursive_char_fallback():
    # no separators at all and longer than chunk_size → character split path
    chunks = chunking.recursive_split_py("abcdefghij", chunk_size=4, chunk_overlap=0)
    assert chunks  # does not loop forever / crash


# ---- golden tests: hand-derived from the public RecursiveCharacterText-
# Splitter algorithm (keep_separator=True) that the reference's
# RecursiveTokenChunker wraps (chromadb_rag.py:64-72). Each expected list
# below was traced by hand through split → strict <chunk_size goodness →
# greedy merge with pop-from-front overlap → strip-whitespace join.


def test_recursive_golden_merge_overlap():
    # size 5 tokens, overlap 2: ["aa".."ee"] merges to 5, then the pop loop
    # retains ["dd","ee"] (2 tokens <= overlap) before appending "ff","gg".
    got = chunking.recursive_split_py(
        "aa bb cc dd ee ff gg", chunk_size=5, chunk_overlap=2, separators=[" ", ""]
    )
    assert got == ["aa bb cc dd ee", "dd ee ff gg"]


def test_recursive_golden_cascade_then_merge():
    # "\n\n" splits first; the 4-token piece recurses to the " " level where
    # size-3/overlap-1 merging gives ["aa bb cc", "cc dd"]; the 2-token
    # second paragraph (with its leading separator) merges alone and the
    # strip-whitespace join removes the leading "\n\n".
    got = chunking.recursive_split_py(
        "aa bb cc dd\n\nee ff",
        chunk_size=3,
        chunk_overlap=1,
        separators=["\n\n", " ", ""],
    )
    assert got == ["aa bb cc", "cc dd", "ee ff"]


def test_recursive_golden_char_level_drops_blank_merges():
    # chunk_size=1 forces every 1-token piece to the char level; raw
    # oversized chars are appended unmerged, and the lone " " piece merges
    # to a blank doc that the strip-join drops (public _join_docs returns
    # None for empty).
    got = chunking.recursive_split_py(
        "ab cd", chunk_size=1, chunk_overlap=0, separators=[" ", ""]
    )
    assert got == ["a", "b", "c", "d"]


def test_recursive_keep_separator_start_attach():
    # keep_separator=True attaches each separator to the START of the
    # following piece; with a large chunk_size the whole text merges back
    # (joiner "") so no separator is lost or duplicated.
    text = "one. two. three"
    got = chunking.recursive_split_py(
        text, chunk_size=100, chunk_overlap=0, separators=[".", " ", ""]
    )
    assert got == [text]


def test_recursive_word_window_closed_form():
    # On a punctuation-free single-spaced corpus the cascade must reduce to
    # 60-word windows stepping by 50 plus a tail — the closed form the
    # chunk_recursive_documents DuckDB oracle states.
    words = [f"w{i}" for i in range(137)]
    got = chunking.recursive_split_py(
        " ".join(words), chunk_size=60, chunk_overlap=10
    )
    expect = [
        " ".join(words[0:60]),
        " ".join(words[50:110]),
        " ".join(words[100:137]),
    ]
    assert got == expect


def test_chunk_paragraphs_golden(spark):
    docs = spark.createDataFrame(
        [(1, "para one\n\n\n\npara two\n\n  \n\npara three"), (2, "solo")],
        "doc_id long, text string",
    )
    rows = chunking.chunk_paragraphs(docs).orderBy("doc_id", "chunk_index").collect()
    assert [(r.doc_id, r.chunk_index, r.text) for r in rows] == [
        (1, 0, "para one"),
        (1, 1, "para two"),
        (1, 2, "para three"),
        (2, 0, "solo"),
    ]
    assert rows[0].chunk_id == "1_chunk_0"


def _kamradt_py(text, dim, avg_chunk_size, min_chunk_size, buffer=3):
    """Independent pure-Python replication of the public
    KamradtModifiedChunker: initial recursive split at (min_chunk_size, 0),
    ±buffer combine, embed combined, neighbor cosine distances, cut at the
    top-(total_tokens // avg_chunk_size) distances."""
    import numpy as np

    from building_a_rag_pipeline_with_airflow_spark.functions.embed import embed_text

    sents = chunking.recursive_split_py(
        text, chunk_size=min_chunk_size, chunk_overlap=0
    )
    if not sents:
        return []
    combined = [
        " ".join(sents[max(0, i - buffer): i + 1 + buffer])
        for i in range(len(sents))
    ]
    # float32 storage (ArrayType(FloatType)), double math — mirrors the plan
    embs = [
        np.asarray(embed_text(c, dim), dtype=np.float32).astype(np.float64)
        for c in combined
    ]
    dists = []
    for i in range(len(sents) - 1):
        a, b = embs[i], embs[i + 1]
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        sim = float(a @ b / (na * nb)) if na > 0 and nb > 0 else 0.0
        dists.append(1.0 - sim)
    total = sum(len(s.split()) for s in sents)
    k = total // avg_chunk_size
    # (K+1)-th largest distance, floored at the reference binary search's
    # 1e-6 stopping resolution (it can never cut noise-level distances)
    thr = max(sorted(dists, reverse=True)[k] if len(dists) > k else 0.0, 1e-6)
    cuts = [i for i, d in enumerate(dists) if d > thr]
    chunks, start = [], 0
    for c in cuts:
        chunks.append(" ".join(sents[start: c + 1]))
        start = c + 1
    if start < len(sents):
        chunks.append(" ".join(sents[start:]))
    return chunks


def test_semantic_matches_kamradt_replication(spark):
    from building_a_rag_pipeline_with_airflow_spark.functions.embed import hashed_embedder_udf

    texts = [
        # two clear topic blocks → the top-1 distance must cut between them
        (" ".join(["spark shuffle join merge"] * 12)
         + " " + " ".join(["llama vicuna alpaca guanaco"] * 12)),
        # three blocks, longer
        (" ".join(["alpha beta gamma delta epsilon"] * 15)
         + " " + " ".join(["one two three four five"] * 15)
         + " " + " ".join(["red green blue cyan magenta"] * 15)),
        # shorter than avg_chunk_size → k=0 → single chunk
        "tiny document with just a few words",
    ]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    out = chunking.chunk_semantic(
        docs, hashed_embedder_udf(16), avg_chunk_size=60, min_chunk_size=10
    ).collect()
    got = {}
    for r in out:
        got.setdefault(r.doc_id, {})[r.chunk_index] = r.text
    for doc_id, text in enumerate(texts):
        expect = _kamradt_py(text, 16, avg_chunk_size=60, min_chunk_size=10)
        chunks = [got[doc_id][i] for i in range(len(got.get(doc_id, {})))]
        assert chunks == expect, f"doc {doc_id}"
    assert len(got[2]) == 1  # k=0 → no cuts


def test_adjacent_overlap_matches_constant(spark, docs):
    out = chunking.adjacent_overlap(chunking.chunk_fixed(docs)).collect()
    by_key = {(r.doc_id, r.chunk_index): r.overlap_chars for r in out}
    assert by_key[(1, 0)] == 0
    assert by_key[(1, 1)] == 50  # interior chunks overlap by exactly CHUNK_OVERLAP
    assert by_key[(3, 1)] == 1   # 351-char doc: second chunk is 1 char


# ---------------------------------------------------------------------------
# HTML boilerplate strip (functions.text.html_to_text) + pipeline wiring
# ---------------------------------------------------------------------------


def test_html_to_text_rules(spark):
    """Every chain rule: script/style contents dropped (even with tag-like
    text inside), comments dropped, tags become spaces (no word welding),
    entities decode with &amp; LAST (double-escapes stay text), whitespace
    collapses."""
    from pyspark.sql import functions as F

    from building_a_rag_pipeline_with_airflow_spark.functions import text as tx

    cases = [
        ("<p>hello</p><p>world</p>", "hello world"),
        ("<script>var a = '<div>' && 1 < 2;</script>kept", "kept"),
        ("<style>p { color: red; }</style>kept", "kept"),
        ("a<!-- <b>hidden</b> -->b", "a b"),
        ("one<br/>two", "one two"),  # tag -> space, words not welded
        ("x&nbsp;y", "x y"),
        ("&lt;tag&gt; &quot;q&quot; &#39;a&#39; &apos;b&apos;", "<tag> \"q\" 'a' 'b'"),
        ("&amp;amp; &amp;lt;", "&amp; &lt;"),  # decode-order trap
        ("  a \t b\n\nc  ", "a b c"),
        ("<SCRIPT>x</SCRIPT><STYLE>y</STYLE>ok", "ok"),  # case-insensitive
        # comments strip BEFORE script: a comment mentioning <script>
        # must not swallow body text up to a later real </script>...
        ("a<!-- <script> -->b<script>x</script>c", "a b c"),
        # ...while the old-school script-hiding idiom still collapses
        ("<script><!-- var q = 1; --></script>ok", "ok"),
    ]
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(cases)], "i int, html string"
    )
    got = {
        r.i: r.clean
        for r in df.select("i", tx.html_to_text("html").alias("clean")).collect()
    }
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, cases[i][0], got[i])


def test_build_index_html_wiring(spark):
    """rag wiring: build_index(html=True) chunks the STRIPPED text — an
    HTML fixture indexes identically to its pre-cleaned text, and the
    markup tokens never reach the chunker."""
    from building_a_rag_pipeline_with_airflow_spark.pipeline import build_index

    plain = "alpha beta gamma delta epsilon zeta"
    html = (
        "<html><head><style>p{x}</style><script>var q=1;</script></head>"
        "<body><h1>alpha beta</h1><p>gamma delta</p> epsilon&nbsp;zeta</body></html>"
    )
    docs_html = spark.createDataFrame([(1, html)], "doc_id int, text string")
    docs_plain = spark.createDataFrame([(1, plain)], "doc_id int, text string")
    got = build_index(docs_html, strategy="fixed", html=True).select(
        "chunk_id", "text").collect()
    want = build_index(docs_plain, strategy="fixed").select(
        "chunk_id", "text").collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    raw = build_index(docs_html, strategy="fixed").select("text").collect()
    assert any("<script>" in r.text for r in raw)  # without the knob, markup chunks
