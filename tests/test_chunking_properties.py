"""Property-based tests (hypothesis) for the recursive splitter.

Two invariant families cross-validate the golden tests and the
chunk_recursive_documents oracle formula over a far wider input space than
fixtures can: (1) on single-spaced word soup the cascade must equal the
word-window closed form the DuckDB oracle states; (2) on arbitrary
punctuated text every chunk is a contiguous substring within the token
budget.
"""

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from building_a_rag_pipeline_with_airflow_spark.operators.chunking import (
    recursive_split_py,
)

WORD = st.text(alphabet="abcdef", min_size=1, max_size=5)


def _closed_form(words, size, step):
    n = len(words)
    if n == 0:
        return []
    k_max = 0 if n <= size else math.ceil((n - size) / step)
    return [
        " ".join(words[step * k: min(step * k + size, n)])
        for k in range(k_max + 1)
    ]


@settings(max_examples=200, deadline=None)
@given(st.lists(WORD, min_size=0, max_size=150))
def test_wordsoup_equals_window_closed_form(words):
    # the precondition the documents corpus satisfies: single-spaced words,
    # no \n . ? ! — the cascade must reduce to size-12 windows stepping 9
    text = " ".join(words)
    got = recursive_split_py(text, chunk_size=12, chunk_overlap=3)
    assert got == _closed_form(words, 12, 9)


TEXT = st.text(
    alphabet="ab .!?\n", min_size=0, max_size=300
)


@settings(max_examples=200, deadline=None)
@given(TEXT)
def test_chunks_are_substrings_within_budget(text):
    chunks = recursive_split_py(text, chunk_size=6, chunk_overlap=2)
    for c in chunks:
        # pieces join with "" (separators embedded), so every chunk is a
        # contiguous slice of the input (strip only trims its edges)
        assert c in text
        assert c != ""
        # merged runs respect the budget; raw appends are single chars
        assert len(c.split()) <= 6


# ---------------------------------------------------------------------------
# Connected components: Spark label propagation vs a pure-Python union-find
# reference over random edge lists.
# ---------------------------------------------------------------------------

EDGE = st.tuples(
    st.integers(min_value=0, max_value=30), st.integers(min_value=0, max_value=30)
)


def _union_find_components(edges):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    return {n: find(n) for n in parent}


@settings(max_examples=10, deadline=None)
@given(st.lists(EDGE, min_size=1, max_size=40))
def test_connected_components_matches_union_find(spark, edges):
    from building_a_rag_pipeline_with_airflow_spark.operators.dedup import (
        connected_components,
    )

    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r.node: r.component for r in connected_components(df).collect()}
    assert got == _union_find_components(edges)


# ---------------------------------------------------------------------------
# Sequence packing: invariants over random token lengths.
# ---------------------------------------------------------------------------


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.integers(min_value=1, max_value=400), min_size=1, max_size=60),
    st.integers(min_value=16, max_value=256),
)
def test_pack_sequences_blocked_invariant(spark, toks, budget):
    from pyspark.sql import functions as F

    from building_a_rag_pipeline_with_airflow_spark.operators.curation import (
        pack_sequences,
    )

    rows = [(i // 3, i % 3, t) for i, t in enumerate(toks)]
    chunks = spark.createDataFrame(
        rows, "doc_id long, chunk_index int, token_length int"
    )
    packed = pack_sequences(chunks, budget=budget, n_streams=4)
    assert packed.count() == len(rows)
    stats = packed.groupBy("stream", "pack_no").agg(
        F.sum("token_length").alias("tok"), F.count("*").alias("n")
    ).collect()
    max_tok = max(toks)
    for r in stats:
        # blocked packing: a pack holds the chunk whose first token falls
        # inside it, so overshoot is bounded by one chunk
        assert r.tok <= budget + max_tok - 1
