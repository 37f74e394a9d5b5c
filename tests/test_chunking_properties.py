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
