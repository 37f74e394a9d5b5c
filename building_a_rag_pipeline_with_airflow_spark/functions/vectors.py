"""Vector math as Catalyst expressions over ``array<float/double>`` columns.

The reference delegates all vector math to ChromaDB's HNSW index
(``Chunking_Strats/chromadb_rag.py:96-140``). Here the exact path is pure
SQL — ``zip_with`` + ``aggregate`` stay inside whole-stage codegen, so a
brute-force cosine scan is a single columnar pass with no Python.
Computation is in double regardless of storage type (float storage halves
IO; double math keeps scores stable)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _d(col: Column | str) -> Column:
    return _c(col).cast("array<double>")


def dot_product(a: Column | str, b: Column | str) -> Column:
    return F.aggregate(
        F.zip_with(_d(a), _d(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(_d(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def l2_normalize(a: Column | str) -> Column:
    """Unit-normalize (normalize-at-write so retrieval is a pure dot)."""
    arr = _d(a)
    norm = l2_norm(arr)
    return F.when(norm == 0, arr).otherwise(
        F.transform(arr, lambda x: x / norm)
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Three array aggregations per pair (dot + one norm per side) — the
    zero-denominator case rides on ``try_divide`` returning NULL (in ANSI
    and legacy modes alike), coalesced to 0.0, instead of a ``when`` guard
    that would re-evaluate both norms and double the per-row work. Null
    inputs stay null via the (cheap, non-aggregating) isNull gate."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(
        _c(a).isNull() | _c(b).isNull(), F.lit(None).cast("double")
    ).otherwise(F.coalesce(F.try_divide(dot_product(a, b), denom), F.lit(0.0)))
