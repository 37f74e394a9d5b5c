"""Byte-pair-encoding tokenizer training + encoding (Sennrich et al.
2016) — the tokenizer-training stage of a pretraining data pipeline.

The reference counts tokens with a fixed external tokenizer
(``Chunking_Strats/kamredt_chunking.py:48-50``); a 100 TB pipeline also
*trains* tokenizers on its own corpus. The scale split mirrors every
production trainer (HuggingFace tokenizers, SentencePiece):

* **Word counting is the distributed part** — one map-side-combined hash
  agg over the exploded token stream; at 100 TB this is the only stage
  that touches the corpus, and Zipfian word keys combine locally before
  the shuffle.
* **The merge loop runs on the (word, freq) vocabulary**, which is
  metadata-scale relative to the corpus (bounded here by ``max_words`` +
  ``min_freq``, the standard trainer knobs). BPE's pair statistics are
  fully determined by word frequencies, so nothing is lost leaving the
  corpus behind. The loop is inherently sequential in the merge count —
  merge k+1's pair counts depend on merge k — so it runs driver-side over
  the collected vocabulary (the same metadata-collect class as the IVF
  centroid resolve; a 10⁵-word capped vocab is a few MB). A distributed
  variant (one agg + one map per merge) would pay 2·num_merges shuffles
  on a metadata-sized table — strictly worse at any scale.
* **Encoding is Arrow-batched Python** — applying an ordered merge list
  is per-word iterative rewriting, the one hot-path job here that
  built-ins genuinely can't express; the merge ranks dict broadcasts to
  executors and each pandas batch encodes vectorized-per-row.

Determinism: pair selection breaks count ties lexicographically, so the
merge sequence is reproducible across runs, partitionings, and engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from building_a_rag_pipeline_with_airflow_spark.functions.text import tokens
from building_a_rag_pipeline_with_airflow_spark.operators import ensure_min_partitions

__all__ = ["word_frequencies", "train_bpe", "bpe_encode", "EOW"]

# end-of-word marker, kept out of the corpus alphabet by construction
EOW = "</w>"


def word_frequencies(
    df: DataFrame, *, text_col: str = "text", min_freq: int = 1
) -> DataFrame:
    """Corpus word-frequency table ``[word, freq]`` (lowercased whitespace
    words) — the one distributed pass BPE training needs."""
    out = (
        ensure_min_partitions(df.where(F.length(F.trim(F.col(text_col))) > 0))
        .select(F.explode(tokens(F.lower(F.col(text_col)))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("bigint").alias("freq"))
    )
    if min_freq > 1:
        out = out.where(F.col("freq") >= min_freq)
    return out


def _pair_counts(vocab: "dict[tuple[str, ...], int]") -> "dict[tuple[str, str], int]":
    counts: dict[tuple[str, str], int] = {}
    for syms, freq in vocab.items():
        for a, b in zip(syms, syms[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + freq
    return counts


def _merge_word(
    syms: "tuple[str, ...]", pair: "tuple[str, str]"
) -> "tuple[str, ...]":
    out: list[str] = []
    i, n = 0, len(syms)
    while i < n:
        if i < n - 1 and syms[i] == pair[0] and syms[i + 1] == pair[1]:
            out.append(pair[0] + pair[1])
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def train_bpe(
    df: DataFrame,
    num_merges: int,
    *,
    text_col: str = "text",
    min_freq: int = 1,
    max_words: int = 1_000_000,
) -> "list[tuple[str, str]]":
    """Train ``num_merges`` BPE merges on the corpus; returns the ordered
    merge list (the tokenizer model, reproducible and engine-portable).

    ``max_words`` caps the vocabulary the driver collects (most frequent
    first, word tie-break) — the standard trainer memory bound; words
    below the cap contribute nothing measurable to pair statistics at any
    realistic Zipf tail. Stops early if no pair occurs twice."""
    rows = (
        word_frequencies(df, text_col=text_col, min_freq=min_freq)
        .orderBy(F.desc("freq"), "word")
        .limit(max_words)
        .collect()
    )
    vocab: dict[tuple[str, ...], int] = {
        tuple(r["word"]) + (EOW,): int(r["freq"]) for r in rows
    }
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        counts = _pair_counts(vocab)
        if not counts:
            break
        # deterministic argmax: count desc, pair lexicographic
        pair = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if counts[pair] < 2:
            break
        merges.append(pair)
        vocab = {
            _merge_word(s, pair): f for s, f in vocab.items()
        }  # keys stay unique: merging a fixed pair is injective on symbol seqs
    return merges


def bpe_encode(
    df: DataFrame,
    merges: "list[tuple[str, str]]",
    *,
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Encode ``text_col`` with a trained merge list → adds ``out_col``
    (``array<string>`` of BPE symbols, ``</w>``-terminated words).

    Arrow-batched ``pandas_udf``: the merge-ranks dict rides the closure
    (broadcast once per executor), each word encodes by repeatedly
    merging its lowest-rank adjacent pair — the standard greedy BPE
    encoder. A per-batch word cache exploits Zipf: each distinct word in
    a batch is encoded once."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    ranks = {pair: i for i, pair in enumerate(merges)}

    def encode_word(word: str, cache: dict) -> "list[str]":
        hit = cache.get(word)
        if hit is not None:
            return hit
        syms = list(word) + [EOW]
        while len(syms) > 1:
            best_rank, best_i = None, -1
            for i, pair in enumerate(zip(syms, syms[1:])):
                r = ranks.get(pair)
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_rank is None:
                break
            syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
        cache[word] = syms
        return syms

    # no type hints on the udf fn: `from __future__ import annotations`
    # stringifies them and pandas_udf's hint inference rejects strings;
    # the explicit returnType is authoritative
    @pandas_udf("array<string>")
    def encode(texts):
        cache: dict = {}
        out = []
        for t in texts:
            if t is None or not t.strip():
                out.append([])
                continue
            toks: list[str] = []
            for w in t.lower().split():
                toks.extend(encode_word(w, cache))
            out.append(toks)
        return pd.Series(out)

    return df.withColumn(out_col, encode(F.col(text_col)))
